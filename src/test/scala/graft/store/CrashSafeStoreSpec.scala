package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-9 store hardening:
  *  - crash-safe atomic swap: a writer killed between ANY two protocol
  *    steps leaves a table that [[TableStore.recover]] (run by every read)
  *    restores to one of the two complete versions — never an unreadable
  *    directory (the round-8 delete-then-rename window);
  *  - partition-pruned CDC apply: untouched partitions' files are never
  *    rewritten, fully-deleted partitions are dropped;
  *  - Hive path escaping: partition values containing ':'/'='/'%' etc.
  *    resolve to the writer's escaped directory names;
  *  - schema evolution on the partitioned upsert path.
  */
class CrashSafeStoreSpec extends SparkSuite {
  import spark.implicits._

  private def v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "status", "price")
  private def v2 = Seq((1L, "a2", 11.0), (3L, "c", 30.0)).toDF("id", "status", "price")

  private def snap(path: String): Set[(Long, String, Double)] =
    TableStore.read(spark, path).as[(Long, String, Double)].collect().toSet

  private val v1Snap = Set((1L, "a", 10.0), (2L, "b", 20.0))
  private val v2Snap = Set((1L, "a2", 11.0), (3L, "c", 30.0))

  private case class SimulatedCrash(step: String) extends RuntimeException(step)

  private def crashAt(step: String)(body: => Unit): Unit = {
    TableStore.crashHook = s => if (s == step) throw SimulatedCrash(s)
    try intercept[SimulatedCrash](body)
    finally TableStore.crashHook = _ => ()
  }

  for (step <- Seq("staged", "backedUp", "committed")) {
    test(s"atomicWrite crash after '$step': table stays readable at one version") {
      val dir = java.nio.file.Files.createTempDirectory(s"crash_$step").toString
      val path = s"$dir/t"
      TableStore.atomicWrite(spark, v1, path)
      crashAt(step)(TableStore.atomicWrite(spark, v2, path))
      // read() self-heals via recover(); result must be exactly v1 or v2
      val got = snap(path)
      assert(got == v1Snap || got == v2Snap, s"after crash at $step: $got")
      // expected version: before the commit rename → old table; after → new
      if (step == "staged") assert(got == v1Snap)
      if (step == "committed") assert(got == v2Snap)
      // recovery leaves no stale backup, and the next write works normally
      assert(!new java.io.File(path + "__old").exists)
      TableStore.atomicWrite(spark, v2, path)
      assert(snap(path) == v2Snap)
    }
  }

  test("crash between backup and commit rolls FORWARD (staged tmp is complete)") {
    val dir = java.nio.file.Files.createTempDirectory("crash_fwd").toString
    val path = s"$dir/t"
    TableStore.atomicWrite(spark, v1, path)
    crashAt("backedUp")(TableStore.atomicWrite(spark, v2, path))
    assert(snap(path) == v2Snap, "tmp was fully written before the backup rename")
  }

  test("atomicWritePartitioned honors the same crash protocol") {
    val dir = java.nio.file.Files.createTempDirectory("crash_part").toString
    val path = s"$dir/t"
    val p1 = Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "s", "part")
    val p2 = Seq((3L, "z", "p1")).toDF("id", "s", "part")
    TableStore.atomicWritePartitioned(spark, p1, path, "part")
    crashAt("backedUp")(TableStore.atomicWritePartitioned(spark, p2, path, "part"))
    val ids = TableStore.read(spark, path).select("id").as[Long].collect().toSet
    assert(ids == Set(3L), "roll-forward commits the staged partitioned write")
    assert(!new java.io.File(path + "__old").exists)
  }

  test("exists() self-heals a table parked at __old") {
    val dir = java.nio.file.Files.createTempDirectory("crash_exists").toString
    val path = s"$dir/t"
    TableStore.atomicWrite(spark, v1, path)
    // simulate a crash window by hand: live copy parked at __old, no target
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__old")))
    assert(TableStore.exists(spark, path), "logically the table exists")
    assert(snap(path) == v1Snap)
  }

  private def partTable(path: String): Unit =
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p3"))
      .toDF("id", "status", "part")
      .write.partitionBy("part").parquet(path)

  private def partSnap(path: String): Set[(Long, String, String)] =
    TableStore.read(spark, path)
      .select($"id", $"status", $"part".cast("string"))
      .as[(Long, String, String)].collect().toSet

  for (step <- Seq("partStaged", "partDropped", "partCommitted")) {
    test(s"partition swap crash after '$step': recovery rolls the swap forward") {
      val dir = java.nio.file.Files.createTempDirectory(s"pcrash_$step").toString
      val path = s"$dir/t"
      partTable(path)
      // delete id 1 (p1 partial rewrite) and id 3 (p2 fully dropped)
      val victims = Seq(1L, 3L).toDF("id")
      crashAt(step) {
        TableStore.deleteRowsPartitioned(spark, path, victims, Seq("id"), "part")
      }
      // the stage carries the marker → read() must self-heal to the
      // POST-delete state (roll forward), with no stage dir left behind
      val got = partSnap(path)
      assert(got == Set((2L, "b", "p1"), (4L, "d", "p3")), s"after $step: $got")
      assert(!new java.io.File(path + "__dtmp").exists, "stage cleaned up")
      assert(!new java.io.File(s"$path/part=p2").exists, "drop plan replayed")
    }
  }

  test("a stage WITHOUT the staged marker is left alone, table untouched") {
    val dir = java.nio.file.Files.createTempDirectory("pcrash_nostage").toString
    val path = s"$dir/t"
    partTable(path)
    val before = partSnap(path)
    // simulate a writer mid-stage (dead OR still alive in another process):
    // a half-written tmp dir with no marker. Recovery must neither roll it
    // forward nor DELETE it — deleting would abort a live writer's job; a
    // dead one's next attempt clobbers it with mode("overwrite").
    val tmp = new java.io.File(path + "__ptmp/part=p1")
    tmp.mkdirs()
    java.nio.file.Files.writeString(tmp.toPath.resolve("partial.parquet"), "garbage")
    assert(partSnap(path) == before, "read ignores the unmarked stage")
    assert(new java.io.File(path + "__ptmp").exists,
      "a possibly-live writer's stage must not be deleted by a reader")
    // and a subsequent real write through the same suffix clobbers it
    val batch = Seq((9L, "i", "p1")).toDF("id", "status", "part")
    TableStore.upsertPartitioned(spark, path, batch, Seq("id"), "part")
    assert(!new java.io.File(path + "__ptmp").exists)
    assert(partSnap(path) == before + ((9L, "i", "p1")))
  }

  test("vacuumStages deletes only OLD unmarked stages; marked ones stay for recovery") {
    val dir = java.nio.file.Files.createTempDirectory("vac_stage").toString
    val path = s"$dir/t"
    partTable(path)
    // an old unmarked stage (dead writer) and a marked one (crash mid-swap)
    val dead = new java.io.File(path + "__ptmp"); dead.mkdirs()
    val marked = new java.io.File(path + "__dtmp"); marked.mkdirs()
    java.nio.file.Files.createFile(marked.toPath.resolve("_GRAFT_STAGED"))
    dead.setLastModified(System.currentTimeMillis() - 3600_000L)
    marked.setLastModified(System.currentTimeMillis() - 3600_000L)
    // fresh unmarked stage (possibly a live writer) must survive any TTL
    val fresh = new java.io.File(path + "__ctmp"); fresh.mkdirs()
    val deleted = TableStore.vacuumStages(spark, path, olderThanMs = 1800_000L)
    assert(deleted == Seq(path + "__ptmp"), s"deleted: $deleted")
    assert(!dead.exists && marked.exists && fresh.exists)
  }

  test("all-deletes first batch does not create a schema-less partitioned table") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_first_dels").toString
    val path = s"$dir/t"
    val dels = Seq(("D", 1L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("op", "id", "status", "part")
    TableStore.applyCdcPartitioned(spark, path, dels, Seq("id"), "part")
    assert(!new java.io.File(path).exists,
      "a zero-row dynamic-partition write would leave an unreadable dir")
    // the sink keeps working: the NEXT batch with real rows bootstraps
    val ins = Seq(("I", 1L, "a", "p1")).toDF("op", "id", "status", "part")
    TableStore.applyCdcPartitioned(spark, path, ins, Seq("id"), "part")
    assert(partSnap(path) == Set((1L, "a", "p1")))
  }

  test("applyCdcPartitioned rejects a feed missing table columns (no silent projection)") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_schema").toString
    val path = s"$dir/t"
    partTable(path)
    // feed lacks `status`: the flat path fails on this too — the
    // partitioned path must not silently drop the column in touched
    // partitions (mixed per-partition schemas, data loss)
    val feed = Seq(("U", 1L, "p1")).toDF("op", "id", "part")
    val e = intercept[IllegalArgumentException] {
      TableStore.applyCdcPartitioned(spark, path, feed, Seq("id"), "part")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("upsertPartitioned crash mid-swap also recovers forward") {
    val dir = java.nio.file.Files.createTempDirectory("pcrash_upsert").toString
    val path = s"$dir/t"
    partTable(path)
    val batch = Seq((1L, "a2", "p1"), (9L, "i", "p9")).toDF("id", "status", "part")
    crashAt("partDropped") {
      TableStore.upsertPartitioned(spark, path, batch, Seq("id"), "part")
    }
    val got = partSnap(path)
    assert(got == Set((1L, "a2", "p1"), (2L, "b", "p1"), (3L, "c", "p2"),
      (4L, "d", "p3"), (9L, "i", "p9")), s"got $got")
    assert(!new java.io.File(path + "__ptmp").exists)
  }

  test("applyCdcPartitioned rewrites only touched partitions; drops emptied ones") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_part").toString
    val path = s"$dir/t"
    val rows = Seq(
      (1L, "a", "p1"), (2L, "b", "p1"),
      (3L, "c", "p2"),                    // untouched
      (4L, "d", "p3"), (5L, "e", "p3")    // fully deleted
    ).toDF("id", "status", "part")
    rows.write.partitionBy("part").parquet(path)
    val untouched = new java.io.File(s"$path/part=p2")
    val mtimeBefore = untouched.listFiles().map(_.lastModified()).max
    val namesBefore = untouched.listFiles().map(_.getName).toSet
    val feed = Seq(
      ("D", 4L, null.asInstanceOf[String], null.asInstanceOf[String]),
      ("D", 5L, null.asInstanceOf[String], null.asInstanceOf[String]),
      ("U", 1L, "a2", "p1"),               // update in place
      ("I", 6L, "f", "p4")                 // insert into a NEW partition
    ).toDF("op", "id", "status", "part")
    TableStore.applyCdcPartitioned(spark, path, feed, Seq("id"), "part")
    val got = TableStore.read(spark, path)
      .select($"id", $"status", $"part".cast("string")).as[(Long, String, String)]
      .collect().toSet
    assert(got == Set((1L, "a2", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (6L, "f", "p4")))
    assert(!new java.io.File(s"$path/part=p3").exists, "fully-deleted partition dropped")
    assert(untouched.listFiles().map(_.lastModified()).max == mtimeBefore &&
      untouched.listFiles().map(_.getName).toSet == namesBefore,
      "untouched partition must keep its exact files")
    assert(!new java.io.File(path + "__ctmp").exists)
  }

  test("applyCdcPartitioned: missing table = pure insert; duplicate key rejected") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_part_first").toString
    val path = s"$dir/t"
    val first = Seq(("I", 1L, "a", "p1"), ("D", 9L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("op", "id", "status", "part")
    TableStore.applyCdcPartitioned(spark, path, first, Seq("id"), "part")
    assert(TableStore.read(spark, path).count() == 1)
    val dup = Seq(("D", 1L, null.asInstanceOf[String], null.asInstanceOf[String]),
      ("U", 1L, "x", "p1")).toDF("op", "id", "status", "part")
    intercept[IllegalArgumentException] {
      TableStore.applyCdcPartitioned(spark, path, dup, Seq("id"), "part")
    }
  }

  test("applyCdc: missing table = pure insert; duplicate key rejected") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_first").toString
    val path = s"$dir/t"
    val first = Seq(("I", 1L, "a", 1.0), ("D", 9L, null.asInstanceOf[String], 0.0))
      .toDF("op", "id", "status", "price")
    TableStore.applyCdc(spark, path, first, Seq("id"))
    assert(snap(path) == Set((1L, "a", 1.0)))
    val dup = Seq(("D", 1L, null.asInstanceOf[String], 0.0), ("U", 1L, "x", 2.0))
      .toDF("op", "id", "status", "price")
    intercept[IllegalArgumentException](TableStore.applyCdc(spark, path, dup, Seq("id")))
  }

  test("partition values needing Hive escaping (':','=','%') are cleaned up correctly") {
    val dir = java.nio.file.Files.createTempDirectory("hive_esc").toString
    val path = s"$dir/t"
    // values Spark %-escapes in directory names
    val rows = Seq((1L, "a:b"), (2L, "c=d"), (3L, "e%f"), (4L, "plain"))
      .toDF("id", "part")
    rows.write.partitionBy("part").parquet(path)
    // every row in the escaped partitions is a victim → those dirs must be
    // DROPPED; raw toString rendering would miss them and leave the rows
    val victims = Seq(1L, 2L, 3L).toDF("id")
    assert(TableStore.deleteRowsPartitioned(spark, path, victims, Seq("id"), "part") == 3L)
    val left = TableStore.read(spark, path)
      .select($"id", $"part".cast("string")).as[(Long, String)].collect().toSet
    assert(left == Set((4L, "plain")), "escaped-dir partitions fully deleted")
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("part=plain"), s"stale escaped dirs survive: $dirs")
  }

  test("upsertPartitionedEvolve ≡ flat evolve-upsert (same rows), touched-only rewrite") {
    val dirP = java.nio.file.Files.createTempDirectory("evolve_p").toString + "/t"
    val dirF = java.nio.file.Files.createTempDirectory("evolve_f").toString + "/t"
    val baseRows = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      .toDF("id", "status", "grp")
    baseRows.write.partitionBy("grp").parquet(dirP)
    TableStore.atomicWrite(spark, baseRows, dirF)
    val untouched = new java.io.File(s"$dirP/grp=s2")
    val namesBefore = untouched.listFiles().map(_.getName).toSet
    // batch DRIFTED: new column `score`, dropped column `status`
    val batch = Seq((1L, "s1", 9.5), (4L, "s1", 1.5)).toDF("id", "grp", "score")
    TableStore.upsertPartitionedEvolve(spark, dirP, batch, Seq("id"), "grp")
    // flat reference: same evolve merge over the whole table
    TableStore.atomicWrite(spark,
      TableStore.mergePlanEvolve(TableStore.read(spark, dirF), batch, Seq("id")), dirF)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"status", $"grp".cast("string"), $"score")
      .as[(Long, Option[String], String, Option[Double])].collect().toSet
    val gotP = norm(TableStore.readEvolved(spark, dirP))
    val gotF = norm(TableStore.read(spark, dirF))
    assert(gotP == gotF, s"partitioned evolve drifted from flat evolve:\n$gotP\n$gotF")
    assert(gotP == Set(
      (1L, Some("a"), "s1", Some(9.5)),   // conflict: keeps status, gains score
      (2L, Some("b"), "s1", None),        // untouched row in touched partition
      (3L, Some("c"), "s2", None),        // untouched partition, null-padded on read
      (4L, None, "s1", Some(1.5))))       // insert: no status in batch → null
    assert(untouched.listFiles().map(_.getName).toSet == namesBefore,
      "untouched partition keeps old files (and old schema)")
  }

  test("property: evolve-upsert sequences agree partitioned vs flat") {
    import org.scalacheck.Gen
    val batchGen: Gen[List[(Long, String, Double)]] =
      Gen.listOfN(8, for {
        id <- Gen.choose(1L, 12L)
        g  <- Gen.oneOf("g1", "g2", "g3")
        v  <- Gen.choose(0, 99).map(_ / 10.0)
      } yield (id, g, v))
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
    (0 until 3).foreach { i =>
      val dirP = java.nio.file.Files.createTempDirectory(s"evp$i").toString + "/t"
      val dirF = java.nio.file.Files.createTempDirectory(s"evf$i").toString + "/t"
      val baseRows = Seq((1L, "a", "g1"), (5L, "b", "g2"), (9L, "c", "g3"))
        .toDF("id", "status", "grp")
      baseRows.write.partitionBy("grp").parquet(dirP)
      TableStore.atomicWrite(spark, baseRows, dirF)
      // two drifted batches in sequence; partition col immutable by Gen
      // construction is NOT guaranteed, so dedupe to one row per id and
      // drop ids whose partition would move (the documented constraint)
      val b1raw = sample(batchGen, 100L + i)
      val b2raw = sample(batchGen, 200L + i)
      val baseGrp = Map(1L -> "g1", 5L -> "g2", 9L -> "g3")
      var grpOf = baseGrp
      def prep(raw: List[(Long, String, Double)]) = {
        val rows = raw.groupBy(_._1).values.map(_.last)
          .filter { case (id, g, _) => grpOf.get(id).forall(_ == g) }.toList
        grpOf = grpOf ++ rows.map(r => r._1 -> r._2)
        rows.toDF("id", "grp", "score")
      }
      val (b1, b2) = (prep(b1raw), prep(b2raw))
      TableStore.upsertPartitionedEvolve(spark, dirP, b1, Seq("id"), "grp")
      TableStore.upsertPartitionedEvolve(spark, dirP, b2, Seq("id"), "grp")
      TableStore.atomicWrite(spark,
        TableStore.mergePlanEvolve(TableStore.read(spark, dirF), b1, Seq("id")), dirF)
      TableStore.atomicWrite(spark,
        TableStore.mergePlanEvolve(TableStore.read(spark, dirF), b2, Seq("id")), dirF)
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select($"id", $"status", $"grp".cast("string"), $"score")
        .as[(Long, Option[String], String, Option[Double])].collect().toSet
      assert(norm(TableStore.readEvolved(spark, dirP)) == norm(TableStore.read(spark, dirF)),
        s"iteration $i")
    }
  }

  for (step <- Seq("staged", "backedUp", "committed")) {
    test(s"table-emptying partitioned merge crash at '$step': readable at every instant") {
      // the all-rows-deleted case routes through the FLAT atomic swap (an
      // empty schema-bearing table) precisely so a crash anywhere leaves a
      // complete version — the old drop-then-write-empty sequence had a
      // window with NO readable table (round-13 review finding)
      val dir = java.nio.file.Files.createTempDirectory(s"crash_empty_$step").toString
      val path = s"$dir/t"
      val part = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "g", "p")
      TableStore.atomicWritePartitioned(spark, part, path, "g")
      crashAt(step)(TableStore.mergeDeletePartitioned(spark, path,
        Seq(1L, 2L).toDF("id"), Seq("id"), "g", insertNotMatched = false))
      // read() self-heals; the table is EITHER the full pre-statement
      // version or the committed empty one — never unreadable
      val t = TableStore.read(spark, path)
      val n = t.count()
      assert(n == 2L || n == 0L, s"after crash at $step: $n rows")
      assert(t.columns.toSet == Set("id", "g", "p"), "schema survives every outcome")
      if (step == "staged") assert(n == 2L, "pre-commit crash leaves the statement unapplied")
      if (step == "committed") assert(n == 0L)
      // the retried statement converges to the empty table
      TableStore.mergeDeletePartitioned(spark, path,
        Seq(1L, 2L).toDF("id"), Seq("id"), "g", insertNotMatched = false)
      assert(TableStore.read(spark, path).count() == 0L)
    }
  }
}
