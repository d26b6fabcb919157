package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TableStoreSpec extends SparkSuite {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "status", "price")

  private def batch = Seq(
    (2L, "X", 99.0),   // conflict
    (4L, "d", 40.0)    // new
  ).toDF("id", "status", "price")

  test("mergePlan: full update on conflict + insert of new rows") {
    val out = TableStore.mergePlan(base, batch, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val r2 = out(1)
    assert(r2.getString(1) == "X" && r2.getDouble(2) == 99.0)
    assert(out(3).getString(1) == "d")
  }

  test("mergePlan: partial updateColumns keeps insert-only columns stale (§2.12)") {
    val out = TableStore.mergePlan(base, batch, Seq("id"), Some(Seq("price")))
      .orderBy("id").collect()
    val r2 = out(1)
    assert(r2.getString(1) == "b", "status is insert-only → keeps existing")
    assert(r2.getDouble(2) == 99.0, "price is updated")
    assert(out(3).getString(1) == "d", "new rows take all incoming columns")
  }

  test("mergePlan: ON CONFLICT takes incoming value even when null (not coalesce)") {
    val b = Seq((2L, null.asInstanceOf[String], 99.0)).toDF("id", "status", "price")
    val out = TableStore.mergePlan(base, b, Seq("id")).orderBy("id").collect()
    assert(out(1).isNullAt(1), "incoming null must overwrite on conflict")
  }

  test("upsert is idempotent and atomic on disk") {
    val dir = java.nio.file.Files.createTempDirectory("tablestore").toString
    val path = s"$dir/orders_tbl"
    TableStore.upsert(spark, path, base, Seq("id"))
    TableStore.upsert(spark, path, batch, Seq("id"))
    val once = TableStore.read(spark, path).orderBy("id").collect().toSeq
    TableStore.upsert(spark, path, batch, Seq("id"))
    val twice = TableStore.read(spark, path).orderBy("id").collect().toSeq
    assert(once == twice, "upsert(upsert(T,b),b) == upsert(T,b)")
    assert(once.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    assert(!new java.io.File(path + "__tmp").exists, "tmp staging dir cleaned up")
  }

  test("dedupeByKey keeps last-wins deterministically") {
    val dup = Seq((1L, "old", 1.0, 1L), (1L, "new", 2.0, 2L))
      .toDF("id", "status", "price", "seq")
    val out = TableStore.dedupeByKey(dup, Seq("id"), "seq").collect()
    assert(out.length == 1 && out(0).getString(1) == "new")
  }

  test("mergePlan rejects schema mismatch") {
    val bad = Seq((1L, "x")).toDF("id", "status")
    intercept[IllegalArgumentException] {
      TableStore.mergePlan(base, bad, Seq("id"))
    }
  }

  // ---- §2.12 properties under concurrent-batch order (raw ScalaCheck,
  // fixed seeds — same idiom as PropertySpec)

  private def rowGen(idMin: Long, idMax: Long): org.scalacheck.Gen[(Long, String, Double)] =
    for {
      id <- org.scalacheck.Gen.chooseNum(idMin, idMax)
      st <- org.scalacheck.Gen.oneOf("a", "b", "c", null)
      pr <- org.scalacheck.Gen.oneOf(1.0, 2.5, 99.0, -3.0)
    } yield (id, st, pr)

  private def batchGen(idMin: Long, idMax: Long): org.scalacheck.Gen[List[(Long, String, Double)]] =
    org.scalacheck.Gen.listOfN(6, rowGen(idMin, idMax))

  private def sample[A](g: org.scalacheck.Gen[A], seed: Long): A =
    g.apply(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(seed)).get

  private def snapshot(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[String], Double)] =
    df.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), r.getDouble(2))).toSeq.sortBy(_._1)

  test("property: merge batches with DISJOINT keys commutes") {
    (0 until 6).foreach { i =>
      // key ranges 100.. and 200.. cannot collide with each other
      val b1raw = sample(batchGen(100, 150), 1000L + i)
      val b2raw = sample(batchGen(200, 250), 2000L + i)
      def prep(rows: List[(Long, String, Double)]) =
        TableStore.dedupeByKey(
          rows.zipWithIndex.map { case ((id, s, p), n) => (id, s, p, n.toLong) }
            .toDF("id", "status", "price", "seq"),
          Seq("id"), "seq").drop("seq")
      val (b1, b2) = (prep(b1raw), prep(b2raw))
      val oneTwo = TableStore.mergePlan(TableStore.mergePlan(base, b1, Seq("id")), b2, Seq("id"))
      val twoOne = TableStore.mergePlan(TableStore.mergePlan(base, b2, Seq("id")), b1, Seq("id"))
      assert(snapshot(oneTwo) == snapshot(twoOne), s"iteration $i")
    }
  }

  test("property: dedupeByKey + mergePlan is last-wins on OVERLAPPING keys") {
    (0 until 6).foreach { i =>
      // one combined batch, duplicate ids, unique seq = arrival order
      val raw = sample(batchGen(1, 8), 3000L + i)
      val withSeq = raw.zipWithIndex.map { case ((id, s, p), n) => (id, s, p, n.toLong) }
      val batch = TableStore.dedupeByKey(
        withSeq.toDF("id", "status", "price", "seq"), Seq("id"), "seq").drop("seq")
      val got = snapshot(TableStore.mergePlan(base, batch, Seq("id")))
      // driver-side reference: fold rows in seq order over the base map
      val baseMap = base.collect()
        .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getDouble(2))).toMap
      val expected = withSeq.sortBy(_._4).foldLeft(baseMap) {
        case (m, (id, s, p, _)) => m + (id -> (Option(s), p))
      }.toSeq.map { case (id, (s, p)) => (id, s, p) }.sortBy(_._1)
      assert(got == expected, s"iteration $i")
    }
  }

  test("property: partial updateColumns composes across sequential batches") {
    (0 until 4).foreach { i =>
      val raw = sample(batchGen(1, 6), 4000L + i)
      val withSeq = raw.zipWithIndex.map { case ((id, s, p), n) => (id, s, p, n.toLong) }
      val batch = TableStore.dedupeByKey(
        withSeq.toDF("id", "status", "price", "seq"), Seq("id"), "seq").drop("seq")
      val got = snapshot(TableStore.mergePlan(base, batch, Seq("id"), Some(Seq("price"))))
      val baseMap = base.collect()
        .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getDouble(2))).toMap
      // the CONTRACT dedupes first (key-unique batch = last row per id),
      // so the reference applies only each id's final row, not a row fold
      val lastPerId = withSeq.groupBy(_._1).values.map(_.maxBy(_._4))
      val expected = lastPerId.foldLeft(baseMap) {
        case (m, (id, s, p, _)) =>
          m.get(id) match {
            case Some((st, _)) => m + (id -> (st, p))   // conflict: price only
            case None          => m + (id -> (Option(s), p)) // insert: all cols
          }
      }.toSeq.map { case (id, (s, p)) => (id, s, p) }.sortBy(_._1)
      assert(got == expected, s"iteration $i")
    }
  }

  test("deleteRows: anti-join rewrite, count, idempotence, non-key columns") {
    val dir = java.nio.file.Files.createTempDirectory("tablestore_del").toString
    val path = s"$dir/t"
    TableStore.atomicWrite(spark, base, path)
    // delete on a NON-key column: every row with status in (a, c)
    val victims = Seq("a", "c").toDF("status")
    assert(TableStore.deleteRows(spark, path, victims, Seq("status")) == 2L)
    assert(TableStore.read(spark, path).select("id").as[Long].collect().toSeq == Seq(2L))
    // idempotent: deleting the same victims again removes nothing
    assert(TableStore.deleteRows(spark, path, victims, Seq("status")) == 0L)
    assert(!new java.io.File(path + "__tmp").exists)
  }

  test("property: applyCdc equals a reference map fold over random op sequences") {
    import org.scalacheck.Gen
    val opGen: Gen[List[(String, Long, String, Double)]] =
      Gen.listOfN(40, for {
        op <- Gen.oneOf("U", "D")
        id <- Gen.choose(1L, 12L)
        s  <- Gen.alphaStr.map(_.take(3))
        p  <- Gen.choose(0, 9999).map(_ / 100.0)
      } yield (op, id, s, p))
    (0 until 6).foreach { i =>
      // dedupe to one op per key per batch (the documented contract),
      // last-in-list wins — mirrored exactly in the reference fold
      val raw = sample(opGen, 7000L + i)
      val perKey = raw.zipWithIndex.groupBy(_._1._2).values
        .map(_.maxBy(_._2)._1).toList.sortBy(_._2)
      val dir = java.nio.file.Files.createTempDirectory(s"ts_cdc_prop$i").toString
      val path = s"$dir/t"
      TableStore.atomicWrite(spark, base, path)
      TableStore.applyCdc(spark, path,
        perKey.toDF("op", "id", "status", "price"), Seq("id"))
      val got = snapshot(TableStore.read(spark, path))
      // reference: plain Map fold of the same deduped batch over base
      val ref0 = Map(1L -> ("a", 10.0), 2L -> ("b", 20.0), 3L -> ("c", 30.0))
      val ref = perKey.foldLeft(ref0) {
        case (m, ("D", id, _, _)) => m - id
        case (m, (_, id, s, p))   => m.updated(id, (s, p))
      }
      val refSnap = ref.toSeq.map { case (id, (s, p)) => (id, Option(s), p) }.sortBy(_._1)
      assert(got == refSnap, s"iteration $i")
    }
  }

  test("property: deleteRows(victims) then deleteRows(rest) empties any table") {
    import org.scalacheck.Gen
    (0 until 4).foreach { i =>
      val rows = sample(batchGen(1, 30), 9000L + i)
      val deduped = TableStore.dedupeByKey(
        rows.zipWithIndex.map { case ((id, s, p), n) => (id, s, p, n.toLong) }
          .toDF("id", "status", "price", "seq"), Seq("id"), "seq").drop("seq")
      val n = deduped.count()
      val dir = java.nio.file.Files.createTempDirectory(s"ts_del_prop$i").toString
      val path = s"$dir/t"
      TableStore.atomicWrite(spark, deduped, path)
      val some = deduped.filter($"id" % 2 === 0).select("id")
      val d1 = TableStore.deleteRows(spark, path, some, Seq("id"))
      val d2 = TableStore.deleteRows(spark, path,
        deduped.select("id"), Seq("id")) // the rest (already-deleted keys no-op)
      assert(d1 + d2 == n, s"iteration $i: $d1 + $d2 != $n")
      assert(TableStore.read(spark, path).count() == 0)
    }
  }

  test("applyCdc: one batch of inserts/updates/deletes, one swap, idempotent-safe contract") {
    val dir = java.nio.file.Files.createTempDirectory("tablestore_cdc").toString
    val path = s"$dir/t"
    TableStore.atomicWrite(spark, base, path)
    val feed = Seq(
      ("D", 1L, null.asInstanceOf[String], 0.0),   // delete existing
      ("U", 2L, "upd", 99.0),                      // update existing
      ("I", 4L, "new", 40.0),                      // insert fresh
      ("D", 9L, null.asInstanceOf[String], 0.0)    // delete of absent key: no-op
    ).toDF("op", "id", "status", "price")
    TableStore.applyCdc(spark, path, feed, Seq("id"))
    val got = TableStore.read(spark, path).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "upd", 99.0), (3L, "c", 30.0), (4L, "new", 40.0)))
    assert(!new java.io.File(path + "__tmp").exists)
  }

  test("deleteRowsPartitioned rewrites only victim-bearing partitions") {
    val dir = java.nio.file.Files.createTempDirectory("tablestore_delp").toString
    val path = s"$dir/t"
    val rows = Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0),
      (3L, "p2", 30.0),
      (4L, "p3", 40.0), (5L, "p3", 50.0)
    ).toDF("id", "part", "price")
    rows.write.partitionBy("part").parquet(path)
    val untouched = new java.io.File(s"$path/part=p2")
    val mtimeBefore = untouched.listFiles().map(_.lastModified()).max
    // victims live in p1 (one of two rows) and p3 (ALL rows)
    val victims = Seq(1L, 4L, 5L).toDF("id")
    assert(TableStore.deleteRowsPartitioned(spark, path, victims, Seq("id"), "part") == 3L)
    val left = TableStore.read(spark, path)
      .select($"id", $"part".cast("string")).as[(Long, String)].collect().toSeq.sorted
    assert(left == Seq((2L, "p1"), (3L, "p2")))
    // the fully-deleted partition directory is gone
    assert(!new java.io.File(s"$path/part=p3").exists)
    // the untouched partition's files were never rewritten
    assert(untouched.listFiles().map(_.lastModified()).max == mtimeBefore,
      "untouched partition must not be rewritten")
    assert(!new java.io.File(path + "__dtmp").exists)
  }

  /** Jobs started while `body` runs — listener delivery is async, so a
    * description-tagged sentinel job runs after and we wait for ITS event:
    * the bus is FIFO per listener, so everything before it was delivered.
    */
  private def jobsDuring(body: => Unit): Int = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val n = new java.util.concurrent.atomic.AtomicInteger
    @volatile var sentinelSeen = false
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description")).orNull
        if (desc == "graft-job-count-sentinel") sentinelSeen = true
        else n.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      spark.sparkContext.setJobDescription("graft-job-count-sentinel")
      try spark.range(1).count() finally spark.sparkContext.setJobDescription(null)
      val deadline = System.currentTimeMillis() + 20000
      while (!sentinelSeen && System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(sentinelSeen, "listener bus did not drain")
      n.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("rowCountFromFooters: exact on flat and partitioned layouts, ZERO Spark jobs") {
    val dir = java.nio.file.Files.createTempDirectory("footers").toString
    val flat = dir + "/flat"
    TableStore.atomicWrite(spark, base.repartition(3), flat)
    assert(TableStore.rowCountFromFooters(spark, flat) ==
      TableStore.read(spark, flat).count())
    val part = dir + "/part"
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "g1", 1.0), (2L, "g2", 2.0), (3L, "g1", 3.0)).toDF("id", "g", "p"),
      part, "g")
    assert(TableStore.rowCountFromFooters(spark, part) == 3L)
    assert(jobsDuring { TableStore.rowCountFromFooters(spark, flat) } == 0,
      "footer counting must not launch a Spark job")
    // the DML return paths ride it: deleteRows reports without a re-scan
    val nDel = TableStore.deleteRows(spark, flat, Seq(2L).toDF("id"), Seq("id"))
    assert(nDel == 1L)
    assert(TableStore.rowCountFromFooters(spark, flat) == 2L)
  }

  test("rewriteFilesWhere: victim files rewritten, clean files hard-linked, full fallback") {
    val dir = java.nio.file.Files.createTempDirectory("filepruned").toString + "/t"
    // cluster g per file so the predicate's victims live in few files
    val df = spark.range(0, 400).toDF("id")
      .withColumn("g", (col("id") % 4).cast("int"))
      .repartitionByRange(4, col("g"))
    TableStore.atomicWrite(spark, df, dir)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length()).toMap
    val beforeMtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    assert(before.size >= 2, "fixture needs multiple part files")
    Thread.sleep(1100) // mtime resolution guard for the hardlink assertion
    val (hits, kept, rewritten) = TableStore.rewriteFilesWhere(spark, dir,
      col("g") === 1, _.filter(col("g") =!= 1))
    // range-clustered fixture: the victim file held ONLY g=1 rows, so its
    // rewrite has zero survivors and yields no staged file at all
    assert(hits == 100L && kept >= 1 && rewritten >= 0)
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length()).toMap
    val keptNames = after.keySet.filterNot(_.startsWith("rw-"))
    assert(keptNames.subsetOf(before.keySet) && keptNames.size == kept,
      "clean files keep their basenames")
    keptNames.foreach(nm => assert(after(nm) == before(nm), s"$nm byte length drifted"))
    // kept files are HARD LINKS on a local fs (O(1) metadata, no byte
    // copy): a link shares the source inode, so the mtime is preserved;
    // a fallback byte copy would stamp a fresh one
    val afterMtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    keptNames.foreach(nm => assert(afterMtimes(nm) == beforeMtimes(nm),
      s"$nm was byte-copied, not linked"))
    assert(TableStore.read(spark, dir).filter(col("g") === 1).count() == 0)
    assert(TableStore.read(spark, dir).count() == 300)
    // no victim at all: zero-cost no-op
    val (h0, k0, r0) = TableStore.rewriteFilesWhere(spark, dir,
      col("g") === 99, _.filter(lit(false)))
    assert(h0 == 0L && r0 == 0 && k0 == after.size)
    // every file a victim: falls back to the plain full rewrite
    val (hAll, kAll, _) = TableStore.rewriteFilesWhere(spark, dir,
      col("g") >= 0, d => d.filter(col("g") =!= 0))
    assert(hAll == 300L && kAll == 0)
    assert(TableStore.read(spark, dir).count() == 200)
  }

  test("emptying partitioned engines leave a readable schema-bearing table") {
    import org.apache.spark.sql.functions.col
    // mergeDeletePartitioned deleting EVERY row of EVERY partition
    val d1 = java.nio.file.Files.createTempDirectory("emptymd").toString + "/t"
    val part = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "g", "p")
    TableStore.atomicWritePartitioned(spark, part, d1, "g")
    val (nDel, nIns) = TableStore.mergeDeletePartitioned(spark, d1,
      Seq(1L, 2L).toDF("id"), Seq("id"), "g", insertNotMatched = false)
    assert(nDel == 2L && nIns == 0L)
    val t1 = TableStore.read(spark, d1)
    assert(t1.count() == 0 && t1.columns.toSet == Set("id", "g", "p"),
      "an emptied table must stay readable with its schema")
    // conditional clause engine deleting everything
    val d2 = java.nio.file.Files.createTempDirectory("emptymc").toString + "/t"
    TableStore.atomicWritePartitioned(spark, part, d2, "g")
    TableStore.mergeClauses(spark, d2, part, Seq("id"),
      Seq(MergeWhenMatched(None, MergeMatchedAction.Delete)), None, Some("g"))
    val t2 = TableStore.read(spark, d2)
    assert(t2.count() == 0 && t2.columns.toSet == Set("id", "g", "p"))
    // an all-deletes CDC feed: emptied, ledger marker PRESERVED
    val d3 = java.nio.file.Files.createTempDirectory("emptycdc").toString + "/t"
    TableStore.atomicWritePartitioned(spark, part, d3, "g")
    val feed = Seq(("D", 1L, "a", 0.0), ("D", 2L, "b", 0.0))
      .toDF("op", "id", "g", "p")
    assert(TableStore.applyCdcPartitionedExactlyOnce(spark, d3, feed,
      Seq("id"), "g", batchId = 9))
    val t3 = TableStore.read(spark, d3)
    assert(t3.count() == 0 && t3.columns.toSet == Set("id", "g", "p"))
    assert(TableStore.lastAppliedBatch(spark, d3) == 9L,
      "replay protection must survive the empty fallback")
    assert(!TableStore.applyCdcPartitionedExactlyOnce(spark, d3, feed,
      Seq("id"), "g", batchId = 9), "the replayed batch must be skipped")
    // deleteRowsPartitioned emptying everything
    val d4 = java.nio.file.Files.createTempDirectory("emptydrp").toString + "/t"
    TableStore.atomicWritePartitioned(spark, part, d4, "g")
    assert(TableStore.deleteRowsPartitioned(spark, d4,
      Seq(1L, 2L).toDF("id"), Seq("id"), "g") == 2L)
    assert(TableStore.read(spark, d4).count() == 0)
  }

  test("rewrite engines refuse merge-on-read tables (masks reference row positions)") {
    val dir = java.nio.file.Files.createTempDirectory("rwguard").toString + "/t"
    TableStore.atomicWrite(spark, base, dir)
    graft.operators.DeletionVectors.dvDelete(spark, dir,
      Seq(2L).toDF("id"), "id")
    val e1 = intercept[IllegalArgumentException](
      TableStore.rewriteFilesWhere(spark, dir, col("id") === 1, _.filter(lit(false))))
    assert(e1.getMessage.contains("deletion-vector"))
    val e2 = intercept[IllegalArgumentException](
      TableStore.rewritePartitionsWhere(spark, dir, "status",
        col("id") === 1, _.filter(lit(false))))
    assert(e2.getMessage.contains("deletion-vector"))
    intercept[IllegalArgumentException](
      TableStore.insertIntoPartitioned(spark, dir, base, "status"))
    intercept[IllegalArgumentException](
      TableStore.mergeClauses(spark, dir, base, Seq("id"),
        Seq(MergeWhenMatched(None, MergeMatchedAction.Update(None))), None))
    // the masked row stayed masked, nothing was rewritten
    assert(graft.operators.DeletionVectors.dvRead(spark, dir).count() == 2)
  }

  test("vacuumInnerStaging sweeps only OLD hidden staging dirs") {
    val dir = java.nio.file.Files.createTempDirectory("innervac").toString + "/t"
    TableStore.atomicWrite(spark, base, dir)
    val nBefore = TableStore.read(spark, dir).count()
    val old1 = new java.io.File(dir, "__insert_dead")
    val old2 = new java.io.File(dir, "__append_dead")
    val old3 = new java.io.File(dir, "__compact_dead")
    val fresh = new java.io.File(dir, "__insert_live")
    Seq(old1, old2, old3, fresh).foreach(_.mkdirs())
    Seq(old1, old2, old3).foreach(_.setLastModified(
      System.currentTimeMillis() - 7200000))
    val swept = TableStore.vacuumInnerStaging(spark, dir, olderThanMs = 3600000)
    assert(swept.size == 3 && !old1.exists && !old2.exists && !old3.exists)
    assert(fresh.exists, "a fresh staging dir may belong to a live writer")
    assert(TableStore.read(spark, dir).count() == nBefore, "data untouched")
  }

  test("rewritePartitionsWhere: untouched partitions never rewritten; empty-table fallback keeps schema") {
    val dir = java.nio.file.Files.createTempDirectory("partpruned").toString + "/t"
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 40.0))
        .toDF("id", "g", "p"), dir, "g")
    val untouched = new java.io.File(dir, "g=c")
    val mtime = untouched.listFiles().map(_.lastModified()).max
    Thread.sleep(1100)
    val nHit = TableStore.rewritePartitionsWhere(spark, dir, "g",
      col("p") <= 20.0, _.filter(col("p") > 20.0))
    assert(nHit == 2L)
    assert(untouched.listFiles().map(_.lastModified()).max == mtime,
      "untouched partition files must not be rewritten")
    // g=a fully emptied → partition dir dropped; g=b and g=c intact
    assert(!new java.io.File(dir, "g=a").exists())
    assert(TableStore.read(spark, dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    // all rows deleted → fileless-partition case falls back to an empty
    // FLAT table that still carries the schema
    TableStore.rewritePartitionsWhere(spark, dir, "g", lit(true), _.filter(lit(false)))
    val t = TableStore.read(spark, dir)
    assert(t.count() == 0 && t.columns.toSet == Set("id", "g", "p"))
  }
}
