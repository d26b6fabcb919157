package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class DeletionVectorsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_dv_spec")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  private def freshTable(name: String): String = {
    val p = root.resolve(name).toString
    Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .repartition(8, $"o_custkey")
      .write.mode("overwrite").parquet(p)
    p
  }

  private def dataFileMtimes(path: String): Map[String, Long] = {
    val d = new java.io.File(path)
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("dv delete removes exactly the matching rows without touching any data file") {
    val t = freshTable("del")
    val before = dataFileMtimes(t)
    val keys = Tables.orders(spark, sf).filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey")
    val masked = DeletionVectors.dvDelete(spark, t, keys, "o_orderkey")
    assert(masked == keys.count())
    assert(dataFileMtimes(t) == before, "no data file may be modified")
    val got = DeletionVectors.dvRead(spark, t)
      .select($"o_orderkey").as[Long].collect().toSet
    val want = Tables.orders(spark, sf).filter($"o_orderkey" % 499 =!= 0)
      .select($"o_orderkey").as[Long].collect().toSet
    assert(got == want)
    // repeated delete of the same keys adds nothing
    assert(DeletionVectors.dvDelete(spark, t, keys, "o_orderkey") == 0)
  }

  test("vectors accumulate across deletes") {
    val t = freshTable("accum")
    val k1 = Tables.orders(spark, sf).filter($"o_orderkey" % 499 === 0).select($"o_orderkey")
    val k2 = Tables.orders(spark, sf).filter($"o_orderkey" % 701 === 0).select($"o_orderkey")
    DeletionVectors.dvDelete(spark, t, k1, "o_orderkey")
    DeletionVectors.dvDelete(spark, t, k2, "o_orderkey")
    val got = DeletionVectors.dvRead(spark, t).count()
    val want = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 499 =!= 0 && $"o_orderkey" % 701 =!= 0).count()
    assert(got == want)
  }

  test("merge-on-read upsert: base untouched, delta appended, read stitches") {
    val t = freshTable("mor")
    val before = dataFileMtimes(t)
    val base = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val delta = base.filter($"o_orderkey" % 499 === 0)
      .withColumn("o_totalprice", lit(7.5))
      .unionByName(base.limit(2)
        .select(($"o_orderkey" + lit(10000000L)).as("o_orderkey"),
          $"o_custkey", lit(1.25).as("o_totalprice")))
    DeletionVectors.morUpsert(spark, t, delta, "o_orderkey")
    // every pre-existing file byte-identical; new mor- files appended
    val after = dataFileMtimes(t)
    before.foreach { case (f, m) => assert(after(f) == m, s"$f modified") }
    assert(after.keys.exists(_.startsWith("mor-")), "delta must be appended")
    val got = DeletionVectors.dvRead(spark, t)
      .orderBy($"o_orderkey").collect().toSeq
    val want = base.join(delta.select($"o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(delta).orderBy($"o_orderkey").collect().toSeq
    assert(got == want)
  }

  test("mor upsert refuses a key-duplicated delta") {
    val t = freshTable("mordup")
    val one = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice").limit(1)
    intercept[IllegalArgumentException](
      DeletionVectors.morUpsert(spark, t,
        one.unionByName(one.withColumn("o_totalprice", lit(0.0))), "o_orderkey"))
  }

  test("compact rewrites only dirty files, resets the vector, preserves content") {
    val t = freshTable("cmp")
    val keys = Tables.orders(spark, sf).filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey")
    DeletionVectors.dvDelete(spark, t, keys, "o_orderkey")
    val expect = DeletionVectors.dvRead(spark, t)
      .orderBy($"o_orderkey").collect().toSeq
    val dirtyBasenames = DeletionVectors.readDv(spark, t).map(_._1)
      .distinct.map(p => new org.apache.hadoop.fs.Path(p).getName).toSet
    val mtimesBefore = dataFileMtimes(t)
    val (rewritten, untouched) = DeletionVectors.compact(spark, t)
    assert(rewritten >= 1 && untouched >= 0)
    assert(DeletionVectors.readDv(spark, t).isEmpty, "vector must reset")
    // clean files survive in place with their mtimes
    mtimesBefore.filterNot { case (f, _) => dirtyBasenames.contains(f) }
      .foreach { case (f, m) =>
        assert(dataFileMtimes(t).get(f).contains(m), s"clean file $f disturbed") }
    // dirty originals are gone
    dirtyBasenames.foreach(f => assert(!dataFileMtimes(t).contains(f), s"dirty $f remains"))
    val got = spark.read.parquet(t).orderBy($"o_orderkey").collect().toSeq
    assert(got == expect)
  }

  test("empty vector reads as the plain table") {
    val t = freshTable("plain")
    assert(DeletionVectors.dvRead(spark, t).count() == Tables.orders(spark, sf).count())
  }

  test("morApplyCdc: applies I/U/D once, ledger skips replays, compact keeps the ledger") {
    val t = freshTable("cdc")
    val base = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val batch = base.filter($"o_orderkey" % 499 === 0)
      .select(lit("U").as("op"), $"o_orderkey", $"o_custkey", lit(9.5).as("o_totalprice"))
      .unionByName(base.filter($"o_orderkey" % 701 === 0 && $"o_orderkey" % 499 =!= 0)
        .select(lit("D").as("op"), $"o_orderkey", $"o_custkey", $"o_totalprice"))
      .unionByName(base.limit(1)
        .select(lit("I").as("op"), ($"o_orderkey" + lit(10000000L)).as("o_orderkey"),
          $"o_custkey", lit(1.0).as("o_totalprice")))
    assert(DeletionVectors.morApplyCdc(spark, t, batch, "o_orderkey", batchId = 7L))
    val expect = base
      .filter($"o_orderkey" % 701 =!= 0 || $"o_orderkey" % 499 === 0)
      .withColumn("o_totalprice",
        org.apache.spark.sql.functions.when($"o_orderkey" % 499 === 0, 9.5)
          .otherwise($"o_totalprice"))
      .unionByName(base.limit(1)
        .select(($"o_orderkey" + lit(10000000L)).as("o_orderkey"),
          $"o_custkey", lit(1.0).as("o_totalprice")))
      .orderBy($"o_orderkey").collect().toSeq
    def state() = DeletionVectors.dvRead(spark, t)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey").collect().toSeq
    assert(state() == expect)
    // replay with poisoned content: ledger must skip, state unchanged
    assert(!DeletionVectors.morApplyCdc(spark, t,
      batch.withColumn("o_totalprice", lit(-1.0)), "o_orderkey", batchId = 7L))
    assert(state() == expect)
    // compaction preserves content AND replay protection
    DeletionVectors.compact(spark, t)
    assert(!DeletionVectors.morApplyCdc(spark, t,
      batch.withColumn("o_totalprice", lit(-1.0)), "o_orderkey", batchId = 7L))
    assert(state() == expect)
    // a new batch id still applies
    assert(DeletionVectors.morApplyCdc(spark, t, batch.limit(0), "o_orderkey", batchId = 8L))
  }

  test("morApplyCdc converges after a simulated crash between append and swap") {
    val t = freshTable("crash")
    val base = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val batch = base.filter($"o_orderkey" % 499 === 0)
      .select(lit("U").as("op"), $"o_orderkey", $"o_custkey", lit(3.25).as("o_totalprice"))
    // simulate the crashed first attempt: the append landed (orphan
    // duplicates), the sidecar swap did not (no ledger entry, no mask)
    val orphan = batch.drop("op")
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(t, "__crash_stage")
    orphan.write.mode("overwrite").parquet(tmp.toString)
    f.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
      f.rename(st.getPath, new org.apache.hadoop.fs.Path(t, "mor-crash-" + st.getPath.getName))
    }
    f.delete(tmp, true)
    // the replayed apply masks old + orphan rows and appends one fresh copy
    assert(DeletionVectors.morApplyCdc(spark, t, batch, "o_orderkey", batchId = 0L))
    val got = DeletionVectors.dvRead(spark, t)
      .filter($"o_orderkey" % 499 === 0)
      .groupBy($"o_orderkey").count()
      .filter($"count" =!= 1).count()
    assert(got == 0, "every updated key must appear exactly once after the replay")
  }

  test("fenced-out writer's vector swap and MoR append die loudly") {
    import graft.store.WriterLease
    val t = freshTable("fenced")
    val nBefore = spark.read.parquet(t).count()
    val a = WriterLease.acquire(spark, t, "writerA", ttlMs = 60000)
    // A stalls (lease aged past ttl); B breaks it and holds
    val leaseFile = new org.apache.hadoop.fs.Path(t + "__lease", "LEASE")
    leaseFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(leaseFile, System.currentTimeMillis() - 120000, -1)
    val b = WriterLease.acquire(spark, t, "writerB", ttlMs = 60000)
    // A wakes up: every zero-rewrite mutation must die at the fence
    WriterLease.adopt(a)
    val keys = Tables.orders(spark, sf).filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey")
    intercept[WriterLease.FencedException](
      DeletionVectors.dvDelete(spark, t, keys, "o_orderkey"))
    val delta = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice").limit(2)
      .withColumn("o_totalprice", lit(0.5))
    intercept[WriterLease.FencedException](
      DeletionVectors.morUpsert(spark, t, delta, "o_orderkey"))
    // the loser changed nothing: no vector, no appended files, full count
    WriterLease.adopt(b)
    assert(DeletionVectors.readDv(spark, t).isEmpty)
    assert(!dataFileMtimes(t).keys.exists(_.startsWith("mor-")))
    assert(spark.read.parquet(t).count() == nBefore)
    WriterLease.release(spark, b)
  }

  test("run codec: roundtrip, contiguity compression, disjoint ascending") {
    import DeletionVectors.{encodeRuns, expandRuns}
    assert(encodeRuns(Nil).isEmpty)
    assert(encodeRuns(Seq(5L)) == Seq((5L, 1L)))
    assert(encodeRuns(Seq(1L, 2L, 3L, 7L, 9L, 10L)) == Seq((1L, 3L), (7L, 1L), (9L, 2L)))
    assert(encodeRuns(0L until 10000L) == Seq((0L, 10000L)), "contiguous block = ONE run")
    val rows = (0L until 500L).filter(i => ((i * 2654435761L + 12345L) & 3) != 0)
    assert(expandRuns(encodeRuns(rows)) == rows, "lossless roundtrip")
    // interval-union sweep: overlap, adjacency, containment, disjoint —
    // and equivalence with the expand-then-encode reference
    import DeletionVectors.unionRuns
    assert(unionRuns(Nil, Seq((3L, 2L))) == Seq((3L, 2L)))
    assert(unionRuns(Seq((0L, 5L)), Seq((5L, 5L))) == Seq((0L, 10L)), "adjacent coalesce")
    assert(unionRuns(Seq((0L, 10L)), Seq((2L, 3L))) == Seq((0L, 10L)), "containment")
    assert(unionRuns(Seq((0L, 3L), (10L, 2L)), Seq((2L, 9L))) == Seq((0L, 12L)))
    val xs = rows.take(200); val ys = rows.drop(150)
    assert(unionRuns(encodeRuns(xs), encodeRuns(ys)) ==
      encodeRuns((xs ++ ys).distinct.sorted), "sweep ≡ expand-then-encode")
  }

  test("run codec properties: roundtrip and sweep-union over generated index sets") {
    import DeletionVectors.{encodeRuns, expandRuns, unionRuns}
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // raw ScalaCheck generators with fixed seeds (scalatestplus isn't in
    // the offline dependency set) — mixed densities exercise singleton
    // runs, long blocks, adjacency, and empty sets
    val gen = for {
      n <- Gen.choose(0, 400)
      dense <- Gen.choose(1, 6)
      xs <- Gen.listOfN(n, Gen.choose(0L, (n.toLong + 1) * dense))
    } yield xs.distinct.sorted
    val sets = (0 until 60).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
    assert(sets.size >= 50, "generator must produce samples")
    sets.foreach { xs =>
      val runs = encodeRuns(xs)
      assert(expandRuns(runs) == xs, s"roundtrip failed for ${xs.take(20)}")
      // runs are disjoint, ascending, non-adjacent (maximal coalescing)
      runs.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 < s2, s"non-maximal runs in $runs")
        case _ => ()
      }
    }
    sets.grouped(2).foreach {
      case Seq(a, b) =>
        assert(expandRuns(unionRuns(encodeRuns(a), encodeRuns(b))) ==
          (a ++ b).distinct.sorted, "sweep union must equal set union")
      case _ => ()
    }
  }

  test("over-bound delta refuses with a routing message, vector untouched") {
    val t = freshTable("bound")
    val keys = Tables.orders(spark, sf).filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey")
    assert(keys.count() > 10)
    val e = intercept[IllegalArgumentException](
      DeletionVectors.dvDelete(spark, t, keys, "o_orderkey", maxDriverRows = 10))
    assert(e.getMessage.contains("maxDriverRows"))
    assert(e.getMessage.contains("copy-on-write"), "must route to the rewrite tier")
    assert(DeletionVectors.readDv(spark, t).isEmpty, "refused delete changes nothing")
    val delta = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .filter($"o_orderkey" % 7 === 0)
    intercept[IllegalArgumentException](
      DeletionVectors.morUpsert(spark, t, delta, "o_orderkey", maxDriverRows = 10))
    assert(!dataFileMtimes(t).keys.exists(_.startsWith("mor-")),
      "refused upsert appends nothing (locate bound fires before the append)")
  }

  test("contiguous deletes keep the sidecar run-compressed: bytes ≪ masked rows") {
    // a key-sorted single-file table makes a key-range delete a contiguous
    // row-index block — the clustered shape run-encoding exists for
    val t = root.resolve("runs").toString
    Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey").coalesce(1)
      .write.mode("overwrite").parquet(t)
    val all = Tables.orders(spark, sf).select($"o_orderkey").as[Long].collect().sorted
    val (lo, hi) = (all(all.length / 4), all(3 * all.length / 4))
    val keys = Tables.orders(spark, sf)
      .filter($"o_orderkey".between(lo, hi)).select($"o_orderkey")
    val masked = DeletionVectors.dvDelete(spark, t, keys, "o_orderkey")
    assert(masked > 500, s"fixture must mask hundreds of rows, got $masked")
    val bytes = DeletionVectors.vectorBytes(spark, t)
    assert(bytes < 1000,
      s"one contiguous run must stay O(1) bytes regardless of $masked masked rows, got $bytes")
    assert(DeletionVectors.dvRead(spark, t).count() == all.length - masked)
  }

  test("dvRead anti-joins broadcast RUN triples via a hash join keyed on the file") {
    val t = freshTable("runjoin")
    val keys = Tables.orders(spark, sf).filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey")
    DeletionVectors.dvDelete(spark, t, keys, "o_orderkey")
    val plan = DeletionVectors.dvRead(spark, t).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast hash anti-join on __file with the range residual, got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the run join must probe per-file buckets, not scan every run per row")
  }

  test("autoCompact: read debt crossing the policy folds back in once, ledger intact") {
    val t = freshTable("auto")
    val base = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val policy = DeletionVectors.CompactionPolicy(maxAppendedFiles = 2, maxDirtyRatio = 1.1)
    def batch(i: Int) = base.filter($"o_orderkey" % 499 === 0)
      .select(lit("U").as("op"), $"o_orderkey", $"o_custkey",
        lit(i.toDouble).as("o_totalprice"))
    (1 to 4).foreach { i =>
      assert(DeletionVectors.morApplyCdc(spark, t, batch(i), "o_orderkey", batchId = i,
        autoCompact = Some(policy)))
    }
    // each apply appends ≥1 mor file; the policy allows 2, so compaction
    // fired EXACTLY once (at apply 3) and debt stays bounded after
    val names = dataFileMtimes(t).keys.toSeq
    assert(names.count(_.startsWith("mor-")) <= policy.maxAppendedFiles + 1,
      s"appended-file debt must stay bounded, got $names")
    val cmpNonces = names.filter(_.startsWith("cmp-")).map(_.split("-")(1)).distinct
    assert(cmpNonces.size == 1,
      s"compaction must fire exactly once across the 4 applies, got nonces $cmpNonces")
    // ledger survived compaction: replayed batch ids are still skipped
    (1 to 4).foreach { i =>
      assert(!DeletionVectors.morApplyCdc(spark, t,
        batch(99), "o_orderkey", batchId = i, autoCompact = Some(policy)),
        s"batch $i must remain in the ledger after auto-compaction")
    }
    // content is the last batch's state
    val got = DeletionVectors.dvRead(spark, t)
      .filter($"o_orderkey" % 499 === 0).select($"o_totalprice").as[Double].collect()
    assert(got.nonEmpty && got.forall(_ == 4.0))
  }

  test("mutations against a crashed-flip state never resurrect excluded rows") {
    // review finding (round-12): a compact crash after the visibility flip
    // leaves a file excluded-but-present; a subsequent mutation must not
    // re-mark it row-dirty, or the next compact would rewrite its unmasked
    // rows — resurrecting logically deleted data
    val t = freshTable("resurrect")
    val total = spark.read.parquet(t).count()
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val one = f.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val oneRows = spark.read.parquet(one.toString).count()
    val v0 = DeletionVectors.readVector(spark, t)
    DeletionVectors.writeVector(spark, t,
      v0.copy(excluded = Set(f.makeQualified(one).toString)))
    // a delete whose keys partly live in the excluded file: locate must
    // skip it (those rows are already invisible)
    val keys = Tables.orders(spark, sf).filter($"o_orderkey" % 13 === 0)
      .select($"o_orderkey")
    DeletionVectors.dvDelete(spark, t, keys, "o_orderkey")
    val v1 = DeletionVectors.readVector(spark, t)
    assert(!v1.files.contains(f.makeQualified(one).toString),
      "an excluded file must never become row-dirty")
    val expected = DeletionVectors.dvRead(spark, t)
      .select($"o_orderkey").as[Long].collect().toSet
    // compact converges: excluded file swept, delete preserved, no resurrection
    DeletionVectors.compact(spark, t)
    val got = spark.read.parquet(t).select($"o_orderkey").as[Long].collect().toSet
    assert(got == expected, "compact must preserve exactly the visible rows")
    assert(!f.exists(one), "the crashed-flip leftover must be swept")
    assert(got.size < total - 0 && got.size <= total - oneRows)
  }

  test("insert-heavy autoCompact folds appended files so the trigger is repaid") {
    val t = freshTable("insheavy")
    val base = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val policy = DeletionVectors.CompactionPolicy(maxAppendedFiles = 2, maxDirtyRatio = 1.1)
    // four INSERT-only batches: fresh keys every time, no masks ever
    (1 to 4).foreach { i =>
      val batch = base.limit(50)
        .select(lit("I").as("op"), ($"o_orderkey" + lit(i * 10000000L)).as("o_orderkey"),
          $"o_custkey", lit(i.toDouble).as("o_totalprice"))
      assert(DeletionVectors.morApplyCdc(spark, t, batch, "o_orderkey", batchId = i,
        autoCompact = Some(policy)))
      val mor = dataFileMtimes(t).keys.count(_.startsWith("mor-"))
      assert(mor <= policy.maxAppendedFiles + 1,
        s"appended-file debt must be repaid by folding, got $mor mor files after batch $i")
    }
    // content: base + all four insert batches, exactly once each
    val got = DeletionVectors.dvRead(spark, t).count()
    assert(got == base.count() + 4 * 50)
    (1 to 4).foreach { i =>
      assert(!DeletionVectors.morApplyCdc(spark, t,
        base.limit(1).select(lit("I").as("op"), $"o_orderkey", $"o_custkey", $"o_totalprice"),
        "o_orderkey", batchId = i, autoCompact = Some(policy)),
        s"ledger must still skip batch $i after folds")
    }
  }

  test("whole-file exclusion hides every row; compact sweeps leftover exclusions") {
    val t = freshTable("excl")
    val total = spark.read.parquet(t).count()
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val one = f.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val oneRows = spark.read.parquet(one.toString).count()
    val v0 = DeletionVectors.readVector(spark, t)
    // simulate a compact crashed after its visibility flip: one file fully
    // hidden, its rows already re-packed elsewhere is NOT simulated — this
    // checks the mask semantics and the sweep, not survivor content
    DeletionVectors.writeVector(spark, t,
      v0.copy(excluded = Set(f.makeQualified(one).toString)))
    assert(DeletionVectors.dvRead(spark, t).count() == total - oneRows,
      "an excluded file contributes zero rows at any row count")
    // re-running compact converges: the excluded file is swept, state clean
    DeletionVectors.compact(spark, t)
    assert(!f.exists(one), "leftover excluded file must be deleted")
    assert(DeletionVectors.readVector(spark, t).excluded.isEmpty)
    assert(DeletionVectors.dvRead(spark, t).count() == total - oneRows)
  }

  test("vector byte ceiling: accumulated scattered deletes trigger compact; reads unchanged") {
    val t = freshTable("vecbytes")
    // only the byte trigger can fire: file-count and dirty-ratio are off
    val policy = DeletionVectors.CompactionPolicy(
      maxAppendedFiles = Int.MaxValue, maxDirtyRatio = 2.0, maxVectorBytes = 256)
    val mods = Seq(499, 701, 997)
    mods.foreach { m =>
      val keys = Tables.orders(spark, sf).filter($"o_orderkey" % m === 0)
        .select($"o_orderkey")
      DeletionVectors.dvDelete(spark, t, keys, "o_orderkey",
        autoCompact = Some(policy))
    }
    assert(new java.io.File(t).listFiles().exists(_.getName.startsWith("cmp-")),
      "the byte ceiling must have fired a compact")
    // the lifetime invariant: after every policied write the sidecar is
    // either under the ceiling or was just reset by the compact it fired
    assert(DeletionVectors.vectorBytes(spark, t) <= 256)
    val got = DeletionVectors.dvRead(spark, t)
      .select($"o_orderkey").as[Long].collect().toSet
    val want = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 499 =!= 0 && $"o_orderkey" % 701 =!= 0 &&
        $"o_orderkey" % 997 =!= 0)
      .select($"o_orderkey").as[Long].collect().toSet
    assert(got == want, "compaction driven by the byte ceiling must not change reads")
  }

  test("legacy pre-RLE '<file>\\t<idx>' sidecars read as single-row runs") {
    val t = freshTable("legacy")
    val total = spark.read.parquet(t).count()
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val one = f.makeQualified(f.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head).toString
    // the previous release's format: one line per masked row, plus B ledger
    graft.store.Sidecar.swap(spark, t, "_deletion_vectors/dv.tsv",
      s"B\t7\n$one\t0\n$one\t1\n$one\t5\n")
    val v = DeletionVectors.readVector(spark, t)
    assert(v.batches == Set(7L), "ledger lines must survive the migration read")
    assert(v.files(one) == Seq((0L, 2L), (5L, 1L)),
      "adjacent legacy rows must coalesce into runs")
    assert(DeletionVectors.dvRead(spark, t).count() == total - 3)
    // the next write re-encodes: the sidecar is in the new format afterwards
    DeletionVectors.writeDv(spark, t, DeletionVectors.readDv(spark, t))
    val body = graft.store.Sidecar.readRequired(spark, t, "_deletion_vectors/dv.tsv")
    assert(body.linesIterator.forall(l =>
      l.startsWith("B\t") || l.startsWith("X\t") || l.startsWith("F\t")))
    assert(DeletionVectors.dvRead(spark, t).count() == total - 3)
    // a garbled one-letter record must NOT launder into a legacy mask on
    // a file named 'Z' — the legacy shape requires a path-like field
    graft.store.Sidecar.swap(spark, t, "_deletion_vectors/dv.tsv", "Z\t5\n")
    val e = intercept[graft.store.Sidecar.SidecarCorruptionError](
      DeletionVectors.readVector(spark, t))
    assert(e.getMessage.contains("unknown record type"))
  }
}
