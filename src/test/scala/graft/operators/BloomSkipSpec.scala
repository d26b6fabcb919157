package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class BloomSkipSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_bloomskip_spec")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  // staged once: orders scattered on o_custkey (so o_orderkey min/max
  // spans overlap everywhere), bloom manifest on o_orderkey
  private lazy val table: String = {
    val p = root.resolve("orders").toString
    val src = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    BloomSkip.writeIndexed(spark, src, p, keyCol = "o_orderkey",
      scatterCol = "o_custkey", numFiles = 16)
    p
  }

  test("pruned lookup returns exactly the matching rows") {
    val all = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val keys = all.filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey").as[Long].collect().toSeq.sorted
    assert(keys.nonEmpty)
    val (df, read, total) = BloomSkip.prunedLookup(spark, table, "o_orderkey", keys)
    val got = df.select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey").collect().toSeq
    val want = all.filter($"o_orderkey".isin(keys: _*))
      .orderBy($"o_orderkey").collect().toSeq
    assert(got == want)
    assert(total == 16)
  }

  test("bloom pruning opens fewer files than min/max span pruning would") {
    // median key: interior to nearly every file's span on a scattered
    // layout, so min/max pruning is near-useless for it
    val n = Tables.orders(spark, sf).count()
    val k = Tables.orders(spark, sf).orderBy($"o_orderkey")
      .limit((n / 2).toInt + 1).agg(max($"o_orderkey")).head().getLong(0)
    val (df, read, total) = BloomSkip.prunedLookup(spark, table, "o_orderkey", Seq(k))
    assert(df.count() == 1)
    assert(read < total, s"expected pruning: read=$read total=$total")
    // what min/max span pruning would have opened for the same key
    val spanHits = spark.read.parquet(table)
      .groupBy(col("_metadata.file_path"))
      .agg(min($"o_orderkey").as("lo"), max($"o_orderkey").as("hi"))
      .collect()
      .count(r => r.getLong(1) <= k && k <= r.getLong(2))
    assert(read < spanHits,
      s"bloom should beat span pruning here: bloom=$read spans=$spanHits")
  }

  test("no false negatives: every file that contains a key is kept") {
    val keys = Seq(7L, 4242L, 9999L).filter(k =>
      Tables.orders(spark, sf).filter($"o_orderkey" === k).count() > 0)
    assert(keys.nonEmpty)
    val truth = spark.read.parquet(table)
      .filter($"o_orderkey".isin(keys: _*))
      .select(col("_metadata.file_path")).distinct()
      .as[String].collect().toSet
    val kept = BloomSkip.lookupFiles(
      BloomSkip.readManifest(spark, table), keys.map(_.toString))
      .map(_.file).toSet
    assert(truth.subsetOf(kept), s"missing files: ${truth -- kept}")
  }

  test("absent key yields an empty result (false positives filtered)") {
    val (df, _, _) = BloomSkip.prunedLookup(spark, table, "o_orderkey", Seq(-1L))
    assert(df.count() == 0)
  }

  test("cow upsert rewrites only maybe-hit files and merges exactly") {
    import org.apache.spark.sql.functions.lit
    val all = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    // small delta: 3 updates + 2 inserts above the key domain
    val upKeys = all.orderBy($"o_orderkey").limit(3)
      .select($"o_orderkey").as[Long].collect().toSeq
    val delta = all.filter($"o_orderkey".isin(upKeys: _*))
      .withColumn("o_totalprice", lit(7.5))
      .unionByName(all.limit(2)
        .select(($"o_orderkey" + lit(10000000L)).as("o_orderkey"),
          $"o_custkey", lit(1.25).as("o_totalprice")))
    val dst = root.resolve("cow_out").toString
    val st = BloomSkip.cowUpsert(spark, table, dst, "o_orderkey", delta)
    // 3 update keys touch ≤3 files (+ε false positives); inserts touch none
    assert(st.filesKept >= 10, s"expected most files untouched, kept=${st.filesKept}")
    assert(st.filesRewritten >= 1, "inserts guarantee rewritten output")
    assert(st.rowsIncoming == 5)
    // content: exactly the merged table
    val got = spark.read.parquet(dst)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey").collect().toSeq
    val want = all.join(delta.select($"o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(delta).orderBy($"o_orderkey").collect().toSeq
    assert(got == want)
    // manifest maintained: post-merge point lookups stay exact AND pruned
    val (df, read, total) = BloomSkip.prunedLookup(spark, dst, "o_orderkey",
      Seq(upKeys.head, upKeys.head + 10000000L))
    assert(read < total)
    val rows = df.orderBy($"o_orderkey").collect()
    assert(rows.length >= 1 && rows.exists(_.getDouble(2) == 7.5))
  }

  test("cow upsert refuses a key-duplicated delta") {
    import org.apache.spark.sql.functions.lit
    val one = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice").limit(1)
    val dup = one.unionByName(one.withColumn("o_totalprice", lit(0.0)))
    intercept[IllegalArgumentException](
      BloomSkip.cowUpsert(spark, table, root.resolve("cow_dup").toString,
        "o_orderkey", dup))
  }

  test("fenced-out writer's cow upsert dies before touching the target") {
    import graft.store.WriterLease
    // a populated destination a rival now owns
    val dst = root.resolve("cow_fenced").toString
    val delta0 = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice").limit(1)
    BloomSkip.cowUpsert(spark, table, dst, "o_orderkey", delta0)
    val before = spark.read.parquet(dst).count()
    val a = WriterLease.acquire(spark, dst, "writerA", ttlMs = 60000)
    val leaseFile = new org.apache.hadoop.fs.Path(dst + "__lease", "LEASE")
    leaseFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(leaseFile, System.currentTimeMillis() - 120000, -1)
    val b = WriterLease.acquire(spark, dst, "writerB", ttlMs = 60000)
    WriterLease.adopt(a)
    intercept[WriterLease.FencedException](
      BloomSkip.cowUpsert(spark, table, dst, "o_orderkey",
        delta0.withColumn("o_totalprice", lit(9.9))))
    WriterLease.adopt(b)
    assert(spark.read.parquet(dst).count() == before, "loser must change nothing")
    WriterLease.release(spark, b)
  }

  test("manifest sidecar is invisible to plain readers") {
    val n = spark.read.parquet(table).count()
    assert(n == Tables.orders(spark, sf).count())
  }
}
