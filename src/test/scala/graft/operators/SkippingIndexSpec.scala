package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SkippingIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_skipidx_spec")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  private lazy val table: String = {
    val p = root.resolve("orders").toString
    SkippingIndex.writeIndexed(spark,
      Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      p, "o_orderkey", numFiles = 8)
    p
  }

  test("clustered write produces disjoint per-file key spans") {
    val stats = SkippingIndex.readManifest(spark, table).sortBy(_.minKey)
    assert(stats.size == 8)
    stats.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey < b.minKey, s"overlap: $a / $b")
      case _ =>
    }
    assert(stats.map(_.rows).sum == Tables.orders(spark, sf).count())
  }

  test("pruned range scan opens only overlapping files and stays exact") {
    val all = Tables.orders(spark, sf)
    val minK = all.agg(min($"o_orderkey")).head().getLong(0)
    val maxK = all.agg(max($"o_orderkey")).head().getLong(0)
    val lo = minK + (maxK - minK) / 4
    val hi = minK + (maxK - minK) / 2
    val (df, read, total) = SkippingIndex.prunedRead(spark, table, "o_orderkey", lo, hi)
    assert(read < total, s"expected pruning: $read/$total")
    val got = df.select($"o_orderkey").as[Long].collect().toSet
    val want = all.filter($"o_orderkey".between(lo, hi))
      .select($"o_orderkey").as[Long].collect().toSet
    assert(got == want)
  }

  test("tableStats answers rows/min/max from the manifest alone") {
    val (rows, minK, maxK) = SkippingIndex.tableStats(spark, table)
    val r = Tables.orders(spark, sf)
      .agg(count(lit(1)), min($"o_orderkey"), max($"o_orderkey")).head()
    assert(rows == r.getLong(0) && minK == r.getLong(1) && maxK == r.getLong(2))
  }

  test("rangeCount scans only boundary files for an interior range") {
    val (_, minK, maxK) = SkippingIndex.tableStats(spark, table)
    val lo = minK + (maxK - minK) / 5
    val hi = maxK - (maxK - minK) / 5
    val (n, scanned, totalFiles) = SkippingIndex.rangeCount(spark, table, "o_orderkey", lo, hi)
    assert(n == Tables.orders(spark, sf).filter($"o_orderkey".between(lo, hi)).count())
    assert(scanned <= 2, s"interior range must scan at most the 2 boundary files, got $scanned")
    assert(totalFiles == 8)
    // whole-domain count needs zero scans (every span fully covered)
    val (all, scanned0, _) = SkippingIndex.rangeCount(spark, table, "o_orderkey", minK, maxK)
    assert(all == SkippingIndex.tableStats(spark, table)._1 && scanned0 == 0)
  }

  test("copy-on-write range delete rewrites only overlapping files, manifest maintained") {
    val (_, minK, maxK) = SkippingIndex.tableStats(spark, table)
    val lo = minK + (maxK - minK) / 3
    val hi = minK + (maxK - minK) / 2
    val dst = root.resolve("deleted").toString
    val st = SkippingIndex.deleteRange(spark, table, dst, "o_orderkey", lo, hi)
    assert(st.filesKept > 0 && st.filesRewritten > 0)
    assert(st.filesKept + st.filesRewritten >= 8 - st.filesRewritten)
    val got = spark.read.parquet(dst).select($"o_orderkey").as[Long].collect().toSet
    val want = Tables.orders(spark, sf).filter(!$"o_orderkey".between(lo, hi))
      .select($"o_orderkey").as[Long].collect().toSet
    assert(got == want)
    assert(st.rowsDeleted == Tables.orders(spark, sf)
      .filter($"o_orderkey".between(lo, hi)).count())
    // the destination's manifest is immediately usable
    val (rows, _, _) = SkippingIndex.tableStats(spark, dst)
    assert(rows == want.size)
  }
}
