package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zorderKey interleaves bits (hand-checked values)") {
    // x=0b101 (5), y=0b011 (3) → z = x bits at even, y bits at odd:
    // bit0=1 (x0), bit1=1 (y0), bit2=0 (x1), bit3=1 (y1), bit4=1 (x2) = 0b11011 = 27
    val z = spark.range(1)
      .select(Layout.zorderKey(lit(5), lit(3), bits = 8).as("z"))
      .head().getLong(0)
    assert(z == 27L)
  }

  test("clustered write produces row-disjoint zkey file ranges (pruning-ready layout)") {
    val df = Tables.documents(spark, sf).select(
      $"doc_id",
      TextFunctions.tokenCount($"text").cast("int").as("n_tokens"),
      (
        when($"lang" === "en", 0).when($"lang" === "de", 1)
          .when($"lang" === "fr", 2).when($"lang" === "es", 3).otherwise(4)
      ).as("lang_idx"))
    val out = java.nio.file.Files.createTempDirectory("layout-z").toString + "/docs"
    Layout.clusteredWrite(df, col("n_tokens"), col("lang_idx"), out,
      numFiles = 8, bits = 8)
    val files = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val ranges = files.flatMap { f =>
      val d = spark.read.parquet(f)
        .withColumn("z", Layout.zorderKey(col("n_tokens"), col("lang_idx"), bits = 8))
        .agg(min($"z"), max($"z"), count(lit(1))).head()
      if (d.getLong(2) == 0) None else Some((d.getLong(0), d.getLong(1)))
    }.sortBy(_._1)
    assert(ranges.length > 1, "clustering must spread rows over multiple files")
    // pairwise-disjoint key spans (shared boundary value allowed): this is
    // exactly what min/max file statistics prune on
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }
    // and the layout preserves the data
    assert(spark.read.parquet(out).count() == df.count())
  }

  test("compact: 64 fragments -> targetFiles disjoint-range files, content-identical") {
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"value")
    val root = java.nio.file.Files.createTempDirectory("layout-compact")
    val src = root.resolve("frag").toString
    ev.repartition(64).write.mode("overwrite").parquet(src)
    assert(new java.io.File(src).listFiles.count(_.getName.endsWith(".parquet")) > 16)
    val dst = root.resolve("compact").toString
    Layout.compact(spark, src, dst, "event_id", targetFiles = 4)
    val files = new java.io.File(dst).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 4, s"expected 4 output files, got ${files.length}")
    // disjoint per-file event_id spans: min/max stats prune after compaction
    val ranges = files.map { f =>
      val d = spark.read.parquet(f).agg(min($"event_id"), max($"event_id")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }
    // content identity, row for row
    val a = spark.read.parquet(dst).orderBy($"event_id").collect().toSeq
    val b = ev.orderBy($"event_id").collect().toSeq
    assert(a == b)
  }
}
