package graft.store

import graft.SparkSuite
import graft.queries.Tables.withConf
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** File-level contract of q207 (dynamic partition overwrite): the
  * replacement batch rewrites EXACTLY the partitions it carries rows for,
  * and every other partition keeps its physical files byte-for-byte — the
  * property that makes a 3-day backfill on a 3-year table cost 3 days of
  * IO, not the table. Also pins the failure mode the oracle would catch:
  * STATIC mode (the default) truncates the whole table first.
  */
class DynamicOverwriteSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  private def partFiles(root: Path, part: String): Map[String, Long] =
    Files.list(root.resolve(part)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> Files.size(p)).toMap

  private def freshTable(root: Path): Unit = {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "b", 40.0), (5L, "c", 50.0)).toDF("id", "pt", "v")
    base.write.partitionBy("pt").parquet(root.toString)
  }

  test("dynamic overwrite replaces only the batch's partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("dyn_ow").resolve("tbl")
    freshTable(root)
    val aBefore = partFiles(root, "pt=a")
    val cBefore = partFiles(root, "pt=c")
    val repl = Seq((6L, "a", 60.0)).toDF("id", "pt", "v")
    withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
      repl.write.mode("overwrite").partitionBy("pt").parquet(root.toString)
    }
    // untouched partitions: identical physical files (names AND sizes)
    assert(partFiles(root, "pt=c") == cBefore, "pt=c must be untouched")
    assert(partFiles(root, "pt=b").nonEmpty, "pt=b must survive")
    // replaced partition: new files, new content
    assert(partFiles(root, "pt=a") != aBefore, "pt=a must be rewritten")
    val got = spark.read.parquet(root.toString)
      .select($"id", $"pt".cast("string"), $"v").as[(Long, String, Double)]
      .collect().toSet
    assert(got == Set((6L, "a", 60.0), (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0)))
  }

  test("static mode (the default) would truncate unrelated partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("dyn_ow_static").resolve("tbl")
    freshTable(root)
    val repl = Seq((6L, "a", 60.0)).toDF("id", "pt", "v")
    withConf(spark, "spark.sql.sources.partitionOverwriteMode", "static") {
      repl.write.mode("overwrite").partitionBy("pt").parquet(root.toString)
    }
    val got = spark.read.parquet(root.toString).count()
    assert(got == 1L, "static overwrite truncates the whole table — " +
      "the failure q207's oracle hash-catches if the conf were dropped")
  }
}
