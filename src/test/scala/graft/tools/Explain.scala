package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection & stage timing for a named SparkEntry query:
  *
  *   sbt "runMain graft.tools.Explain q36_invoice_pipeline /root/testdata/sf0.01"
  *
  * Prints the formatted physical plan (PushedFilters / ReadSchema /
  * WholeStageCodegen spans) and wall-clock for N repeated runs — the
  * explain-and-iterate loop the 100 TB posture demands.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val df = fn(spark, dir)
    println(s"=== $name plan ===")
    df.explain("formatted")
    (1 to runs).foreach { i =>
      spark.catalog.clearCache() // cold-data timing: per-query persists must not carry over
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
