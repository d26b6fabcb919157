package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.{InvoicePipeline, InvoiceView}

/** Isolate the first-execution cost of the flagship view in a fresh JVM:
  * sf0.001 warmup (like Bench), then the sf0.1 view twice, then the full
  * pipeline twice.
  *
  *   sbt "runMain graft.tools.ProfileFirst /root/testdata/sf0.1"
  */
object ProfileFirst {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    time("warmup sf0.001 full pipeline")(
      InvoicePipeline.invoicePipeline(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    val t = InvoicePipeline.buildTables(spark, dir)
    time("view run 1")(InvoiceView.tripletexInvoice(t, sorted = false).count())
    spark.catalog.clearCache()
    time("view run 2")(InvoiceView.tripletexInvoice(t, sorted = false).count())
    spark.catalog.clearCache()
    time("full pipeline run 1")(InvoicePipeline.invoicePipeline(spark, dir).count())
    spark.catalog.clearCache()
    time("full pipeline run 2")(InvoicePipeline.invoicePipeline(spark, dir).count())
    spark.catalog.clearCache()
    spark.stop()
  }
}
