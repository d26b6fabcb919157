package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{InvoicePipeline, InvoiceView}

/** Fine-grained decomposition of the view-assembly cost (union, distinct,
  * persist) that ProfileInvoice showed dominating the flagship:
  *
  *   sbt "runMain graft.tools.ProfileView /root/testdata/sf0.1"
  */
object ProfileView {
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
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    InvoicePipeline.invoicePipeline(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    val t = InvoicePipeline.buildTables(spark, dir)
    val stp = time("stp persist+count")(
      { val s = InvoiceView.successTransactionPayments(t.transactions).persist(); s.count(); s })
    val pl = time("pl persist+count")(
      { val p = InvoiceView.productLines(t, stp).persist(); p.count(); p })
    val al = InvoiceView.aligned(pl)
      .unionByName(InvoiceView.aligned(InvoiceView.refundLines(t)))
      .unionByName(InvoiceView.aligned(InvoiceView.shippingLines(t, stp)))
      .unionByName(InvoiceView.aligned(InvoiceView.giftCardLines(t, stp)))
    time("union only (no distinct)")(al.count())
    time("union + distinct")(al.distinct().count())
    time("union + distinct (again)")(al.distinct().count())
    spark.catalog.clearCache()
    time("view WITH persists")(InvoiceView.tripletexInvoice(t, sorted = false).count())
    spark.catalog.clearCache()
    time("view NO persists")(
      InvoiceView.tripletexInvoice(t, sorted = false, persist = false).count())
    time("view NO persists (again)")(
      InvoiceView.tripletexInvoice(t, sorted = false, persist = false).count())
    spark.catalog.clearCache()
    spark.stop()
  }
}
