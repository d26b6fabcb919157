package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.{InvoicePipeline, InvoiceView, InvoiceNumbers}

/** Stage-level wall-clock breakdown of the flagship invoice pipeline:
  *
  *   sbt "runMain graft.tools.ProfileInvoice /root/testdata/sf0.1"
  */
object ProfileInvoice {
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
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    // JIT warmup on the smallest SF
    InvoicePipeline.invoicePipeline(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    val t = time("buildTables (lazy)")(InvoicePipeline.buildTables(spark, dir))
    time("  transactions count")(t.transactions.count())
    time("  lip count")(t.lineItemProducts.count())
    spark.catalog.clearCache()
    val stp = time("stp count")(
      { val s = InvoiceView.successTransactionPayments(t.transactions); s.count(); s })
    time("product_lines count")(InvoiceView.productLines(t, stp).count())
    spark.catalog.clearCache()
    // decompose the view cost: branches alone vs union vs distinct
    val stp2 = InvoiceView.successTransactionPayments(t.transactions)
    val pl2 = InvoiceView.productLines(t, stp2)
    time("refund_lines count")(InvoiceView.refundLines(t).count())
    time("shipping_lines count")(InvoiceView.shippingLines(t, stp2).count())
    time("gift_card_lines count")(InvoiceView.giftCardLines(t, stp2).count())
    spark.catalog.clearCache()
    time("view materialize (2nd cold)")(
      { val v = InvoiceView.tripletexInvoice(t, sorted = false); v.count() })
    spark.catalog.clearCache()
    val view = time("view materialize")(
      { val v = InvoiceView.tripletexInvoice(t, sorted = false).persist(); v.count(); v })
    time("numbering over persisted")(
      InvoiceNumbers.numberInvoices(view,
        java.time.LocalDate.parse("1996-01-01"),
        java.time.LocalDate.parse("1998-12-31"), 5000L).count())
    spark.catalog.clearCache()
    time("full pipeline cold")(InvoicePipeline.invoicePipeline(spark, dir).count())
    spark.stop()
  }
}
