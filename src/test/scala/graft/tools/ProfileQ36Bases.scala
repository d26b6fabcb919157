package graft.tools

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.queries.{InvoiceNumbers, InvoicePipeline, InvoiceView}
import org.apache.spark.sql.functions.col

/** A/B harness for q36 base-table caching: times the exact invoicePipeline
  * shape with/without persisting the narrow shared derivations
  * (transactions union, lip window) and with/without the stp/lip narrow
  * persists, interleaved so JVM warmth can't favor later variants.
  *
  *   sbt "Test/runMain graft.tools.ProfileQ36Bases /root/testdata/sf0.1 4"
  */
object ProfileQ36Bases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orderKeys = Seq("INVOICE NO", "transaction_id",
      "ORDER LINE - PROD NO", "ORDER LINE - PROD NAME",
      "ORDER LINE - UNIT PRICE", "ORDER LINE - COUNT")

    def pipeline(bases: Boolean, persist: Boolean)(d: String) = {
      val tables = InvoicePipeline.buildTables(spark, d, persistBases = bases)
      val view = InvoiceView.tripletexInvoice(tables, sorted = false, persist = persist)
      val numbered = InvoiceNumbers.numberInvoicesIndexed(view,
        InvoiceView.tripletexInvoicePairDates(tables),
        LocalDate.parse("1996-01-01"), LocalDate.parse("1998-12-31"), 5000L)
      val money = Seq("PAID AMOUNT", "ORDER LINE - UNIT PRICE", "ORDER LINE - DISCOUNT")
      val out = money.foldLeft(numbered)((x, c) => x.withColumn(c, col(c).cast("double")))
        .withColumn("INVOICE NO", col("INVOICE NO").cast("long"))
      out.orderBy(orderKeys.map(col): _*)
    }

    val variants = Seq(
      "nobase+nopersist" -> pipeline(bases = false, persist = false) _,
      "bases +nopersist" -> pipeline(bases = true, persist = false) _,
      "bases +persist  " -> pipeline(bases = true, persist = true) _,
      "nobase+persist  " -> pipeline(bases = false, persist = true) _,
    )
    variants.foreach { case (_, f) => f(dir).count() } // warm at the timed SF
    spark.catalog.clearCache(); System.gc()

    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f(dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      acc(name) = dt :: acc.getOrElse(name, Nil)
      spark.catalog.clearCache(); System.gc()
      require(n > 0)
    }
    for ((name, _) <- variants) {
      val ts = acc(name).sorted
      println(f"$name  min=${ts.head}%6.2fs  med=${ts(ts.size / 2)}%6.2fs  max=${ts.last}%6.2fs  all=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
