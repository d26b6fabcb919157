package graft.verify

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge-case coverage for the 8 invariant checks beyond the golden E2E
  * run: gap messages, null-gateway P5 semantics, empty-string
  * normalization, price-tolerance boundary rows.
  */
class ChecksSpec extends SparkSuite {
  import spark.implicits._

  private def frame(rows: Seq[(Int, String, Double, Int, Double, Double, String, Long, String)]) =
    rows.toDF("CUSTOMER NO", "ORDER NO", "PAID AMOUNT", "ORDER LINE - COUNT",
        "ORDER LINE - UNIT PRICE", "ORDER LINE - DISCOUNT", "PAYMENT TYPE",
        "INVOICE NO", "ORDER LINE - PROD NO")
      .withColumn("ORDER LINE - VAT CODE", lit(3))
      .withColumn("ORDER LINE - DESCRIPTION", lit(null).cast("string"))
      .withColumn("ORDER LINE - PROD NAME", lit("x"))
      .withColumn("INVOICE DATE", lit("2021-05-01").cast("date"))
      .withColumn("DELIVERY DATE", lit("2021-05-01").cast("date"))
      .withColumn("ORDER DATE", lit("2021-05-01").cast("date"))
      .withColumn("DUE DATE", lit("2021-05-01").cast("date"))

  test("order_no gap detection reports missing '#'-numbers of non-refund rows") {
    val df = frame(Seq(
      (1, "#100", 10.0, 1, 10.0, 0.0, "Vipps", 1L, "A"),
      (1, "#103", 10.0, 1, 10.0, 0.0, "Vipps", 2L, "A"),
      (1, "#102-1", -5.0, -1, 5.0, 0.0, "Vipps", 3L, "A"))) // refund: excluded
    val f = Checks.orderNo(df)
    assert(!f.passed)
    assert(f.warnings.head == "The following 2 orders are missing: #101, #102")
  }

  test("invoice_no gap detection") {
    val df = frame(Seq(
      (1, "#1", 10.0, 1, 10.0, 0.0, "V", 100L, "A"),
      (1, "#2", 10.0, 1, 10.0, 0.0, "V", 104L, "A")))
    val f = Checks.invoiceNo(df)
    assert(!f.passed)
    assert(f.warnings.head.contains("101, 102, 103"))
  }

  test("unknown_gateway keeps null payment types (pandas ~isin semantics)") {
    val df = frame(Seq(
      (1, "#1", 10.0, 1, 10.0, 0.0, null, 1L, "A"),
      (1, "#2", 10.0, 1, 10.0, 0.0, "Vipps", 2L, "A")))
    val f = Checks.unknownGateway(df, Some(Seq("Vipps")))
    assert(!f.passed)
    assert(f.warnings.length == 1 && f.warnings.head.contains("#1"))
    assert(Checks.unknownGateway(df, None).passed, "no allow-list → vacuous pass")
  }

  test("price check flags only >1% deviations and honors discounts") {
    val df = frame(Seq(
      // order #1: paid 100, line total = 2 × 50 × (100-0)/100 = 100 → ok
      (1, "#1", 100.0, 2, 50.0, 0.0, "V", 1L, "A"),
      // order #2: paid 100, line total = 1 × 100 × (100-10)/100 = 90 → 10% off
      (1, "#2", 100.0, 1, 100.0, 10.0, "V", 2L, "A"),
      // order #3: paid 100, lines 99.5 → 0.5% → inside tolerance
      (1, "#3", 100.0, 1, 99.5, 0.0, "V", 3L, "A")))
    val f = Checks.price(df)
    assert(!f.passed)
    assert(f.warnings.length == 1 && f.warnings.head.contains("#2"))
  }

  test("normalizeEmpty turns empty strings into nulls before checks") {
    val df = frame(Seq((1, "#1", 10.0, 1, 10.0, 0.0, "", 1L, "")))
    val n = Checks.normalizeEmpty(df)
    assert(n.filter(col("PAYMENT TYPE").isNull).count() == 1)
    assert(n.filter(col("ORDER LINE - PROD NO").isNull).count() == 1)
    // and none_values then reports PAYMENT TYPE as missing
    val f = Checks.noneValues(n)
    assert(!f.passed && f.warnings.exists(_.startsWith("Required column PAYMENT TYPE")))
  }

  test("orderCounts splits ordinary vs refund-only orders") {
    val df = frame(Seq(
      (1, "#1", 10.0, 1, 10.0, 0.0, "V", 1L, "A"),
      (1, "#2-1", -10.0, -1, 10.0, 0.0, "V", 2L, "A")))
    assert(Checks.orderCounts(df) == (1L, 1L))
  }
}
