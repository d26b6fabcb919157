package graft.ingest

import graft.SparkSuite

/** Edge-input behavior of the JSON normalizers: corrupt pages, missing
  * fields, empty arrays — the permissive-mode contract (SURVEY §1.2).
  */
class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  test("corrupt page bodies are dropped, valid ones survive") {
    val pages = Seq(
      """{"customers":[{"id":1,"email":"a@b","default_address":{"name":"A"}}]}""",
      """not json at all""",
      """{"customers":"wrong-shape"}""",
    ).toDS()
    val out = Normalize.customers(pages).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("id") == 1)
  }

  test("missing optional fields become nulls, not failures") {
    val pages = Seq("""{"orders":[{"id":7,"name":"#7"}]}""").toDS()
    val o = Normalize.orders(pages).collect()
    assert(o.length == 1)
    assert(o(0).isNullAt(o(0).fieldIndex("customer_id")))
    assert(o(0).isNullAt(o(0).fieldIndex("financial_status")))
    // no line items / shipping → empty child frames, not errors
    assert(Normalize.lineItemProducts(pages).count() == 0)
    assert(Normalize.shipping(pages).count() == 0)
  }

  test("empty tax_lines and discount_allocations take the 0/null defaults") {
    val pages = Seq(
      """{"orders":[{"id":7,"name":"#7","line_items":[
        |{"id":1,"title":"X","price":"10.00","quantity":2,
        | "tax_lines":[],"discount_allocations":[],
        | "price_set":{"presentment_money":{"currency_code":"NOK"}}}]}]}"""
        .stripMargin.replace("\n", "")).toDS()
    val li = Normalize.lineItemProducts(pages).head()
    assert(li.getAs[java.math.BigDecimal]("tax_amount").signum == 0)
    assert(li.getAs[java.math.BigDecimal]("tax_rate").signum == 0)
    assert(li.isNullAt(li.fieldIndex("tax_title")))
    assert(li.getAs[java.math.BigDecimal]("total_discount_amount").signum == 0)
    assert(li.getAs[java.math.BigDecimal]("total_price")
      .compareTo(new java.math.BigDecimal("20.00")) == 0)
  }

  test("refund with empty refund_line_items: count 0, no child rows") {
    val pages = Seq(
      """{"order_id":7,"refunds":[{"id":9,"note":null,
        |"transactions":[{"id":3}],"refund_line_items":[]}]}"""
        .stripMargin.replace("\n", "")).toDS()
    val r = Normalize.refunds(pages).head()
    assert(r.getAs[Int]("refunded_product_cnt") == 0)
    assert(r.getAs[Long]("transaction_id") == 3L)
    assert(Normalize.refundLineItems(pages).count() == 0)
  }

  test("transactions take page-level order_id when the document omits it") {
    val pages = Seq(
      """{"order_id":42,"transactions":[{"id":1,"status":"success","kind":"sale"}]}""").toDS()
    val t = Normalize.transactions(pages).head()
    assert(t.getAs[Long]("order_id") == 42L)
  }
}
