package graft.model

import org.apache.spark.sql.types._

/** Explicit StructType registry for every stored table (no schema inference
  * in production paths — SURVEY.md §1.2). Mirrors `/root/reference/
  * setup.sql:1-190` DDL; money is DecimalType(38,9) end-to-end (rendered
  * round(…,2)), timestamps are UTC TimestampType, ids LongType.
  */
object Schemas {

  val Money: DecimalType = DecimalType(38, 9)

  /** setup.sql:2-20 */
  val customers: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("email", StringType),
    StructField("name", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("phone", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("zip", StringType),
    StructField("country", StringType),
    StructField("total_spent", Money),
    StructField("verified_email", BooleanType),
    StructField("note", StringType),
    StructField("accepts_marketing", BooleanType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
  ))

  /** setup.sql:22-42 */
  val orders: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("customer_id", LongType),
    StructField("name", StringType, nullable = false),
    StructField("fulfillment_status", StringType),
    StructField("financial_status", StringType),
    StructField("total_price", Money, nullable = false),
    StructField("total_line_items_price", Money),
    StructField("total_discounts_amount", Money),
    StructField("total_tax_amount", Money),
    StructField("taxes_included", BooleanType),
    StructField("currency", StringType),
    StructField("created_at", TimestampType),
    StructField("closed_at", TimestampType),
    StructField("processed_at", TimestampType),
  ))

  /** setup.sql:44-55 — always empty (dead ingest path, SURVEY §2.11); kept
    * for view-shape parity.
    */
  val discounts: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("order_id", LongType),
    StructField("discount_code", StringType),
    StructField("discount_type", StringType),
    StructField("discount_value", Money),
    StructField("discount_value_type", StringType),
  ))

  /** setup.sql:57-66 */
  val products: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType),
    StructField("status", StringType),
    StructField("product_type", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("vendor", StringType),
  ))

  /** setup.sql:68-84 */
  val productVariants: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("product_id", LongType, nullable = false),
    StructField("price", Money),
    StructField("title", StringType),
    StructField("sku", StringType),
    StructField("option1", StringType),
    StructField("option2", StringType),
    StructField("option3", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
  ))

  /** setup.sql:86-112 */
  val lineItemProducts: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("order_id", LongType, nullable = false),
    StructField("product_id", LongType),
    StructField("title", StringType, nullable = false),
    StructField("sku", StringType),
    StructField("unit_price", Money, nullable = false),
    StructField("total_price", Money, nullable = false),
    StructField("total_discount_amount", Money),
    StructField("quantity", IntegerType, nullable = false),
    StructField("vendor", StringType),
    StructField("variant_title", StringType),
    StructField("tax_amount", Money),
    StructField("tax_rate", Money),
    StructField("tax_title", StringType),
    StructField("taxable", BooleanType),
    StructField("currency", StringType),
  ))

  /** setup.sql:114-130 */
  val transactions: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("order_id", LongType, nullable = false),
    StructField("status", StringType),
    StructField("amount", Money),
    StructField("currency", StringType),
    StructField("error_code", StringType),
    StructField("gateway", StringType),
    StructField("kind", StringType),
    StructField("created_at", TimestampType),
    StructField("processed_at", TimestampType),
  ))

  /** setup.sql:132-153 */
  val shipping: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("order_id", LongType),
    StructField("code", StringType),
    StructField("price", Money, nullable = false),
    StructField("discounted_price", Money),
    StructField("currency", StringType),
    StructField("title", StringType),
    StructField("source", StringType),
    StructField("phone", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("zip", StringType),
    StructField("country", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
  ))

  /** setup.sql:155-172 */
  val refunds: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("order_id", LongType, nullable = false),
    StructField("transaction_id", LongType, nullable = false),
    StructField("note", StringType),
    StructField("refunded_product_cnt", IntegerType),
    StructField("created_at", TimestampType),
    StructField("processed_at", TimestampType),
  ))

  /** setup.sql:174-190 */
  val lineItemProductRefunds: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("refund_id", LongType, nullable = false),
    StructField("line_item_product_id", LongType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("currency", StringType),
    StructField("refund_amount", Money),
  ))

  /** Upsert key + partial update-column metadata per table (SURVEY §2.12;
    * `db.py:115-407`). `updateColumns = None` ⇒ all non-key columns.
    * `dayPartitioned` ⇒ the store lays the table out partitioned by
    * `to_date(created_at)` (SURVEY §4's scale layout: the date-bounded
    * refetch and the S4 re-read prune to the touched day partitions).
    */
  final case class TableMeta(name: String, schema: StructType, keys: Seq[String],
                             updateColumns: Option[Seq[String]] = None,
                             dayPartitioned: Boolean = false)

  val tables: Seq[TableMeta] = Seq(
    TableMeta("customers", customers, Seq("id"),
      // db.py:266-280 — `note` is insert-only
      Some(customers.fieldNames.toSeq.filterNot(Set("id", "note")))),
    TableMeta("orders", orders, Seq("id"),
      // db.py:129-140 — financial_status & currency stay stale on conflict
      Some(orders.fieldNames.toSeq.filterNot(Set("id", "financial_status", "currency"))),
      dayPartitioned = true),
    TableMeta("discounts", discounts, Seq("id")),
    TableMeta("products", products, Seq("id")),
    TableMeta("product_variants", productVariants, Seq("id")),
    TableMeta("line_item_products", lineItemProducts, Seq("id"),
      // db.py:296-315 — ON CONFLICT SET omits `tax_title` (insert-only)
      Some(lineItemProducts.fieldNames.toSeq.filterNot(Set("id", "tax_title")))),
    TableMeta("transactions", transactions, Seq("id"),
      // db.py:185-193 — `amount` is insert-only
      Some(transactions.fieldNames.toSeq.filterNot(Set("id", "amount"))),
      dayPartitioned = true),
    TableMeta("shipping", shipping, Seq("id")),
    TableMeta("refunds", refunds, Seq("id"), dayPartitioned = true),
    TableMeta("line_item_product_refunds", lineItemProductRefunds, Seq("id")),
  )

  val byName: Map[String, TableMeta] = tables.map(t => t.name -> t).toMap

  /** Invoice CSV contract: 17 columns in the reference's export order —
    * REQUIRED fields then OPTIONAL fields
    * (`shopifydb.py:144` exports `INVOICE_REQUIRED_FIELDS +
    * INVOICE_OPTIONAL_FIELDS`, lists at `tripletex.py:6-27`).
    */
  val invoiceCsvColumns: Seq[String] = Seq(
    // required (tripletex.py:6-19)
    "CUSTOMER NO", "ORDER NO", "PAID AMOUNT", "ORDER LINE - COUNT",
    "ORDER LINE - UNIT PRICE", "ORDER LINE - VAT CODE", "PAYMENT TYPE",
    "INVOICE DATE", "DELIVERY DATE", "ORDER DATE", "DUE DATE", "INVOICE NO",
    // optional (tripletex.py:21-27)
    "CUSTOMER NAME", "ORDER LINE - PROD NAME", "ORDER LINE - DISCOUNT",
    "ORDER LINE - DESCRIPTION", "ORDER LINE - PROD NO")

  val invoiceCsv: StructType = StructType(Seq(
    StructField("CUSTOMER NO", IntegerType),
    StructField("ORDER NO", StringType),
    StructField("PAID AMOUNT", DecimalType(38, 2)),
    StructField("ORDER LINE - COUNT", IntegerType),
    StructField("ORDER LINE - UNIT PRICE", DecimalType(38, 2)),
    StructField("ORDER LINE - VAT CODE", IntegerType),
    StructField("PAYMENT TYPE", StringType),
    StructField("INVOICE DATE", DateType),
    StructField("DELIVERY DATE", DateType),
    StructField("ORDER DATE", DateType),
    StructField("DUE DATE", DateType),
    StructField("INVOICE NO", LongType),
    StructField("CUSTOMER NAME", StringType),
    StructField("ORDER LINE - PROD NAME", StringType),
    StructField("ORDER LINE - DISCOUNT", DecimalType(38, 2)),
    StructField("ORDER LINE - DESCRIPTION", StringType),
    StructField("ORDER LINE - PROD NO", StringType),
  ))
}
