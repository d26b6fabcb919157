package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.ShopifyStore

/** E1 `shopify-update` (`/root/reference/shopifydb.py:56-94`): the 6-stage
  * ingestion dataflow — customers → products/variants → orders(+line
  * items+shipping) → DB re-read → transactions fan-out → refunds fan-out.
  *
  * Scale deltas vs the reference (documented capability wins):
  *  - page bodies become a Dataset immediately, so normalization is
  *    partition-parallel instead of driver pandas;
  *  - the per-order HTTP fan-outs run inside `mapPartitions` (the
  *    reference loops serially on the driver — `shopify.py:391,438`);
  *    per-partition clients keep per-token rate limits locally.
  */
object IngestPipeline {

  /** Field lists (`shopify.py:13-93`). */
  val orderFields: Seq[String] = Seq("id", "line_items", "name", "billing_address",
    "total_price", "closed_at", "created_at", "processed_at", "currency",
    "current_total_discounts", "current_subtotal_price", "fulfillment_status",
    "financial_status", "customer", "landing_site", "shipping_lines",
    "taxes_included", "total_line_items_price", "total_discounts", "total_tax",
    "discount_applications")
  val customerFields: Seq[String] = Seq("id", "accepts_marketing", "created_at",
    "default_address", "email", "first_name", "last_name", "last_order_id",
    "last_order_name", "name", "note", "phone", "total_spent", "verified_email",
    "updated_at")
  val productFields: Seq[String] = Seq("id", "created_at", "product_type",
    "published_at", "status", "title", "updated_at", "variants", "vendor")
  val transactionFields: Seq[String] = Seq("id", "location_id", "order_id",
    "amount", "authorization", "created_at", "currency", "error_code", "gateway",
    "kind", "message", "processed_at", "receipt", "status", "source_name")
  val refundFields: Seq[String] = Seq("id", "note", "refund_line_items",
    "transactions", "created_at", "processed_at")

  /** Inject a page-level order_id into a sub-resource response body
    * (mirrors the reference's `order_id=i` dict injection,
    * `shopify.py:398-409,443-451`).
    */
  def wrapPage(orderId: Long, body: String): String = {
    val t = body.trim
    require(t.startsWith("{"), s"unexpected page body: ${t.take(40)}")
    s"""{"order_id":$orderId,${t.drop(1)}"""
  }

  def shopifyUpdate(spark: SparkSession, store: ShopifyStore, client: ShopifyClient,
                    createdAtMin: Option[String] = None,
                    createdAtMax: Option[String] = None,
                    limit: Int = 250): Unit = {
    import spark.implicits._
    store.init()

    // stage 1: customers
    val customerPages = client.fetchAll("customers.json", customerFields, limit,
      createdAtMin, createdAtMax).toDS()
    store.upsert("customers", Normalize.customers(customerPages))

    // stage 2: products + variants (status filter off — shopify.py:496)
    val productPages = client.fetchAll("products.json", productFields, limit,
      createdAtMin, createdAtMax, filterOnStatus = false).toDS()
    store.upsert("products", Normalize.products(productPages))
    store.upsert("product_variants", Normalize.productVariants(productPages))

    // stage 3: orders + line items + shipping from the same pages
    val orderPages = client.fetchAll("orders.json", orderFields, limit,
      createdAtMin, createdAtMax).toDS().cache()
    store.upsert("orders", Normalize.orders(orderPages))
    store.upsert("line_item_products", Normalize.lineItemProducts(orderPages))
    store.upsert("shipping", Normalize.shipping(orderPages))
    orderPages.unpersist()

    // stage 4: re-read orders from the store, date-bounded (S4 —
    // db.py:81-113). The store's partitioned layout turns the bounds into
    // partition pruning: untouched day partitions are never opened.
    val bounded = store.readBounded("orders", createdAtMin, createdAtMax)

    // stage 5: transactions fan-out — parallel inside executors
    val allIds = bounded.select(col("id")).as[Long]
    val txPages = allIds.mapPartitions { ids =>
      ids.map(id => wrapPage(id, client.fetchOrderResource(id, "transactions", transactionFields)))
    }
    store.upsert("transactions", Normalize.transactions(txPages))

    // stage 6: refunds fan-out for refund-status orders (P6 null-safe
    // contains — shopifydb.py:91-92)
    val refundIds = bounded
      .filter(coalesce(col("financial_status").contains("refund"), lit(false)))
      .select(col("id")).as[Long]
    val refundPages = refundIds.mapPartitions { ids =>
      ids.map(id => wrapPage(id, client.fetchOrderResource(id, "refunds", refundFields)))
    }.cache()
    store.upsert("refunds", Normalize.refunds(refundPages))
    store.upsert("line_item_product_refunds", Normalize.refundLineItems(refundPages))
    refundPages.unpersist()
  }
}
