package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas
import graft.ingest.Normalize

/** The parquet-backed equivalent of the reference's Postgres database: 9+1
  * tables under one directory, with per-table upsert key / partial
  * update-column metadata (SURVEY §2.12) and idempotent DDL bootstrap (S9 —
  * `/root/reference/setup.sql`, `dbsetup.sh`).
  */
final class ShopifyStore(spark: SparkSession, dir: String) {

  def path(table: String): String = s"$dir/$table"

  /** S9: create any missing table as an empty parquet dir with the exact
    * declared schema — idempotent, like `CREATE TABLE IF NOT EXISTS`.
    */
  def init(): Unit =
    Schemas.tables.foreach { t =>
      if (!TableStore.exists(spark, path(t.name)))
        TableStore.atomicWrite(spark, Normalize.emptyTable(spark, t.schema), path(t.name))
    }

  def read(table: String): DataFrame = {
    val meta = Schemas.byName(table)
    if (!TableStore.exists(spark, path(table)))
      Normalize.emptyTable(spark, meta.schema)
    else TableStore.read(spark, path(table))
  }

  /** S5: batch upsert honoring the table's key + partial update columns. */
  def upsert(table: String, incoming: DataFrame): Unit = {
    val meta = Schemas.byName(table)
    val conformed = Normalize.conform(incoming, meta.schema)
    val deduped = TableStore.dedupeByKey(conformed, meta.keys, meta.keys.head)
    if (!TableStore.exists(spark, path(table)))
      TableStore.atomicWrite(spark, deduped, path(table))
    else
      TableStore.upsert(spark, path(table), deduped, meta.keys, meta.updateColumns)
  }

  /** The invoice view over the current store state. */
  def invoiceTables: graft.queries.InvoiceView.Tables =
    graft.queries.InvoiceView.Tables(
      customers = read("customers"),
      orders = read("orders"),
      transactions = read("transactions"),
      lineItemProducts = read("line_item_products"),
      shipping = read("shipping"),
      refunds = read("refunds"),
      lineItemProductRefunds = read("line_item_product_refunds"))
}
