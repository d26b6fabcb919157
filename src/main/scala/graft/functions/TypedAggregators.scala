package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed-`Aggregator` API tier (`org.apache.spark.sql.expressions
  * .Aggregator` over `Dataset[T]` / `groupByKey(...).agg(agg.toColumn)`) —
  * the one public custom-aggregation surface the engine didn't yet
  * exercise (alongside `TypedImperativeAggregate` for KMV/CMS/HLL/
  * Misra-Gries and plain `functions._`). Catalyst plans it as a
  * SortAggregate/ObjectHashAggregate with a typed reduce — partial
  * aggregation still happens map-side, so the shape is the same
  * one-shuffle hash agg at 100 TB.
  *
  * Semantics are deliberately monoidal (count / exact integer sum /
  * max-by-epoch): commutative + associative, so the result is
  * partition-order-independent and DuckDB-oracle-able.
  */
object TypedAggregators {

  /** One lineitem row, typed. Quantities in TPC-H are integral doubles —
    * `qtyUnits` carries them as exact longs.
    */
  case class LineRow(l_suppkey: Long, l_quantity: Double,
                     l_shipdate: java.sql.Timestamp)

  case class SupplierBuf(nLines: Long, qtyUnits: Long, maxShipMicros: Long)

  case class SupplierOut(n_lines: Long, sum_qty: Long, max_ship_micros: Long)

  /** Per-supplier line stats: count, exact unit sum, latest ship instant. */
  object SupplierStats extends Aggregator[LineRow, SupplierBuf, SupplierOut] {
    override def zero: SupplierBuf = SupplierBuf(0L, 0L, Long.MinValue)
    override def reduce(b: SupplierBuf, r: LineRow): SupplierBuf = {
      val micros = r.l_shipdate.getTime * 1000L +
        (r.l_shipdate.getNanos / 1000L) % 1000L
      SupplierBuf(b.nLines + 1L, b.qtyUnits + r.l_quantity.toLong,
        math.max(b.maxShipMicros, micros))
    }
    override def merge(a: SupplierBuf, b: SupplierBuf): SupplierBuf =
      SupplierBuf(a.nLines + b.nLines, a.qtyUnits + b.qtyUnits,
        math.max(a.maxShipMicros, b.maxShipMicros))
    override def finish(b: SupplierBuf): SupplierOut =
      SupplierOut(b.nLines, b.qtyUnits, b.maxShipMicros)
    override def bufferEncoder: Encoder[SupplierBuf] = Encoders.product[SupplierBuf]
    override def outputEncoder: Encoder[SupplierOut] = Encoders.product[SupplierOut]
  }
}
