package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view half of the
  * CDC story: a per-key (count, sum) aggregate table is kept current by
  * folding in each new delta batch WITHOUT rescanning raw history.
  *
  * Self-maintainable aggregates (count, sum — and anything derivable
  * from them: mean, totals) form a commutative monoid, so maintenance is
  * just: aggregate the delta, union with the existing state rows (which
  * ARE partial aggregates), and re-aggregate by key. One shuffle of
  * `|state| + |delta-keys|` rows; the raw history — the 100 TB part —
  * is never touched again. Sums ride exact decimals, so folding a delta
  * in is bit-identical to recomputing from scratch (decimal addition is
  * associative; a double fold would drift with grouping order).
  */
object IncrementalAgg {

  /** Aggregate raw rows into maintenance state: one (keys, n, total) row
    * per key, `total` an exact decimal sum of `valueCol`.
    */
  def state(raw: DataFrame, keys: Seq[String], valueCol: String,
            dec: String = "decimal(38,6)"): DataFrame =
    raw.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast(dec)).as("total"))

  /** Fold a raw delta batch into existing state. Output schema matches
    * [[state]]; equals `state(history ∪ delta)` exactly.
    */
  def maintain(prev: DataFrame, deltaRaw: DataFrame, keys: Seq[String],
               valueCol: String, dec: String = "decimal(38,6)"): DataFrame =
    prev.unionByName(state(deltaRaw, keys, valueCol, dec))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
}
