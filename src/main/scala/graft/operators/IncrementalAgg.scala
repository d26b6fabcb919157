package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view half of the
  * CDC story: a per-key (count, sum) aggregate table is kept current by
  * folding in change batches WITHOUT rescanning raw history.
  *
  * Append-only deltas need only the commutative-monoid structure of
  * (count, sum): aggregate the delta, union with the existing state rows
  * (which ARE partial aggregates), re-aggregate by key ([[maintain]]).
  * Updates and deletes need the stronger abelian GROUP structure — every
  * change contributes its new image minus its old image, so the state
  * moves by differences ([[maintainCdc]]). Either way the shuffle carries
  * `|state| + |change-keys|` rows; the raw history — the 100 TB part —
  * is never touched again. Sums ride exact decimals, so folding is
  * bit-identical to recomputing from scratch (decimal addition is
  * associative and invertible; a double fold would drift with grouping
  * order).
  *
  * State schema: (keys…, n = row count, nv = non-null value count,
  * total = exact decimal sum, NULL iff nv = 0 — standard SQL sum
  * semantics, which `nv` lets the subtractive path reproduce exactly).
  */
object IncrementalAgg {

  /** Aggregate raw rows into maintenance state: one (keys, n, nv, total)
    * row per key, `total` an exact decimal sum of `valueCol`.
    */
  def state(raw: DataFrame, keys: Seq[String], valueCol: String,
            dec: String = "decimal(38,6)"): DataFrame =
    raw.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), count(col(valueCol)).as("nv"),
        sum(col(valueCol).cast(dec)).as("total"))

  /** Fold a raw APPEND-ONLY delta batch into existing state. Output
    * schema matches [[state]]; equals `state(history ∪ delta)` exactly.
    */
  def maintain(prev: DataFrame, deltaRaw: DataFrame, keys: Seq[String],
               valueCol: String, dec: String = "decimal(38,6)"): DataFrame =
    prev.unionByName(state(deltaRaw, keys, valueCol, dec))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nv")).as("nv"),
        sum(col("total")).as("total"))

  /** Fold a FULL change feed — inserts, updates, AND deletes — into
    * existing state. `changes` is [[SnapshotDiff.diff]] output over the
    * ROW-key with `carryValues` covering the aggregate `keys` and
    * `valueCol` (so it has `action, old_<c>, new_<c>` columns). The
    * aggregate keys are independent of the row key: an update that moves
    * a row between groups retracts the old image from its group and adds
    * the new image to its group (two signed contributions per change;
    * same-group updates net out in the fold). Fully-emptied keys (n = 0)
    * leave the state — exactly what recomputation would show.
    *
    * Equals `state(newSnapshot)` exactly, including SQL's
    * sum-of-no-non-null-values-is-NULL edge (tracked via `nv`).
    */
  def maintainCdc(prev: DataFrame, changes: DataFrame, keys: Seq[String],
                  valueCol: String, dec: String = "decimal(38,6)"): DataFrame = {
    val zero = lit(0).cast(dec)
    def img(side: String, sign: Int): DataFrame = {
      val v = col(s"${side}_$valueCol").cast(dec)
      val picked = keys.map(k => col(s"${side}_$k").as(k)) ++ Seq(
        lit(sign.toLong).as("n"),
        when(v.isNotNull, sign.toLong).otherwise(0L).as("nv"),
        (if (sign > 0) coalesce(v, zero) else -coalesce(v, zero)).as("total"))
      changes.filter(col("action") =!= (if (side == "old") "insert" else "delete"))
        .select(picked: _*)
    }
    val contrib = img("old", -1).unionByName(img("new", 1))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nv")).as("nv"),
        sum(col("total")).as("total"))
    prev.unionByName(contrib)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nv")).as("nv"),
        // prev.total is NULL when prev.nv = 0; coalesce so subtraction
        // arithmetic can't null out a key, then restore SQL sum semantics
        // (NULL iff no non-null values remain) from the folded nv
        sum(coalesce(col("total"), zero)).as("t_raw"))
      .withColumn("total", when(col("nv") > 0, col("t_raw")).otherwise(lit(null).cast(dec)))
      .filter(col("n") > 0)
      .select((keys.map(col) ++ Seq(col("n"), col("nv"), col("total"))): _*)
  }
}
