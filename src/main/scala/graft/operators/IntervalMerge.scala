package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed coalescing of overlapping intervals — the span-consolidation
  * primitive behind speech/video segment merging, user-activity span
  * building, and compaction planning over time-ranged files.
  *
  * Intervals are CLOSED on both ends: a pair that merely touches
  * (`next.start == prev.end`) merges. The classic sweep is expressed as
  * two windows over one partitioning: a running max of all PRIOR interval
  * ends detects span breaks (`start > cummax` ⇒ a gap), and a running sum
  * of break flags numbers the spans. Both windows AND the final group-by
  * cluster on the key columns, so Catalyst plans exactly ONE hash
  * exchange on the keys (HashPartitioning(keys) satisfies the group-by's
  * ClusteredDistribution(keys :+ span), since equal grouping tuples share
  * a key) — at 100 TB the operator costs one shuffle of the interval
  * columns, with per-key work linear after the in-partition sort.
  *
  * Tied (start, end) pairs are order-insensitive: whichever sorts first,
  * the cummax covers the other's start, so both land in the same span and
  * every later row sees the same running state — no tiebreak column is
  * needed for a deterministic RESULT, only for a deterministic trace.
  */
object IntervalMerge {

  /** Merge overlapping `[startCol, endCol]` intervals per `keys` group.
    * Returns one row per merged span: keys, `span_start`, `span_end`,
    * `n_merged` (source-interval count).
    */
  def merge(df: DataFrame, keys: Seq[String], startCol: Column, endCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(startCol.asc, endCol.asc)
    val priorMax = max(endCol).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isBreak = when(priorMax.isNull || startCol > priorMax, 1L).otherwise(0L)
    df.withColumn("__span", sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keyCols :+ col("__span"): _*)
      .agg(min(startCol).as("span_start"), max(endCol).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__span")
  }
}
