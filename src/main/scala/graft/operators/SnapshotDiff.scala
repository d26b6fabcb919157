package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — recover the change feed BETWEEN two table versions by
  * comparison, for the case where no changelog was recorded at write time
  * (the complement of [[graft.store.TableStore.upsertWithChangelog]],
  * which captures the feed as the write happens).
  *
  * One full-outer sort-merge join on the key: a key only in the new
  * snapshot is an `insert`, only in the old a `delete`, in both with any
  * non-key column changed an `update` (null-safe struct compare, so
  * null→value and value→null transitions count as changes and null→null
  * does not). Unchanged keys — the overwhelming bulk at 100 TB — produce
  * no output row.
  *
  * Scale: both sides shuffle once on the key and stream through the
  * merge; nothing is broadcast or collected, so the diff is bounded by
  * the two snapshot scans. A manifest-tracking format would prune
  * unchanged FILES before ever scanning them; given parquet-directory
  * snapshots ([[graft.store.VersionedTable]]), the full scan is the
  * honest cost and the join is the right shape for it.
  */
object SnapshotDiff {

  /** Per-key change row (`keys…, action ∈ insert|update|delete`) turning
    * `oldSnap` into `newSnap`. Schemas must match; with no non-key
    * columns, presence alone is compared (updates cannot occur).
    *
    * `carryValues` lists non-key columns to carry through as
    * `old_<c>` / `new_<c>` pairs (null on the absent side of an
    * insert/delete) — the before/after images a downstream consumer
    * (e.g. [[IncrementalAgg.maintainCdc]]) needs to apply the change.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
           carryValues: Seq[String] = Nil): DataFrame = {
    val nonKey = newSnap.columns.filterNot(keys.contains).toSeq
    require(oldSnap.columns.filterNot(keys.contains).toSeq == nonKey,
      s"snapshot schemas must match: ${oldSnap.columns.toSeq} vs ${newSnap.columns.toSeq}")
    require(carryValues.forall(nonKey.contains),
      s"carryValues must be non-key columns: $carryValues vs $nonKey")
    val payload: Seq[Column] = if (nonKey.isEmpty) Seq(lit(1)) else nonKey.map(col)
    val o = oldSnap.select(keys.map(col) :+ struct(payload: _*).as("__old"): _*)
    val n = newSnap.select(keys.map(col) :+ struct(payload: _*).as("__new"): _*)
    val carried = carryValues.flatMap(c => Seq(
      col("__old").getField(c).as(s"old_$c"),
      col("__new").getField(c).as(s"new_$c")))
    o.join(n, keys, "full_outer")
      .withColumn("action",
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .when(!(col("__old") <=> col("__new")), lit("update")))
      .filter(col("action").isNotNull)
      .select(keys.map(col) ++ (col("action") +: carried): _*)
  }
}
