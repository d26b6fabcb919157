package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, the single most recent
  * right row with `right.ts <= left.ts` under the same key — the operator
  * behind feature-store lookups and slowly-changing-dimension reads.
  *
  * Spark has no native as-of join; the naive encoding is a range join
  * (quadratic per key, then a rank to keep the latest match). This is the
  * scale form: UNION both sides tagged, ONE shuffle on the key, and a
  * running `last(..., ignoreNulls)` window carries each right payload
  * forward to the left rows that follow it in (ts, side) order —
  * O(n log n) per partition, no pair blowup; skew is bounded by the
  * heaviest key, same as any keyed window.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal ts, so an
  * equal-timestamp right row is visible to the left row (`<=`, matching
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`). The right side must be
  * unique per (key, ts); pre-aggregate upstream when it isn't.
  */
object AsofJoin {

  /** Left outer as-of join. Output: all left columns plus `rightCols`
    * (null where no right row precedes the left row). `rightCols` must
    * not collide with left column names.
    *
    * The right payload travels as ONE struct column: a right row
    * contributes a non-null struct even when every payload FIELD is null,
    * so the carry-forward always adopts the latest right ROW atomically —
    * per-column `last(ignoreNulls)` would resurrect an older row's value
    * for a field the newest row holds as null (a cross-row mix DuckDB's
    * ASOF JOIN would never produce).
    */
  def asofLeft(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    require(rightCols.intersect(left.columns.toSeq).isEmpty,
      s"right columns ${rightCols.intersect(left.columns.toSeq)} collide with left")
    val common = keyCols.map(col) :+ col(tsCol)
    val payloadStruct = struct(rightCols.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(rightCols.map(c => right.schema(c))))
    val l = left.select(common ++ leftPayload.map(col) :+
      nullStruct.as("__r") :+ lit(1).as("__side"): _*)
    val r = right.select(common ++
      leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      payloadStruct.as("__r") :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        rightCols.map(c => col("__r").getField(c).as(c)): _*)
  }
}
