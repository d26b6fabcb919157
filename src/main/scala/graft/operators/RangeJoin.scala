package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: points ⨝ intervals where
  * `start <= ts < end` (optionally under an equi-key). Spark plans a raw
  * inequality join as BroadcastNestedLoopJoin — quadratic and
  * driver-bound. This is the bucketed scale form: both sides map to
  * fixed-width time buckets (intervals EXPLODE to every bucket they
  * overlap), the join becomes an equi-join on (key, bucket), and the
  * residual `start <= ts < end` predicate filters inside the matched
  * bucket. Work is proportional to true matches plus bucket co-residents,
  * never |points|×|intervals|; replication is ⌈len/bucket⌉ per interval,
  * so pick `bucketMs` near the typical interval length.
  */
object RangeJoin {

  private def bucketOf(ts: Column, bucketMs: Long): Column =
    floor(unix_micros(ts) / lit(bucketMs * 1000L))

  /** Inner point-in-interval join. `points` keeps all its columns;
    * interval columns `startCol`/`endCol` and `payload` come along.
    * `keyCols` may be empty for an un-keyed (global) range join.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], tsCol: String,
                      startCol: String, endCol: String,
                      payload: Seq[String], bucketMs: Long): DataFrame = {
    val p = points.withColumn("__b", bucketOf(col(tsCol), bucketMs))
    val iv = intervals.withColumn("__b",
      explode(sequence(bucketOf(col(startCol), bucketMs),
        // end is exclusive: a bucket-aligned end does not reach its bucket
        bucketOf(col(endCol) - expr("INTERVAL 1 MICROSECOND"), bucketMs))))
      .select((keyCols ++ Seq(startCol, endCol) ++ payload).map(col) :+ col("__b"): _*)
    p.join(iv, keyCols :+ "__b")
      .filter(col(startCol) <= col(tsCol) && col(tsCol) < col(endCol))
      .drop("__b")
  }
}
