package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.MisraGries

/** Exact heavy hitters (top-k most frequent values) at sketch cost — the
  * corpus-frequency primitive of a training-data pipeline (frequent
  * tokens / n-grams / URLs / fingerprints).
  *
  * The naive plan shuffles the full corpus on the value key
  * (`groupBy(value).count`). Here a single [[MisraGries]] pass produces a
  * ≤capacity candidate set with the survivor guarantee (every value with
  * true count > n/(capacity+1) is present); only candidates are then
  * exactly counted — a map-side broadcast semi-join filter, so the corpus
  * rows that shuffle are just the candidate hits.
  *
  * The result is EXACT and SELF-CERTIFYING: the k-th exact candidate
  * count must exceed n/(capacity+1) — anything the sketch could have
  * dropped has true count ≤ that bound, so no non-candidate can belong
  * in the top k. If the margin fails (capacity too small for this
  * distribution) the operator throws rather than silently returning a
  * plausible-but-uncertifiable ranking.
  */
object HeavyHitters {

  /** Exact top-k of `value` by frequency (ties broken by value asc).
    * Columns: (item, count).
    */
  def topK(df: DataFrame, value: Column, k: Int, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    MisraGries.register(spark)
    val src = df.select(value.as("item"))
    // one sketch pass yields BOTH the candidate set and n (the count
    // rides the same aggregation — a third full pass over the corpus
    // just to count rows would double the scan cost at scale): partial
    // sketches map-side, merged per Agarwal et al.; the driver receives
    // <= capacity (item, lowerCount) pairs
    val sketchRow = src.agg(MisraGries.sketch(col("item"), capacity).as("s"),
      count(lit(1)).as("n")).head()
    val candidates = sketchRow.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)).toArray
    val n = sketchRow.getLong(1)
    val bound = n / (capacity + 1L)
    // exact confirm: broadcast the candidate list as a semi-join filter —
    // only candidate hits reach the count shuffle
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(candidates.map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val exact = src.join(broadcast(candDf), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("item").asc)
      .limit(k)
    val rows = exact.collect() // <= k rows; reused as the result below
    val kth = rows.lastOption.map(_.getLong(1)).getOrElse(0L)
    require(kth > bound,
      s"heavy-hitters exactness not certifiable: k-th count $kth <= " +
        s"sketch error bound $bound (n=$n, capacity=$capacity) — raise capacity")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), exact.schema)
  }
}
