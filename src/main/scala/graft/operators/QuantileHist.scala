package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-pass equi-width histogram quantile sketch.
  *
  * The exact quantile of a 100 TB column needs a global sort (or the
  * two-phase `CorpusOps.globalRank`); this sketch answers EVERY quantile
  * at once from one map-side-combined groupBy whose state is one
  * (bin, count) row per occupied bin — bounded by value-range/width,
  * independent of row count, and mergeable across partitions, batches,
  * and days by plain addition. The answer is the selected bin's lower
  * edge, so the error is ≤ `width` by construction: the true order
  * statistic provably lands inside the first bin whose cumulative count
  * reaches the rank (binning is monotone in the value).
  */
object QuantileHist {

  /** The mergeable state: (bin, cnt) with bin = floor(value / width). */
  def sketch(df: DataFrame, valueCol: String, width: Double): DataFrame =
    df.select(floor(col(valueCol) / width).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** For each requested rank — `ranks` carries label column(s) plus a
    * long `rk` — the lower edge of the first bin whose cumulative count
    * reaches rk. The running sum windows over BINS (range/width rows,
    * not data rows): bounded but single-partition, acceptable at sketch
    * cardinality; switch to `CorpusOps.globalCumsum` if a width is ever
    * chosen fine enough for bins to rival data.
    */
  def quantileLo(hist: DataFrame, width: Double, ranks: DataFrame): DataFrame = {
    val cum = hist.withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bin"))))
    broadcast(ranks).join(cum, col("cum") >= col("rk"))
      .groupBy(ranks.columns.map(col).toSeq: _*)
      .agg(min(col("bin")).as("abin"))
      .withColumn("approx_lo", col("abin").cast("double") * width)
  }
}
