package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass data profiling — the schema-quality report a pipeline runs
  * before trusting a new 100 TB drop: per column, row count, null count,
  * exact distinct count, and numeric min/max.
  *
  * All columns profile in ONE aggregate over the source: Catalyst plans
  * the N exact `count(DISTINCT col)`s as a single Expand (fan-out N) +
  * two-level aggregate, so the input is scanned once regardless of how
  * many columns are profiled — the alternative (a query per column) scans
  * N times. Min/max/null-count ride the same pass. At petabyte scale the
  * exact distincts are the expensive part (the Expand shuffles each
  * column's values once); swap in `approx_count_distinct` (HLL, one
  * ordinary aggregate, no Expand) when exactness isn't the contract —
  * here it is, because the DuckDB oracle recomputes exactly.
  *
  * Output is long-format — one row per column — so downstream checks
  * (null-ratio gates, cardinality drift alarms) filter rows instead of
  * parsing a wide schema-dependent row.
  */
object Profiling {

  /** Profile `cols` of `df`: (column, n, n_null, n_distinct, min_num,
    * max_num) per column; min/max are null for non-numeric columns.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double")).as(s"__min_$c"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double")).as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__n")
    val row = df.agg(total, aggs: _*)
    // one Expand-style stack to long format: (column, metrics...) per col
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"), col(s"__max_$c").as("max_num"))
    }
    row.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
