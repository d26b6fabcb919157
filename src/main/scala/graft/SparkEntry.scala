package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Aggregates, CorpusOps, EventOps, GraphOps, InvoicePipeline, MediaOps, MergeOps, Nested, PipelineOps, Ranking, Relational, Scalar, ScaleOps, TextOps, VectorOps}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    InvoicePipeline.invoicePipeline(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalar.queries ++ Ranking.queries ++
      Aggregates.queries ++ Nested.queries ++ MergeOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ InvoicePipeline.queries ++
      EventOps.queries ++ ScaleOps.queries ++ PipelineOps.queries ++
      CorpusOps.queries ++ GraphOps.queries ++ MediaOps.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Scalar.oracles ++ Ranking.oracles ++
      Aggregates.oracles ++ Nested.oracles ++ MergeOps.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ InvoicePipeline.oracles ++
      EventOps.oracles ++ ScaleOps.oracles ++ PipelineOps.oracles ++
      CorpusOps.oracles ++ GraphOps.oracles ++ MediaOps.oracles
}
