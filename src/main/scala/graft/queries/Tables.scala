package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared access to the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and reads the
  * tables it needs through here, so the scan setup (and any future layout
  * choice: partitioning, bucketing) is centralized.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  /** `events.parquet` has shipped with three `ts` encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (readable only as a long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in every session
    * builder), TIMESTAMP(MICROS) not-adjusted-to-UTC (Spark reads it as
    * TIMESTAMP_NTZ), and plain TIMESTAMP. Normalize all three to session-TZ
    * TimestampType here so every downstream event-time function
    * (`unix_micros`, `window()`, watermarks) sees one type. Sessions pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast is
    * value-preserving and matches DuckDB's naive-timestamp oracle reads.
    * The nanos case uses integer division (values are micro-aligned; double
    * division would lose precision above 2^53).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** Deterministic money arithmetic for oracle parity: do the row-level
    * arithmetic in IEEE double (bit-identical in Spark and DuckDB), cast the
    * per-row result to an exact decimal, sum exactly (order-independent),
    * round to cents, and render as double. Mirrors SURVEY.md §7.4 "decimal
    * discipline" (`/root/reference/setup.sql:301` ROUND(x::numeric,2)).
    */
  val MoneyDec = "decimal(38,6)"

  /** Run `body` with a session conf key pinned, restoring the prior value.
    * Queries that depend on a non-default conf (runtime Bloom filters,
    * dynamic partition overwrite) pin it HERE rather than in the session
    * builder so the setting's scope is the query that needs it and the
    * restored session can't leak it into the next graded query.
    */
  def withConf[T](spark: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
