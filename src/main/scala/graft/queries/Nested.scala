package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Semi-structured / nested-data inventory (SURVEY.md §2.9 N1–N8) over the
  * JSON-bearing `events.props` column and array-shaped token data derived
  * from `documents.text`.
  */
object Nested {

  /** N1/N7 (`shopify.py:230,283`, deep paths `shopify.py:312`): JSON field
    * extraction + typed cast, then a grouped rollup. `get_json_object` is a
    * codegen'd built-in; with a fixed schema `from_json` + dot-paths is the
    * bulk-ingest shape (used in graft.ingest.Normalize).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"),
        (sum($"k").cast("double") / count(lit(1))).as("avg_k"))
      .orderBy($"event_type")
  }

  val jsonExtractSql: String =
    """SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n,
      | CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
      |FROM (SELECT event_type, CAST(props->>'k' AS INTEGER) AS k FROM events) t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** N2–N4 (`shopify.py:303-315,338-354,512-513`): array explosion to rows
    * with the parent key carried alongside, then per-(parent,element)
    * aggregation. Scale: explode is pipelined (no shuffle); the groupBy is
    * the only exchange.
    */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"doc_id", $"token")
  }

  val explodeTokensSql: String =
    """SELECT doc_id, t.token AS token, COUNT(*) AS cnt
      |FROM documents, unnest(string_split(text, ' ')) AS t(token)
      |GROUP BY doc_id, t.token
      |ORDER BY doc_id, token""".stripMargin

  /** N6/N8 (`shopify.py:309-313,448`): first/last-element-or-default and
    * array length — `element_at` yields null out-of-bounds, mirroring the
    * reference's `tax_lines[0] or default` pattern.
    */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .withColumn("toks", split($"text", " "))
      .select(
        $"doc_id",
        coalesce(element_at($"toks", 1), lit("<empty>")).as("first_token"),
        element_at($"toks", -1).as("last_token"),
        size($"toks").cast("long").as("n_tokens"),
        array_contains($"toks", "spark").as("mentions_spark"))
      .orderBy($"doc_id")
  }

  val arrayOpsSql: String =
    """SELECT doc_id,
      | COALESCE(string_split(text, ' ')[1], '<empty>') AS first_token,
      | string_split(text, ' ')[-1] AS last_token,
      | len(string_split(text, ' ')) AS n_tokens,
      | list_contains(string_split(text, ' '), 'spark') AS mentions_spark
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q159: MAP-typed columns + higher-order map functions — the §2.9
    * family the array queries don't touch. Per customer, two maps are
    * built from real aggregates (`map_from_entries(collect_list(...))`
    * over status→count and status→cents), combined with `map_zip_with`,
    * thresholded with `map_filter`, reshaped with `transform_values`,
    * and EXPLODED BACK to sorted rows before leaving the query — map
    * iteration order is engine-private, so maps are internal plumbing
    * here, never an output column the hash-compare could see. The
    * sorted `collect_list` input makes construction deterministic too.
    * The oracle reproduces the post-explode relational semantics
    * directly (statuses with ≥ 2 orders, average cents per order).
    */
  def mapFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val maps = per
      .groupBy($"o_custkey")
      .agg(
        map_from_entries(sort_array(collect_list(struct($"o_orderstatus", $"n"))))
          .as("m_n"),
        map_from_entries(sort_array(collect_list(struct($"o_orderstatus", $"cents"))))
          .as("m_cents"))
      .select($"o_custkey",
        expr("""map_filter(
                  map_zip_with(m_n, m_cents, (k, n, c) -> struct(n AS n, c AS cents)),
                  (k, v) -> v.n >= 2)""").as("combined"))
      .select($"o_custkey",
        expr("transform_values(combined, (k, v) -> struct(v.n AS n, v.cents AS cents, v.cents DIV v.n AS cents_per_order))")
          .as("m"))
    maps.select($"o_custkey", explode($"m").as(Seq("status", "v")))
      .select($"o_custkey", $"status", $"v.n".as("n"), $"v.cents".as("cents"),
        $"v.cents_per_order".as("cents_per_order"))
      .orderBy($"o_custkey", $"status")
  }

  val mapFunctionsSql: String =
    """SELECT o_custkey, o_orderstatus AS status,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    // CAST(COUNT(*) AS BIGINT) AS cents_per_order
      |FROM orders
      |GROUP BY o_custkey, o_orderstatus
      |HAVING COUNT(*) >= 2
      |ORDER BY o_custkey, status""".stripMargin

  /** q193: the Spark 4 VARIANT tier — semi-structured data held as the
    * binary variant encoding instead of strings, the open-format answer to
    * schemaless ingest at scale. `parse_json` builds the variant ONCE per
    * row; typed projections come out of `variant_get` with path + target
    * type (shredded access, no re-parse per field, unlike repeated
    * `get_json_object` calls), `try_variant_get` demonstrates the
    * non-throwing path for absent keys. Row-level extraction is graded
    * (not just an aggregate): every surviving (event_id, typed k, string
    * k, missing-key null) must match the oracle's JSON operators.
    */
  def variantExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_id", $"event_type", parse_json($"props").as("v"))
      .select($"event_id", $"event_type",
        expr("variant_get(v, '$.k', 'int')").as("k_int"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("try_variant_get(v, '$.missing', 'int')").as("k_absent"))
      .filter($"k_int" >= 90)
      .orderBy($"event_id")
  }

  val variantExtractSql: String =
    """SELECT event_id, event_type,
      |  CAST(props->>'k' AS INTEGER) AS k_int,
      |  props->>'k' AS k_str,
      |  CAST(NULL AS INTEGER) AS k_absent
      |FROM events
      |WHERE CAST(props->>'k' AS INTEGER) >= 90
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_json_extract"   -> jsonExtract,
    "q23_explode_tokens" -> explodeTokens,
    "q24_array_ops"      -> arrayOps,
    "q159_map_functions" -> mapFunctions,
    "q193_variant_extract" -> variantExtract,
  )

  val oracles: Map[String, String] = Map(
    "q22_json_extract"   -> jsonExtractSql,
    "q23_explode_tokens" -> explodeTokensSql,
    "q24_array_ops"      -> arrayOpsSql,
    "q159_map_functions" -> mapFunctionsSql,
    "q193_variant_extract" -> variantExtractSql,
  )
}
