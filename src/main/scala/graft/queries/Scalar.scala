package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Scalar-function inventory (SURVEY.md §2.8) + predicate inventory
  * (§2.2 P4–P11) over the synthetic tables. All expressions are Spark
  * built-ins (whole-stage-codegen'd) — no UDFs, per SURVEY §2.14.
  */
object Scalar {

  /** F1–F12 kitchen sink over `orders` (reference cites in Scaladoc per
    * column): every scalar stays inside codegen; the scan prunes to the 4
    * columns used (verified via ReadSchema in explain).
    */
  def scalarKitchen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir).select(
      $"o_orderkey",
      // F1 (`setup.sql:220`): CAST(RIGHT(CAST(id AS CHAR(12)),9) AS INT)
      trim(substring(format_string("%12d", $"o_orderkey"), -9, 9)).cast("int").as("short_id"),
      // F2 (`setup.sql:258`): null-propagating concat
      concat($"o_orderstatus", lit(" - "), $"o_orderpriority").as("status_label"),
      // F3 (`setup.sql:258`): NULLIF
      nullif($"o_orderstatus", lit("P")).as("status_nullif"),
      // F4 (`setup.sql:295`): COALESCE over the NULLIF
      coalesce(nullif($"o_orderstatus", lit("P")), lit("PENDING")).as("status_coalesce"),
      // F5 (`setup.sql:199-204`): CASE WHEN bucketing
      when($"o_totalprice" > 200000.0, "big")
        .when($"o_totalprice" > 100000.0, "mid")
        .otherwise("small").as("bucket"),
      // F6 (`setup.sql:301`): exact-decimal money rounding
      round($"o_totalprice".cast(MoneyDec), 2).cast("double").as("price_2dp"),
      // F7 (`setup.sql:232`): DATE(ts)
      $"o_orderdate".cast("date").as("order_date"),
      // F9 (`setup.sql:226`): sign flip (IEEE-exact)
      (-$"o_totalprice").as("neg_price"),
      // F10 (`setup.sql:229`): typed NULL literal + constant columns
      lit(null).cast("string").as("null_note"),
      lit(3).as("vat_code"),
      // F11 (`tripletex.py:71-72`): '#1234' → 1234
      substring(concat(lit("#"), $"o_orderkey".cast("string")), 2, 18).cast("long").as("parsed_no"),
      // F12 (`tripletex.py:115`): abs
      abs($"o_totalprice" - lit(150000.0)).as("abs_diff"),
    ).orderBy($"o_orderkey")
  }

  val scalarKitchenSql: String =
    """SELECT o_orderkey,
      | CAST(TRIM(RIGHT(LPAD(CAST(o_orderkey AS VARCHAR), 12, ' '), 9)) AS INTEGER) AS short_id,
      | o_orderstatus || ' - ' || o_orderpriority AS status_label,
      | NULLIF(o_orderstatus, 'P') AS status_nullif,
      | COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_coalesce,
      | CASE WHEN o_totalprice > 200000.0 THEN 'big'
      |      WHEN o_totalprice > 100000.0 THEN 'mid'
      |      ELSE 'small' END AS bucket,
      | CAST(ROUND(CAST(o_totalprice AS DECIMAL(38,6)), 2) AS DOUBLE) AS price_2dp,
      | CAST(o_orderdate AS DATE) AS order_date,
      | -o_totalprice AS neg_price,
      | CAST(NULL AS VARCHAR) AS null_note,
      | 3 AS vat_code,
      | CAST(SUBSTRING('#' || CAST(o_orderkey AS VARCHAR), 2, 18) AS BIGINT) AS parsed_no,
      | ABS(o_totalprice - 150000.0) AS abs_diff
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** F15 + P5 (`tripletex.py:194-201,151`): map-driven value rename with
    * fallback, and null-safe negated membership. The rename map becomes a
    * when-chain (codegen-friendly; a broadcast-join lookup table would be
    * the shape at high map cardinality).
    */
  def mapReplace(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val renames = Seq("click" -> "CLICK_EVT", "view" -> "VIEW_EVT", "purchase" -> "BUY_EVT")
    val renamed = renames.foldLeft(lit(null).cast("string")) { case (acc, (from, to)) =>
      when($"event_type" === from, to).otherwise(acc)
    }
    events(spark, dir)
      // P5: pandas ~isin keeps NULL rows → null-safe NOT coalesce(isin,false)
      .filter(!coalesce($"event_type".isin("error"), lit(false)))
      .select(
        $"event_id",
        coalesce(renamed, $"event_type").as("event_type_renamed"),
        $"user_id")
      .orderBy($"event_id")
  }

  val mapReplaceSql: String =
    """SELECT event_id,
      | COALESCE(CASE WHEN event_type = 'purchase' THEN 'BUY_EVT'
      |               WHEN event_type = 'view' THEN 'VIEW_EVT'
      |               WHEN event_type = 'click' THEN 'CLICK_EVT' END,
      |          event_type) AS event_type_renamed,
      | user_id
      |FROM events
      |WHERE NOT COALESCE(event_type IN ('error'), FALSE)
      |ORDER BY event_id""".stripMargin

  /** P6/P7 (`shopifydb.py:91-92`, `db.py:561`): substring and
    * case-insensitive pattern predicates — both push down to the scan as
    * string filters; the reference's SQL-injection-prone interpolation is
    * structurally impossible here (parameters are Column values).
    */
  def textPredicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    part(spark, dir)
      .filter(coalesce($"p_name".contains("red"), lit(false)) ||
              $"p_type".ilike("%econ%"))
      .select($"p_partkey", $"p_name", $"p_type")
      .orderBy($"p_partkey")
  }

  val textPredicatesSql: String =
    """SELECT p_partkey, p_name, p_type
      |FROM part
      |WHERE COALESCE(p_name LIKE '%red%', FALSE) OR p_type ILIKE '%econ%'
      |ORDER BY p_partkey""".stripMargin

  /** P8–P11 (`tripletex.py:36,51-54,71,118-119`, `utils.py:14`): null
    * audits, sign predicates, empty-string→null normalization, and the 1%
    * tolerance reconciliation predicate, expressed over `events.value`.
    */
  def predicateSuite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).select(
      $"event_id",
      $"value",
      // P10: '' → null normalization (props never empty here; demo on type)
      when($"event_type" === "", lit(null).cast("string")).otherwise($"event_type").as("etype_norm"),
      // P9: sign predicate
      ($"value" >= 0).as("non_negative"),
      // P8: null-ness audit bit
      $"props".isNull.as("props_missing"),
      // P11: 1% tolerance check of value against its rounded self
      (abs($"value" - round($"value".cast(MoneyDec), 0).cast("double")) >
        abs($"value") * 0.01).as("deviates_1pct"),
    ).orderBy($"event_id")
  }

  val predicateSuiteSql: String =
    """SELECT event_id, value,
      | CASE WHEN event_type = '' THEN NULL ELSE event_type END AS etype_norm,
      | value >= 0 AS non_negative,
      | props IS NULL AS props_missing,
      | ABS(value - CAST(ROUND(CAST(value AS DECIMAL(38,6)), 0) AS DOUBLE)) > ABS(value) * 0.01 AS deviates_1pct
      |FROM events
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q07_scalar_kitchen"  -> scalarKitchen,
    "q08_map_replace"     -> mapReplace,
    "q09_text_predicates" -> textPredicates,
    "q10_predicate_suite" -> predicateSuite,
  )

  val oracles: Map[String, String] = Map(
    "q07_scalar_kitchen"  -> scalarKitchenSql,
    "q08_map_replace"     -> mapReplaceSql,
    "q09_text_predicates" -> textPredicatesSql,
    "q10_predicate_suite" -> predicateSuiteSql,
  )
}
