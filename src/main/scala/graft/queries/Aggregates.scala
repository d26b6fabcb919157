package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Aggregation inventory (SURVEY.md §2.4 A1–A9). */
object Aggregates {

  /** A1 (`db.py:466`): distinct composite pairs via groupBy-no-aggs. */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select($"o_custkey", $"o_orderstatus").distinct()
      .orderBy($"o_custkey", $"o_orderstatus")
  }

  val distinctPairsSql: String =
    """SELECT DISTINCT o_custkey, o_orderstatus FROM orders
      |ORDER BY o_custkey, o_orderstatus""".stripMargin

  /** A2/A3 (`tripletex.py:111-114,152-155`): deterministic first-row-per-
    * group — the reference's pandas `first`/`groupby().first()` with the
    * frame-order nondeterminism replaced by an explicit min-key pick
    * (SURVEY §7.4 risk 4).
    */
  def firstPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        min($"o_orderkey").as("first_orderkey"),
        min_by($"o_totalprice", $"o_orderkey").as("first_price"),
        min_by($"o_orderstatus", $"o_orderkey").as("first_status"))
      .orderBy($"o_custkey")
  }

  val firstPerGroupSql: String =
    """SELECT o_custkey,
      | MIN(o_orderkey) AS first_orderkey,
      | MIN_BY(o_totalprice, o_orderkey) AS first_price,
      | MIN_BY(o_orderstatus, o_orderkey) AS first_status
      |FROM orders GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** A6/A7 (`tripletex.py:74,93`, `utils.py:16`): global min/max bounds and
    * mean. The mean divides an exact decimal sum (as double) by the count —
    * IEEE-deterministic in both engines, no rounding step to disagree on.
    */
  def minMaxAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir).agg(
      min($"l_shipdate").as("min_ship"),
      max($"l_shipdate").as("max_ship"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      (sum($"l_quantity".cast(MoneyDec)).cast("double") / count(lit(1))).as("avg_qty"),
      count(lit(1)).as("n"))
  }

  val minMaxAvgSql: String =
    """SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS n
      |FROM lineitem""".stripMargin

  /** A9 (`tripletex.py:214-219`): multiple filtered distinct-counts in one
    * aggregation pass (refund-only vs ordinary orders shape).
    */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir).agg(
      countDistinct(when($"l_returnflag" === "R", $"l_orderkey")).as("n_returned_orders"),
      countDistinct(when($"l_returnflag" =!= "R", $"l_orderkey")).as("n_kept_orders"),
      countDistinct($"l_orderkey").as("n_orders"),
      sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("n_returned_lines"))
  }

  val conditionalAggSql: String =
    """SELECT
      | COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS n_returned_orders,
      | COUNT(DISTINCT CASE WHEN l_returnflag <> 'R' THEN l_orderkey END) AS n_kept_orders,
      | COUNT(DISTINCT l_orderkey) AS n_orders,
      | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned_lines
      |FROM lineitem""".stripMargin

  /** A5 (`tripletex.py:36,54`): small distinct value collection — kept
    * distributed (distinct + sort) rather than a driver-side set; the
    * reference collects for warning text, which happens after this plan.
    */
  def distinctValues(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_type").distinct()
      .orderBy($"event_type")
  }

  val distinctValuesSql: String =
    "SELECT DISTINCT event_type FROM events ORDER BY event_type"

  /** Hierarchical ROLLUP with grouping ids — beyond the reference's
    * operator set (SURVEY §2.4 notes its absence); included for engine
    * completeness. GROUPING() bit semantics match DuckDB's.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy($"g_status", $"g_prio", $"o_orderstatus", $"o_orderpriority")
  }

  val rollupAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total,
      | CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q104: asymmetric GROUPING SETS — beyond ROLLUP/CUBE's fixed lattices,
    * arbitrary user-chosen grouping combinations in ONE pass over the
    * data: (status, priority), (returnflag alone), and the grand total.
    * Catalyst plans this as a single Expand + hash aggregate — at 100 TB
    * that is one scan and one shuffle for all three groupings, vs three
    * separate scans if issued as UNION ALL of plain GROUP BYs.
    * GROUPING() bit semantics match DuckDB's.
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .join(lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"l_returnflag"), Seq.empty),
        $"o_orderstatus", $"o_orderpriority", $"l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum($"l_extendedprice".cast(MoneyDec)), 2).cast("double").as("gross"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"),
        grouping($"l_returnflag").cast("int").as("g_ret"))
      .orderBy($"g_status", $"g_prio", $"g_ret",
        $"o_orderstatus", $"o_orderpriority", $"l_returnflag")
  }

  val groupingSetsAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, l_returnflag, COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS gross,
      | CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
      | CAST(GROUPING(l_returnflag) AS INTEGER) AS g_ret
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (l_returnflag), ())
      |ORDER BY g_status, g_prio, g_ret,
      | o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin

  /** q111: CUBE — the full 2^n grouping lattice over (status, priority),
    * completing the grouping family (q44 ROLLUP, q104 arbitrary GROUPING
    * SETS, q59/q106 pivot/unpivot). Same single Expand + hash aggregate
    * machinery: all four groupings in one scan and one shuffle.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy($"g_status", $"g_prio", $"o_orderstatus", $"o_orderpriority")
  }

  val cubeAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total,
      | CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q106: unpivot/melt — the wide→long inverse of q59's pivot: the four
    * lineitem measures become (measure, val) rows keyed by
    * (l_orderkey, l_linenumber). Catalyst plans `unpivot` as a single
    * Expand (one scan, 4× row fan-out, no shuffle, no join) — the
    * reshape stays map-side at any scale. The oracle mirrors it as the
    * dialect-safe UNION ALL form; all measures are already double, so no
    * common-type cast is needed.
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir)
      .unpivot(
        ids = Array($"l_orderkey", $"l_linenumber"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        variableColumnName = "measure",
        valueColumnName = "val")
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }

  val unpivotMeasuresSql: String =
    """SELECT l_orderkey, l_linenumber, measure, val FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** q108: one-pass column profiling over orders via
    * [[graft.operators.Profiling]] — row/null/exact-distinct counts plus
    * numeric min/max for every column, one scan total (the N exact
    * distincts share a single Expand + two-level aggregate). The oracle
    * recomputes each column's row from first principles.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.profile(orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  val columnProfileSql: String = {
    val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority").map { c =>
      val mn = if (numeric(c)) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (numeric(c)) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         | COUNT(*) - COUNT($c) AS n_null,
         | COUNT(DISTINCT $c) AS n_distinct,
         | $mn AS min_num, $mx AS max_num FROM orders""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) t ORDER BY \"column\"")
  }

  /** The SQL-text frontend: the engine's queries are equally expressible
    * through `spark.sql` over registered views — identical semantics to
    * the DataFrame build, same Catalyst plan.
    */
  def sqlApi(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("v_lineitem")
    orders(spark, dir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT o_orderpriority,
        | COUNT(DISTINCT o_orderkey) AS n_orders,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS gross
        |FROM v_lineitem JOIN v_orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag <> 'R'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val sqlApiSql: String =
    """SELECT o_orderpriority,
      | COUNT(DISTINCT o_orderkey) AS n_orders,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS gross
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_returnflag <> 'R'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q59: pivot — long→wide reshape of per-user event counts plus an
    * exact-decimal value sum per pivoted column. Spark's pivot with an
    * EXPLICIT value list is a single partial+final aggregate (no extra
    * distinct pass), mirrored as conditional aggregation in the oracle.
    */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)).as("n"),
        round(sum($"value".cast(MoneyDec)), 2).cast("double").as("val"))
      .na.fill(0L, types.map(t => s"${t}_n"))
      .orderBy($"user_id")
  }

  val pivotCountsSql: String =
    """SELECT user_id,
      | CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click_n,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = 'click'), 2) AS DOUBLE) AS click_val,
      | CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error_n,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = 'error'), 2) AS DOUBLE) AS error_val,
      | CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase_n,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = 'purchase'), 2) AS DOUBLE) AS purchase_val,
      | CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup_n,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = 'signup'), 2) AS DOUBLE) AS signup_val,
      | CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view_n,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = 'view'), 2) AS DOUBLE) AS view_val
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q60: exact interpolated percentiles per event_type — Spark's
    * `percentile` and DuckDB's `quantile_cont` share the same definition
    * ((1−g)·lower + g·upper over the sorted values); validated to agree
    * bit-for-bit on this data.
    *
    * Scale note: EXACT percentile buffers each group's value multiset in
    * the aggregation state — correct here (the oracle demands exactness)
    * but memory-linear in group size. The 100 TB path is
    * `approx_percentile` (GK sketch: bounded state, mergeable); the two
    * are spec-verified to agree within the sketch's accuracy bound in
    * AggregatesSpec-adjacent coverage (PercentileScaleSpec).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .groupBy($"event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, array(0.25, 0.75))").as("iqr"))
      .select($"event_type", $"p50", $"p95",
        $"iqr".getItem(0).as("p25"), $"iqr".getItem(1).as("p75"))
      .orderBy($"event_type")
  }

  val percentilesSql: String =
    """SELECT event_type,
      | quantile_cont(value, 0.5) AS p50,
      | quantile_cont(value, 0.95) AS p95,
      | quantile_cont(value, 0.25) AS p25,
      | quantile_cont(value, 0.75) AS p75
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q133: per-priority monthly revenue OLS trend — grouped linear
    * regression from sufficient statistics (n, Σx, Σx², Σy, Σxy), the
    * closed-form slope/intercept an analytics engine computes without ML
    * libraries. All statistics are EXACT integers (monthly revenue
    * rounded to whole dollars, month index made small by subtracting the
    * per-group min month), so the only floating-point steps are the final
    * scalar expressions — fixed-shape IEEE trees, bit-stable
    * cross-engine. The relative month index also bounds n·Σxy well below
    * 2⁶³ at 1000× this data (absolute year·12+month indexes would
    * overflow ANSI long arithmetic near 1e19).
    *
    * Scale: two hash aggregates on the same key family (month roll-up,
    * then per-group stats); the window min rides the groupBy exchange —
    * post-aggregation rows are #groups × #months, driver never sees data.
    */
  def olsTrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val monthly = orders(spark, dir)
      .select($"o_orderpriority".as("prio"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("xm"),
        $"o_totalprice")
      .groupBy($"prio", $"xm")
      .agg(round(sum($"o_totalprice".cast(MoneyDec)), 0).cast("long").as("yd"))
    val rel = monthly
      .withColumn("x", ($"xm" - min($"xm").over(Window.partitionBy($"prio"))).cast("long"))
    val s = rel.groupBy($"prio").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"),
      sum($"x" * $"x").as("sxx"),
      sum($"yd").as("sy"),
      sum($"x" * $"yd").as("sxy"))
    val num = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
    val den = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
    val slope = num / den
    s.select(
        $"prio", $"n".as("n_months"),
        slope.as("slope_dollars"),
        (($"sy".cast("double") - slope * $"sx".cast("double")) / $"n".cast("double"))
          .as("intercept_dollars"))
      .orderBy($"prio")
  }

  val olsTrendSql: String =
    """WITH m AS (
      |  SELECT o_orderpriority AS prio,
      |         year(o_orderdate)*12 + month(o_orderdate) AS xm, o_totalprice
      |  FROM orders),
      |monthly AS (
      |  SELECT prio, xm,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 0) AS BIGINT) AS yd
      |  FROM m GROUP BY prio, xm),
      |rel AS (
      |  SELECT prio, CAST(xm - MIN(xm) OVER (PARTITION BY prio) AS BIGINT) AS x, yd
      |  FROM monthly),
      |s AS (
      |  SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x*x) AS BIGINT) AS sxx,
      |    CAST(SUM(yd) AS BIGINT) AS sy, CAST(SUM(x*yd) AS BIGINT) AS sxy
      |  FROM rel GROUP BY prio)
      |SELECT prio, n AS n_months,
      |  CAST(n*sxy - sx*sy AS DOUBLE)/CAST(n*sxx - sx*sx AS DOUBLE) AS slope_dollars,
      |  (CAST(sy AS DOUBLE)
      |   - CAST(n*sxy - sx*sy AS DOUBLE)/CAST(n*sxx - sx*sx AS DOUBLE)*CAST(sx AS DOUBLE))
      |  / CAST(n AS DOUBLE) AS intercept_dollars
      |FROM s ORDER BY prio""".stripMargin

  /** q149: the typed-`Aggregator` tier — per-supplier line stats computed
    * on a `Dataset[LineRow]` via `groupByKey(...).agg(SupplierStats
    * .toColumn)` ([[graft.functions.TypedAggregators]]). Covers the one
    * public custom-aggregation API the engine didn't yet exercise (KMV/
    * CMS/HLL/Misra-Gries are `TypedImperativeAggregate`s; everything else
    * is `functions._`). The aggregator is monoidal (count / exact long
    * sum / max-by-epoch-micros), so the result is partition-order-
    * independent and the DuckDB oracle is a plain GROUP BY. Partial
    * aggregation still runs map-side — one l_suppkey shuffle at 100 TB.
    */
  def typedSupplierStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TypedAggregators._
    lineitem(spark, dir)
      .select($"l_suppkey", $"l_quantity", $"l_shipdate")
      .as[LineRow]
      .groupByKey(_.l_suppkey)
      .agg(SupplierStats.toColumn.name("s"))
      .select($"key".as("l_suppkey"), $"s.n_lines".as("n_lines"),
        $"s.sum_qty".as("sum_qty"), $"s.max_ship_micros".as("max_ship_micros"))
      .orderBy($"l_suppkey")
  }

  val typedSupplierStatsSql: String =
    """SELECT l_suppkey,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  epoch_us(MAX(l_shipdate)) AS max_ship_micros
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY l_suppkey""".stripMargin

  /** q163: grouped Pearson correlation from EXACT integer sufficient
    * statistics — does a bigger order (whole-dollar total) come with more
    * line items? Per priority: n, Σx, Σy, Σxy, Σx², Σy² accumulate as
    * longs in ONE pass (q133's OLS discipline: whole-dollar x keeps
    * n·Σx² under 2⁶³ through ~sf10 per group; beyond that the same stats
    * go DECIMAL(38,0) unchanged), and floats appear only in the final
    * fixed-shape tree r = num / (√dx · √dy) — long→double casts and
    * IEEE sqrt are correctly rounded on both engines, so r is
    * bit-stable. The integer stats ride along as the audit columns.
    */
  def correlation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perOrder = lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("y"))
      .join(orders(spark, dir).select($"o_orderkey".as("l_orderkey"),
        $"o_orderpriority".as("prio"),
        expr("CAST(ROUND(o_totalprice) AS BIGINT)").as("x")), "l_orderkey")
    perOrder.groupBy($"prio")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .select($"prio", $"n", $"sx", $"sy", $"sxy", $"sxx", $"syy",
        (expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          (sqrt(expr("CAST(n * sxx - sx * sx AS DOUBLE)")) *
           sqrt(expr("CAST(n * syy - sy * sy AS DOUBLE)")))).as("r"))
      .orderBy($"prio")
  }

  val correlationSql: String =
    """WITH po AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS y FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderpriority AS prio, CAST(ROUND(o_totalprice) AS BIGINT) AS x, po.y
      |  FROM po JOIN orders o ON o.o_orderkey = po.l_orderkey),
      |s AS (
      |  SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
      |    CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM j GROUP BY prio)
      |SELECT prio, n, sx, sy, sxy, sxx, syy,
      |  CAST(n*sxy - sx*sy AS DOUBLE)
      |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS r
      |FROM s ORDER BY prio""".stripMargin

  /** q164: chi-square test of independence (market segment × order
    * status) with an EXACT integer decomposition: per cell, observed
    * count, expected in integer milli-units ((rt·ct·1000) div N), and
    * the χ² contribution in integer micro-units —
    * ((O·N − rt·ct)²·10⁶) div (rt·ct·N) — computed in DECIMAL(38,0)
    * (the squared term reaches ~10²² at sf1, past 2⁶³ but far inside 38
    * digits), so every cell AND the total are bit-identical cross-engine
    * with zero float summation anywhere. The standard contingency
    * analysis; one (seg, status) count + two broadcast marginals.
    */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val joined = orders(spark, dir).select($"o_custkey", $"o_orderstatus")
      .join(broadcast(customer(spark, dir).select($"c_custkey".as("o_custkey"),
        $"c_mktsegment")), "o_custkey")
    val cells = joined.groupBy($"c_mktsegment", $"o_orderstatus")
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy($"c_mktsegment").agg(sum($"o").as("rt"))
    val colT = cells.groupBy($"o_orderstatus").agg(sum($"o").as("ct"))
    val total = cells.agg(sum($"o").as("nn"))
    cells.join(broadcast(rowT), "c_mktsegment")
      .join(broadcast(colT), "o_orderstatus")
      .crossJoin(broadcast(total))
      .select($"c_mktsegment", $"o_orderstatus", $"o",
        expr("(rt * ct * 1000) DIV nn").as("expected_milli"),
        expr("""CAST(
            CAST(o * nn - rt * ct AS DECIMAL(38,0)) * CAST(o * nn - rt * ct AS DECIMAL(38,0)) * 1000000
            div (CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)) * CAST(nn AS DECIMAL(38,0)))
          AS BIGINT)""").as("contrib_micro"))
      .orderBy($"c_mktsegment", $"o_orderstatus")
  }

  val chiSquareSql: String =
    """WITH j AS (
      |  SELECT c.c_mktsegment, o.o_orderstatus
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |cells AS (
      |  SELECT c_mktsegment, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM j GROUP BY 1, 2),
      |rt AS (SELECT c_mktsegment, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT o_orderstatus, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells)
      |SELECT cells.c_mktsegment, cells.o_orderstatus, cells.o,
      |  (rt.rt * ct.ct * 1000) // nn.nn AS expected_milli,
      |  CAST(
      |    CAST(cells.o * nn.nn - rt.rt * ct.ct AS HUGEINT)
      |      * CAST(cells.o * nn.nn - rt.rt * ct.ct AS HUGEINT) * 1000000
      |      // (CAST(rt.rt AS HUGEINT) * CAST(ct.ct AS HUGEINT) * CAST(nn.nn AS HUGEINT))
      |    AS BIGINT) AS contrib_micro
      |FROM cells JOIN rt USING (c_mktsegment) JOIN ct USING (o_orderstatus), nn
      |ORDER BY cells.c_mktsegment, cells.o_orderstatus""".stripMargin

  /** q168: grouped WEIGHTED median — per priority, the order value at
    * which half the LINE-ITEM mass sits below (weight = the order's line
    * count; the plain median ignores that a 7-line order matters 7× a
    * 1-line one). Lower-weighted-median convention, all integer: running
    * weight via a keyed window over (value, orderkey), the winner is the
    * first row where 2·cumw ≥ W — selected as min-(value, key) among
    * qualifying rows, so ties can't flap. One orderkey-join + one keyed
    * window; nothing global.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perOrder = lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("wgt"))
      .join(orders(spark, dir).select($"o_orderkey".as("l_orderkey"),
        $"o_orderpriority".as("prio"),
        expr("CAST(ROUND(o_totalprice) AS BIGINT)").as("v")), "l_orderkey")
    val w = Window.partitionBy($"prio").orderBy($"v", $"l_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"prio")
    perOrder
      .withColumn("cumw", sum($"wgt").over(w))
      .withColumn("wtot", sum($"wgt").over(wAll))
      .filter($"cumw" * 2 >= $"wtot")
      .groupBy($"prio")
      .agg(min($"v").as("median_value"), max($"wtot").as("w_total"))
      .select($"prio", $"w_total", $"median_value")
      .orderBy($"prio")
  }

  val weightedMedianSql: String =
    """WITH po AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS wgt FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderpriority AS prio, po.l_orderkey,
      |    CAST(ROUND(o_totalprice) AS BIGINT) AS v, po.wgt
      |  FROM po JOIN orders o ON o.o_orderkey = po.l_orderkey),
      |c AS (
      |  SELECT prio, l_orderkey, v, wgt,
      |    SUM(wgt) OVER (PARTITION BY prio ORDER BY v, l_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(wgt) OVER (PARTITION BY prio) AS wtot
      |  FROM j)
      |SELECT prio, CAST(MAX(wtot) AS BIGINT) AS w_total,
      |  CAST(MIN(v) AS BIGINT) AS median_value
      |FROM c WHERE cumw * 2 >= wtot
      |GROUP BY prio
      |ORDER BY prio""".stripMargin

  /** q191: k-anonymity / l-diversity audit — the privacy gate a
    * training-data release runs before shipping records keyed on
    * quasi-identifiers. Each (nation, market-segment) equivalence class
    * reports its size, whether it meets k=5 anonymity, and its l-diversity
    * (distinct sensitive-attribute buckets — here the account-balance
    * thousand-bucket): a class below k or with l=1 re-identifies or
    * attribute-discloses its members. One map-side-combinable hash
    * aggregate over the quasi-identifier key — the reduce side is
    * |nations|×|segments| rows regardless of table size, the ideal 100 TB
    * shape. Bucketing is floor(acctbal/1000) on the raw double (exact and
    * engine-identical); counts and flags are all integer.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    customer(spark, dir)
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long").as("bal_bucket"))
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct($"bal_bucket").as("l_diversity"))
      .select($"c_nationkey", $"c_mktsegment", $"class_size", $"l_diversity",
        ($"class_size" >= 5).as("k_anonymous"),
        ($"class_size" >= 5 && $"l_diversity" >= 3).as("releasable"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  val kAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment,
      |  COUNT(*) AS class_size,
      |  CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
      |    AS l_diversity,
      |  COUNT(*) >= 5 AS k_anonymous,
      |  COUNT(*) >= 5 AND
      |    COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) >= 3
      |    AS releasable
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_k_anonymity"    -> kAnonymity,
    "q168_weighted_median" -> weightedMedian,
    "q163_correlation"    -> correlation,
    "q164_chi_square"     -> chiSquare,
    "q149_typed_agg"      -> typedSupplierStats,
    "q133_ols_trend"      -> olsTrend,
    "q17_distinct_pairs"  -> distinctPairs,
    "q18_first_per_group" -> firstPerGroup,
    "q19_minmax_avg"      -> minMaxAvg,
    "q20_conditional_agg" -> conditionalAgg,
    "q21_distinct_values" -> distinctValues,
    "q44_rollup"          -> rollupAgg,
    "q45_sql_api"         -> sqlApi,
    "q59_pivot"           -> pivotCounts,
    "q60_percentiles"     -> percentiles,
    "q104_grouping_sets"  -> groupingSetsAgg,
    "q106_unpivot"        -> unpivotMeasures,
    "q108_column_profile" -> columnProfile,
    "q111_cube"           -> cubeAgg,
  )

  val oracles: Map[String, String] = Map(
    "q191_k_anonymity"    -> kAnonymitySql,
    "q168_weighted_median" -> weightedMedianSql,
    "q163_correlation"    -> correlationSql,
    "q164_chi_square"     -> chiSquareSql,
    "q149_typed_agg"      -> typedSupplierStatsSql,
    "q133_ols_trend"      -> olsTrendSql,
    "q44_rollup"          -> rollupAggSql,
    "q45_sql_api"         -> sqlApiSql,
    "q17_distinct_pairs"  -> distinctPairsSql,
    "q18_first_per_group" -> firstPerGroupSql,
    "q19_minmax_avg"      -> minMaxAvgSql,
    "q20_conditional_agg" -> conditionalAggSql,
    "q21_distinct_values" -> distinctValuesSql,
    "q59_pivot"           -> pivotCountsSql,
    "q60_percentiles"     -> percentilesSql,
    "q104_grouping_sets"  -> groupingSetsAggSql,
    "q106_unpivot"        -> unpivotMeasuresSql,
    "q108_column_profile" -> columnProfileSql,
    "q111_cube"           -> cubeAggSql,
  )
}
