package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Core relational operator inventory (SURVEY.md §2.1–§2.7) expressed over
  * the driver's synthetic tables, one named query per operator family, each
  * paired with ANSI SQL for the DuckDB oracle.
  *
  * Design rules for oracle parity (see Tables.MoneyDec):
  *  - every query ends in a deterministic ORDER BY on a unique key set;
  *  - money/double aggregates go double-arithmetic → decimal cast → exact
  *    sum → round(2) → double render, identical in both engines;
  *  - every computed column is aliased identically in Spark and SQL.
  *
  * Scale notes are attached per query: these run at sf0.01 for the gate but
  * are written for the 100 TB plan shape (broadcast dims, partial aggs,
  * anti-join instead of collected sets).
  */
object Relational {

  /** A1/A2/A4/A8 + F6 (`/root/reference/tripletex.py:107-114`,
    * `setup.sql:301`): grouped exact-decimal money aggregation with
    * map-side partial aggregation. Scale: pure hash-agg, one shuffle on the
    * (tiny-cardinality) group key — optimal at any SF.
    */
  def aggSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity".cast(MoneyDec)), 2).cast("double").as("sum_qty"),
        round(sum($"l_extendedprice".cast(MoneyDec)), 2).cast("double").as("sum_base_price"),
        round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(MoneyDec)), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        countDistinct($"l_orderkey").as("n_orders"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val aggSumSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_base_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_disc_price,
      | COUNT(*) AS count_order,
      | COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** S4/F7/P4 (`/root/reference/db.py:81-113`): date-range filtered scan
    * with projection. Scale: filter + column pruning push to the parquet
    * scan (verified via explain: PushedFilters on o_orderdate); with a
    * date-partitioned layout this becomes partition pruning.
    */
  def filterDates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp") &&
              $"o_orderstatus".isin("O", "F"))
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_orderkey")
  }

  val filterDatesSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderstatus IN ('O','F')
      |ORDER BY o_orderkey""".stripMargin

  /** J1/J2 + A2 (`/root/reference/setup.sql:239-242`): fact ⟕ dim ⟕ dim with
    * explicit broadcast of the small dimensions, then grouped money agg.
    * Scale: lineitem⨝orders is the one real shuffle (co-partition on
    * orderkey); customer is broadcast so it never shuffles the fact table.
    */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, dir)
    val o  = orders(spark, dir)
    val c  = customer(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .groupBy($"c_mktsegment", $"o_orderstatus")
      .agg(
        round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(MoneyDec)), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"c_mktsegment", $"o_orderstatus")
  }

  val joinAggSql: String =
    """SELECT c_mktsegment, o_orderstatus,
      | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  /** W1 (`/root/reference/setup.sql:196-205`): rank-1-per-group via
    * row_number over a CASE significance ordering, with a deterministic
    * tiebreak (SURVEY §7.4 risk 4). Scale: single shuffle on the partition
    * key; rank=1 filter is applied immediately after the window so no
    * superfluous rows survive the exchange.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = when($"o_orderstatus" === "O", 1)
      .when($"o_orderstatus" === "F", 2)
      .otherwise(10)
    val w = Window.partitionBy($"o_custkey").orderBy(sig.asc, $"o_orderdate".asc, $"o_orderkey".asc)
    orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderstatus", $"o_orderdate")
      .orderBy($"o_custkey")
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 10 END,
      |             o_orderdate, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** U1 (`/root/reference/setup.sql:378-390`): multi-branch UNION with
    * load-bearing distinct — branches are built union-compatible and the
    * dedup collapses deliberately duplicated rows. Scale: distinct() is a
    * hash-agg shuffle over the (narrow, 3-col) union schema; branches are
    * pre-projected so the shuffle payload stays minimal.
    */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, dir)
    val b1 = o.select($"o_orderkey".as("id"), lit("order").as("src"), $"o_orderstatus".as("tag"))
    val b2 = lineitem(spark, dir)
      .select($"l_orderkey".as("id"), lit("line").as("src"), $"l_returnflag".as("tag"))
    val b3 = o.filter($"o_orderstatus" === "F")   // duplicates of part of b1 → dedup is load-bearing
      .select($"o_orderkey".as("id"), lit("order").as("src"), $"o_orderstatus".as("tag"))
    b1.unionByName(b2).unionByName(b3).distinct()
      .orderBy($"id", $"src", $"tag")
  }

  val unionDistinctSql: String =
    """SELECT o_orderkey AS id, 'order' AS src, o_orderstatus AS tag FROM orders
      |UNION
      |SELECT l_orderkey AS id, 'line' AS src, l_returnflag AS tag FROM lineitem
      |UNION
      |SELECT o_orderkey AS id, 'order' AS src, o_orderstatus AS tag FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY id, src, tag""".stripMargin

  /** U2 (`/root/reference/tripletex.py:73-76`): sequence-gap detection as a
    * distributed anti-join of `spark.range(lo,hi)` against observed keys —
    * never a collected set. Scale: range is generated partition-parallel;
    * the anti-join shuffles once on the key.
    */
  def gapDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The synthetic orderkeys are dense; drop every 7th to exercise real gaps
    // (the reference's sequences genuinely have holes: refund-only orders).
    val observed = orders(spark, dir).filter($"o_orderkey" % 7 =!= 0)
    val Array(lo: Long, hi: Long) =
      observed.agg(min($"o_orderkey"), max($"o_orderkey")).head().toSeq.map(_.asInstanceOf[Long]).toArray
    spark.range(lo, hi + 1).toDF("id")
      .join(observed.select($"o_orderkey".as("id")), Seq("id"), "left_anti")
      .orderBy($"id")
  }

  val gapDetectSql: String =
    """WITH obs AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0),
      |b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM obs)
      |SELECT gs.id FROM (SELECT unnest(generate_series(lo, hi)) AS id FROM b) gs
      |WHERE gs.id NOT IN (SELECT o_orderkey FROM obs)
      |ORDER BY gs.id""".stripMargin

  /** q142: declarative data-quality audit ([[graft.operators.DataQuality]])
    * — a rule set over orders/lineitem evaluated as ONE scan per table for
    * the column rules (conditional-count aggregates, map-side combining),
    * one shuffle for key uniqueness, one left-anti for referential
    * integrity. The Deequ/expectations shape as an engine operator;
    * generalizes the reference's 8 fixed checks (C1–C8, `verify/Checks`)
    * into a composable rule API.
    */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.DataQuality._
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    report(Seq(
      columnRules(o, Seq(
        notNull("orders_totalprice_not_null", $"o_totalprice"),
        nonNegative("orders_totalprice_non_negative", $"o_totalprice"),
        inSet("orders_status_domain", $"o_orderstatus", Seq("O", "F", "P")))),
      columnRules(l, Seq(
        inRange("lineitem_discount_range", $"l_discount", 0.0, 0.1),
        inRange("lineitem_quantity_range", $"l_quantity", 1.0, 50.0))),
      uniqueKey(o, "orders_orderkey_unique", Seq("o_orderkey")),
      referential(l, "l_orderkey", o, "o_orderkey", "lineitem_orderkey_referential")))
  }

  val dqAuditSql: String =
    """WITH oc AS (
      |  SELECT * FROM (VALUES
      |    ('orders_totalprice_not_null', 0, 1),
      |    ('orders_totalprice_non_negative', 1, 2),
      |    ('orders_status_domain', 2, 3)) t(rule, kind, _o)),
      |orules AS (
      |  SELECT rule,
      |    CASE rule
      |      WHEN 'orders_totalprice_not_null' THEN
      |        (SELECT CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
      |      WHEN 'orders_totalprice_non_negative' THEN
      |        (SELECT CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
      |      ELSE
      |        (SELECT CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
      |    END AS n_violations,
      |    CASE rule
      |      WHEN 'orders_totalprice_not_null' THEN (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
      |      WHEN 'orders_totalprice_non_negative' THEN (SELECT CAST(COUNT(o_totalprice) AS BIGINT) FROM orders)
      |      ELSE (SELECT CAST(COUNT(o_orderstatus) AS BIGINT) FROM orders)
      |    END AS n_checked
      |  FROM oc),
      |lrules AS (
      |  SELECT 'lineitem_discount_range' AS rule,
      |    (SELECT CAST(SUM(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem) AS n_violations,
      |    (SELECT CAST(COUNT(l_discount) AS BIGINT) FROM lineitem) AS n_checked
      |  UNION ALL
      |  SELECT 'lineitem_quantity_range',
      |    (SELECT CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(COUNT(l_quantity) AS BIGINT) FROM lineitem)),
      |uniq AS (
      |  SELECT 'orders_orderkey_unique' AS rule,
      |    (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
      |     FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey) g) AS n_violations,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked),
      |ref AS (
      |  SELECT 'lineitem_orderkey_referential' AS rule,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_checked)
      |SELECT rule, n_violations, n_checked, n_violations = 0 AS pass
      |FROM (SELECT rule, n_violations, n_checked FROM orules
      |      UNION ALL SELECT * FROM lrules
      |      UNION ALL SELECT * FROM uniq
      |      UNION ALL SELECT * FROM ref) all_rules
      |ORDER BY rule""".stripMargin

  /** q143: cross-table financial reconciliation — per priority class,
    * how many orders' header total deviates > 1% from the recomputed
    * lineitem sum Σ extendedprice·(1−discount)·(1+tax), how many have no
    * lines at all, and the exact-decimal total absolute deviation. The
    * ledger-vs-detail audit every finance pipeline runs; this corpus's
    * header totals are synthetic (98% deviate — the report says so
    * rather than assuming consistency). Determinism: row-level products
    * in IEEE double, per-order sums exact decimal (a double SUM would be
    * order-dependent), ratio compares on fixed-shape double trees.
    */
  def reconciliation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val calc = lineitem(spark, dir)
      .withColumn("amt",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .cast(MoneyDec))
      .groupBy($"l_orderkey")
      .agg(round(sum($"amt"), 2).cast("decimal(18,2)").as("calc"))
    orders(spark, dir)
      .join(calc, $"o_orderkey" === $"l_orderkey", "left")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when($"calc".isNull, 1L).otherwise(0L)).as("n_no_lines"),
        sum(when($"calc".isNotNull &&
            abs($"o_totalprice" - $"calc".cast("double")) / $"o_totalprice" > 0.01,
          1L).otherwise(0L)).as("n_deviating"),
        round(sum(abs($"o_totalprice".cast(MoneyDec) - coalesce($"calc", lit(0).cast(MoneyDec)))), 2)
          .cast("decimal(18,2)").cast("double").as("total_abs_dev"))
      .orderBy($"o_orderpriority")
  }

  val reconciliationSql: String =
    """WITH calc AS (
      |  SELECT l_orderkey,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
      |                        AS DECIMAL(38,6))), 2) AS DECIMAL(18,2)) AS calc
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN calc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
      |  CAST(SUM(CASE WHEN calc IS NOT NULL
      |                 AND ABS(o_totalprice - CAST(calc AS DOUBLE)) / o_totalprice > 0.01
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_deviating,
      |  CAST(CAST(ROUND(SUM(ABS(CAST(o_totalprice AS DECIMAL(38,6))
      |                          - COALESCE(calc, CAST(0 AS DECIMAL(38,6))))), 2)
      |            AS DECIMAL(18,2)) AS DOUBLE) AS total_abs_dev
      |FROM orders LEFT JOIN calc ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q150: in-pass observability — `Dataset.observe` (the CollectMetrics
    * node) rides data-quality counters on the SAME scan that feeds the
    * aggregate: rows scanned, null returnflags, exact unit total. q142's
    * rule engine audits with its own pass; this is the zero-extra-cost
    * variant you leave on in production — at 100 TB an extra audit scan
    * is the difference between monitoring and not monitoring. The metrics
    * surface through `Observation`/listener (asserted in
    * ObserveSpec); the query RESULT is unchanged by the node, which is
    * exactly what the oracle grades (and the plan pin asserts one scan).
    */
  def observedMonthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir)
      .filter($"l_shipdate" >= "1998-01-01")
      .observe("graft_audit",
        count(lit(1)).as("rows_scanned"),
        count(when($"l_returnflag".isNull, 1)).as("null_returnflag"),
        sum($"l_quantity".cast("long")).as("total_qty"))
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg(
        round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(MoneyDec)), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"month")
  }

  val observedMonthlyRevenueSql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS month,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= '1998-01-01'
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  /** q155: INTERSECT / EXCEPT — the two §2.6 set operators the U1/U2
    * queries don't exercise, as a retention/churn report: customers who
    * ordered in 1996 ∩ 1997 (retained), 1996 ∖ 1997 (churned), and
    * 1997 ∖ 1996 (new). Catalyst rewrites `intersect`/`except` into
    * left-semi / left-anti joins over the deduplicated key sets
    * (ReplaceIntersectWithSemiJoin / ReplaceExceptWithAntiJoin), so at
    * 100 TB each branch is one hash-dedup + one key-only join — never a
    * row-level comparison. The tag column makes the three sets one
    * union-able result.
    */
  def setOpsRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, dir)
    def buyers(year: Int) = o
      .filter($"o_orderdate" >= lit(s"$year-01-01").cast("timestamp") &&
              $"o_orderdate" < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select($"o_custkey")
    val y96 = buyers(1996); val y97 = buyers(1997)
    y96.intersect(y97).select($"o_custkey", lit("retained").as("tag"))
      .unionByName(y96.except(y97).select($"o_custkey", lit("churned").as("tag")))
      .unionByName(y97.except(y96).select($"o_custkey", lit("new").as("tag")))
      .orderBy($"tag", $"o_custkey")
  }

  val setOpsRetentionSql: String =
    """WITH y96 AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
      |y97 AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_custkey, 'retained' AS tag FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97) t
      |UNION ALL
      |SELECT o_custkey, 'churned' AS tag FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97) t
      |UNION ALL
      |SELECT o_custkey, 'new' AS tag FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96) t
      |ORDER BY tag, o_custkey""".stripMargin

  /** q172: join-strategy hints — the same orders⨝customer aggregate
    * executed THREE ways (`BROADCAST`, `SHUFFLE_HASH`, `MERGE` hints on
    * the build side) and unioned under a strategy tag: the graded result
    * proves physical-strategy invariance (any strategy-dependent
    * nondeterminism — build-side dup handling, null matching — would
    * hash-mismatch one branch), and JoinHintPlanSpec pins that each hint
    * actually planned its operator (BroadcastHashJoin / ShuffledHashJoin
    * / SortMergeJoin). Hints are the manual override lane next to the
    * engine's own choices (AQE flips, the DSv2 stats tier): at 100 TB
    * you hint when you know the dimension fits and the optimizer can't.
    */
  def joinHints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, dir).select($"o_custkey", $"o_totalprice")
    val c = customer(spark, dir).select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    def branch(hint: String, tag: String) = o.join(c.hint(hint), "o_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"))
      .select(lit(tag).as("strategy"), $"c_mktsegment", $"n", $"total")
    branch("BROADCAST", "broadcast")
      .unionByName(branch("SHUFFLE_HASH", "shuffle_hash"))
      .unionByName(branch("MERGE", "sort_merge"))
      .orderBy($"strategy", $"c_mktsegment")
  }

  val joinHintsSql: String =
    """WITH agg AS (
      |  SELECT c_mktsegment, COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  GROUP BY c_mktsegment)
      |SELECT t.strategy, agg.c_mktsegment, agg.n, agg.total
      |FROM (VALUES ('broadcast'), ('shuffle_hash'), ('sort_merge')) t(strategy)
      |CROSS JOIN agg
      |ORDER BY t.strategy, agg.c_mktsegment""".stripMargin

  /** q206: runtime Bloom-filter join (Catalyst's InjectRuntimeFilter) —
    * the optimizer builds a Bloom filter from the SELECTIVE side of a
    * shuffle join (orders filtered to one priority) and pushes
    * `bloom_filter_might_contain` into the fact-side scan, so ~80% of
    * lineitem rows die at the scan instead of crossing the exchange — at
    * 100 TB this is the difference between shuffling the whole fact table
    * and shuffling a fifth of it. The MERGE hint keeps the join a shuffle
    * join (broadcast joins don't take runtime filters; semi-join
    * reduction stays off). BloomJoinPlanSpec pins the injected filter in
    * the executed plan AND result-invariance with the rule disabled; the
    * oracle grades the plain relational semantics.
    */
  def bloomFilterJoin(spark: SparkSession, dir: String): DataFrame =
    withConf(spark, "spark.sql.optimizer.runtime.bloomFilter.enabled", "true") {
    // the rule only fires when the application-side scan is big enough to
    // be worth filtering (default 10 GB — the real-scale posture); the
    // graded fixtures are MBs, so scale the threshold with them exactly
    // like shuffle.partitions=32 scales the exchange fan-out
    withConf(spark, "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB") {
    // InjectRuntimeFilter only fires for joins that will genuinely
    // shuffle (isProbablyShuffleJoin checks canBroadcastBySize on BOTH
    // sides); at 100 TB the filtered creation side is far beyond any
    // broadcast threshold, which the MB-scale fixture models by turning
    // auto-broadcast off for this query
    withConf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1") {
      import spark.implicits._
      val li = lineitem(spark, dir)
      val o = orders(spark, dir).filter($"o_orderpriority" === "1-URGENT")
      val df = li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(MoneyDec)), 2)
            .cast("double").as("revenue"))
        .orderBy($"l_returnflag")
      // optimization is lazy: force it HERE so InjectRuntimeFilter sees
      // the pinned confs (queryExecution caches the optimized plan; the
      // restored session confs no longer matter at action time)
      df.queryExecution.optimizedPlan
      df
    } } }

  val bloomFilterJoinSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_lines,
      | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q203: Benford first-digit audit — the books-cooking / synthetic-data
    * detector: leading digits of order totals against Benford's law, with
    * the expected distribution as FIXED per-mille integer literals
    * (301, 176, … — no libm log10 at query time) and the observed side as
    * integer per-mille shares, so the deviation report is exact and
    * engine-identical. First digit comes from the integer part's string
    * rendering (floor → BIGINT → first char), not a log — same value both
    * engines. One digit-keyed hash-agg (9-row reduce side) + a broadcast
    * 1-row total.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = orders(spark, dir)
      .filter($"o_totalprice" >= 1.0)
      .select(substring(floor($"o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum($"n_obs").as("n_total")) // 1 row
    val expected = typedLit(Map(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L,
      5 -> 79L, 6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L))
    digits.crossJoin(broadcast(total))
      .withColumn("o_mille", expr("n_obs * 1000 DIV n_total"))
      .withColumn("e_mille", element_at(expected, $"digit"))
      .select($"digit", $"n_obs", $"o_mille", $"e_mille",
        ($"o_mille" - $"e_mille").as("dev_mille"),
        (abs($"o_mille" - $"e_mille") > 15L).as("suspicious"))
      .orderBy($"digit")
  }

  val benfordAuditSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
      |    AS INTEGER) AS digit
      |  FROM orders WHERE o_totalprice >= 1.0),
      |g AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM g)
      |SELECT digit, n_obs,
      |  CAST(n_obs * 1000 // n_total AS BIGINT) AS o_mille,
      |  CAST(CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
      |    WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
      |    WHEN 8 THEN 51 ELSE 46 END AS BIGINT) AS e_mille,
      |  CAST(n_obs * 1000 // n_total AS BIGINT)
      |    - CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
      |        WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
      |        WHEN 8 THEN 51 ELSE 46 END AS dev_mille,
      |  abs(CAST(n_obs * 1000 // n_total AS BIGINT)
      |    - CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
      |        WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
      |        WHEN 8 THEN 51 ELSE 46 END) > 15 AS suspicious
      |FROM g, t
      |ORDER BY digit""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_benford_audit" -> benfordAudit,
    "q206_bloom_join" -> bloomFilterJoin,
    "q172_join_hints"    -> joinHints,
    "q155_set_ops"       -> setOpsRetention,
    "q150_observed_agg"  -> observedMonthlyRevenue,
    "q143_reconciliation" -> reconciliation,
    "q142_dq_audit"      -> dqAudit,
    "q01_agg_sum"        -> aggSum,
    "q02_filter_dates"   -> filterDates,
    "q03_join_agg"       -> joinAgg,
    "q04_window_rank"    -> windowRank,
    "q05_union_distinct" -> unionDistinct,
    "q06_gap_detect"     -> gapDetect,
  )

  val oracles: Map[String, String] = Map(
    "q203_benford_audit" -> benfordAuditSql,
    "q206_bloom_join" -> bloomFilterJoinSql,
    "q172_join_hints"    -> joinHintsSql,
    "q155_set_ops"       -> setOpsRetentionSql,
    "q150_observed_agg"  -> observedMonthlyRevenueSql,
    "q143_reconciliation" -> reconciliationSql,
    "q142_dq_audit"      -> dqAuditSql,
    "q01_agg_sum"        -> aggSumSql,
    "q02_filter_dates"   -> filterDatesSql,
    "q03_join_agg"       -> joinAggSql,
    "q04_window_rank"    -> windowRankSql,
    "q05_union_distinct" -> unionDistinctSql,
    "q06_gap_detect"     -> gapDetectSql,
  )
}
