package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Sorts, top-k, window arithmetic, and the remaining join shapes
  * (SURVEY.md §2.3 J5–J8, §2.5 W3–W4, §2.7).
  */
object Ranking {

  /** W2-style top-k-per-group (`setup.sql:351`): rank within supplier by
    * price with full deterministic tiebreak, keep top 3. Scale: one
    * shuffle on l_suppkey; rank filter applied before any further ops so
    * only k rows per group survive.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    lineitem(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"l_suppkey", $"rk", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_suppkey", $"rk")
  }

  val topkPerGroupSql: String =
    """SELECT l_suppkey, rk, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem) t
      |WHERE rk <= 3
      |ORDER BY l_suppkey, rk""".stripMargin

  /** q58: the same top-3-per-supplier selection as q11, but through the
    * CUSTOM two-phase TopK operator (graft.plans.TopKPerGroup) — partial
    * bounded heaps before the exchange, only survivors shuffle, no full
    * per-partition sort. The oracle is the window-rank form, proving the
    * operator's exactness; plan shape (GraftTopKPartial below the
    * exchange) is asserted in TopKPerGroupSpec.
    */
  def topkCustom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.TopKPerGroup.topK(
        lineitem(spark, dir)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice"),
        groupCols = Seq("l_suppkey"),
        orderBy = Seq($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc),
        k = 3)
      .orderBy($"l_suppkey", $"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
  }

  val topkCustomSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem) t
      |WHERE rk <= 3
      |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin

  /** q61: the analytic window-function family over a deterministic total
    * order (value, event_id): ntile / percent_rank / cume_dist / lag /
    * lead — rank-arithmetic and IEEE division are formula-identical in
    * DuckDB, so the whole family oracles exactly. One shuffle on the
    * window key.
    */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value".asc, $"event_id".asc)
    events(spark, dir)
      .select($"event_id", $"event_type", $"value")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_value", lead($"value", 1).over(w))
      .orderBy($"event_type", $"value", $"event_id")
  }

  val windowSuiteSql: String =
    """SELECT event_id, event_type, value,
      |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume,
      |  LAG(value, 1) OVER w AS prev_value,
      |  LEAD(value, 1) OVER w AS next_value
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_type, value, event_id""".stripMargin

  /** O1 multi-key sort + top-k (`setup.sql:392-393`): global sort with a
    * unique tiebreak and LIMIT — planned as TakeOrderedAndProject (no full
    * sort materialization), the right shape at any scale.
    */
  def sortLimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderdate".desc, $"o_orderkey".asc)
      .limit(100)
  }

  val sortLimitSql: String =
    """SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_orderdate DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** J8 orphan audit as left_anti (SURVEY §2.3): customers with no orders.
    * Scale: anti-join shuffles both sides once on the key; no collected
    * id sets.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // "customers with no order since 2001" — non-empty, unlike the plain
    // orphan check (every synthetic customer has at least one order).
    val recent = orders(spark, dir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey".as("c_custkey"))
    customer(spark, dir)
      .join(recent, Seq("c_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** J7 right join (`db.py:459-469`): per-customer order counts where the
    * right side (all customers) dominates — rows with no match keep nulls
    * → counted as 0.
    */
  def rightJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("n_orders"),
        round(sum(coalesce($"o_totalprice", lit(0.0)).cast(MoneyDec)), 2)
          .cast("double").as("total_spend"))
      .orderBy($"c_custkey")
  }

  val rightJoinSql: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      | CAST(ROUND(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_spend
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  /** J5 composite-key join (`setup.sql:325-326`): self-join lineitem on
    * (orderkey, linenumber)=(orderkey, linenumber+1) — adjacent line pairs,
    * the 2-key equi-join shape. Scale: equal partitioning on l_orderkey on
    * both sides; AQE picks sort-merge vs hash by size.
    */
  def compositeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, dir).select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    val cur = li.as("cur")
    val nxt = li.select($"l_orderkey", ($"l_linenumber" - 1).as("l_linenumber"),
      $"l_extendedprice".as("next_price")).as("nxt")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
    // full column set joins the ORDER BY for cross-engine row-order parity.
    cur.join(nxt, Seq("l_orderkey", "l_linenumber"), "inner")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"next_price")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"next_price")
  }

  val compositeJoinSql: String =
    """SELECT cur.l_orderkey, cur.l_linenumber, cur.l_extendedprice, nxt.l_extendedprice AS next_price
      |FROM lineitem cur
      |JOIN lineitem nxt ON cur.l_orderkey = nxt.l_orderkey
      |               AND cur.l_linenumber = nxt.l_linenumber - 1
      |ORDER BY cur.l_orderkey, cur.l_linenumber, cur.l_extendedprice, next_price""".stripMargin

  /** W3+W4 (`db.py:458-469`): global sequence assignment with an imposed
    * deterministic order and a start-offset — the invoice-numbering shape.
    * Scale note: a global row_number has a single-partition window; at
    * 100 TB this becomes zipWithIndex-style two-phase numbering (per-
    * partition counts + offsets). Cardinality here is the grouped key set
    * (small), so the single partition holds.
    */
  def globalNumbering(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val startId = 10000L
    val pairs = orders(spark, dir).select($"o_custkey", $"o_orderstatus").distinct()
    pairs
      .withColumn("seq_no",
        row_number().over(Window.orderBy($"o_custkey", $"o_orderstatus")) + lit(startId) - 1)
      .orderBy($"o_custkey", $"o_orderstatus")
  }

  val globalNumberingSql: String =
    """SELECT o_custkey, o_orderstatus,
      | ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderstatus) + 10000 - 1 AS seq_no
      |FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders) t
      |ORDER BY o_custkey, o_orderstatus""".stripMargin

  /** q158: correlated LATERAL subquery — per-nation top-2 customers by
    * account balance written as `FROM nation, LATERAL (... WHERE
    * c_nationkey = n_nationkey ORDER BY ... LIMIT 2)`. The declarative
    * twin of q11/q58: Catalyst DECORRELATES the lateral into a ranked
    * join (DecorrelateInnerQuery → window + filter shape), so the
    * per-group-limit never executes as N correlated probes — the plan is
    * one customer shuffle regardless of |nation|, which is the property
    * that makes LATERAL safe at 100 TB. Registered through the SQL
    * entry path (`spark.sql`), exercising parser → analyzer
    * decorrelation end-to-end; DuckDB runs the same text shape natively.
    */
  def lateralTopPerNation(spark: SparkSession, dir: String): DataFrame = {
    nation(spark, dir).createOrReplaceTempView("nation_v")
    customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal
        |FROM nation_v n,
        |LATERAL (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer_v
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey""".stripMargin)
  }

  val lateralTopPerNationSql: String =
    """SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_custkey, c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
      |ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey""".stripMargin

  /** q162: top-k WITH ties — `rank() <= k`, the semantics `row_number()`
    * silently gets wrong when the boundary value repeats: every order
    * tying the 3rd-highest price per priority is kept (so groups can
    * return MORE than k rows), and no arbitrary tie-break invents an
    * ordering the data doesn't have. Same single keyed window exchange
    * as q11; only the rank function differs — the pair documents the
    * choice: row_number for "exactly k, deterministically tie-broken",
    * rank for "all rows as good as the k-th".
    */
  def topkWithTies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc)
    orders(spark, dir)
      .withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 3)
      .select($"o_orderpriority", $"rnk", $"o_totalprice", $"o_orderkey")
      .orderBy($"o_orderpriority", $"rnk", $"o_orderkey")
  }

  val topkWithTiesSql: String =
    """SELECT o_orderpriority, rnk, o_totalprice, o_orderkey FROM (
      |  SELECT o_orderpriority, o_totalprice, o_orderkey,
      |    RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_topk_ties"       -> topkWithTies,
    "q158_lateral_topk"    -> lateralTopPerNation,
    "q11_topk_per_group"   -> topkPerGroup,
    "q12_sort_limit"       -> sortLimit,
    "q13_anti_join"        -> antiJoin,
    "q14_right_join"       -> rightJoin,
    "q15_composite_join"   -> compositeJoin,
    "q16_global_numbering" -> globalNumbering,
    "q58_topk_custom"      -> topkCustom,
    "q61_window_suite"     -> windowSuite,
  )

  val oracles: Map[String, String] = Map(
    "q162_topk_ties"       -> topkWithTiesSql,
    "q158_lateral_topk"    -> lateralTopPerNationSql,
    "q11_topk_per_group"   -> topkPerGroupSql,
    "q12_sort_limit"       -> sortLimitSql,
    "q13_anti_join"        -> antiJoinSql,
    "q14_right_join"       -> rightJoinSql,
    "q15_composite_join"   -> compositeJoinSql,
    "q16_global_numbering" -> globalNumberingSql,
    "q58_topk_custom"      -> topkCustomSql,
    "q61_window_suite"     -> windowSuiteSql,
  )
}
