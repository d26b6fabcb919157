package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Graph-shaped analytics derived from the relational tables: market-basket
  * co-occurrence mining (the edge builder) and an iterative fixed-point
  * PageRank over the resulting co-purchase graph (the distributed-iteration
  * shape the dedup connected-components solver deliberately avoids —
  * `DedupGroups` gates on edge count; PageRank is the unbounded-iteration
  * twin expressed as pure joins+aggregates).
  *
  * Scale notes (100 TB posture):
  *  - Pair mining joins `lineitem` to itself on `l_orderkey` AFTER a
  *    per-(order, part) dedup, so the fan-out per task is bounded by the
  *    per-order basket size (TPC-H ~O(7) lines), never by table size. Both
  *    join sides share one shuffle key; the pair aggregate map-side-combines.
  *  - PageRank keeps ALL arithmetic in 64-bit integers (fixed-point
  *    micro-rank units, integer division) so results are bit-identical
  *    across engines and across partition orders — floating-point PageRank
  *    sums are order-dependent and cannot be hash-verified. Each iteration
  *    is one co-partitioned join (adjacency ⋈ ranks on `src`) plus one
  *    aggregate keyed on `dst`; the adjacency list is computed once and
  *    reused, which at cluster scale means a stable partitioning the
  *    iteration shuffles against instead of rebuilding.
  */
object GraphOps {

  /** Per-(order, part) deduped basket rows — the graph's incidence list. */
  private def orderParts(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()

  /** Support-filtered undirected co-purchase edges (p1 < p2 canonical). */
  private def pairEdges(spark: SparkSession, dir: String, minSupport: Long): DataFrame = {
    val op = orderParts(spark, dir)
    val a = op.as("a")
    val b = op.as("b")
    a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
  }

  /** q114: market-basket pair mining — parts bought together in ≥2 orders,
    * with their support counts. The first half of every co-occurrence /
    * association-rule pipeline; also the edge list for q115.
    */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pairEdges(spark, dir, 2L).orderBy($"p1", $"p2")
  }

  val copurchasePairsSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
      |FROM op a JOIN op b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 2
      |ORDER BY p1, p2""".stripMargin

  /** q115: fixed-point PageRank (3 unrolled iterations, damping 0.85) over
    * the undirected q114 co-purchase graph. Ranks are integer micro-units
    * (node starts at 1,000,000): contribution = rank DIV degree, update =
    * 150000 + (85 · Σ contrib) DIV 100 — exact 64-bit arithmetic end to
    * end, so the result is engine- and partition-order-independent (the
    * property that makes an iterative graph metric DuckDB-oracle-able at
    * all). Every node of the symmetrized graph has degree ≥ 1 and in-edges
    * = out-edges, so no dangling-mass term is needed.
    */
  /** The iteration kernel, separated for direct unit testing: `edges` is a
    * directed edge list (symmetrize before calling for undirected graphs)
    * whose every node has out-degree ≥ 1. Returns (node, rk) after `iters`
    * fixed-point steps.
    */
  def pagerankFixedPoint(edges: DataFrame, iters: Int): DataFrame = {
    import edges.sparkSession.implicits._
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    // adjacency with out-degree attached once; reused by every iteration
    val adj = edges.join(deg, "src").select($"src", $"dst", $"deg")
    var ranks = deg.select($"src".as("node"), lit(1000000L).as("rk"))
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst", expr("rk DIV deg").as("c"))
      ranks = contrib.groupBy($"dst".as("node"))
        .agg(sum($"c").as("s"))
        .select($"node", (lit(150000L) + expr("(85 * s) DIV 100")).as("rk"))
    }
    ranks
  }

  def copurchaseRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialize the mined edges once: the unrolled iterations reference
    // the edge list ~10 times through deg/adj lineage, and DataFrame DAGs
    // have no common-subexpression reuse — without this the quadratic-ish
    // pair mining would rerun per reference (same pattern as
    // DedupGroups.scala:44)
    val pairs = pairEdges(spark, dir, 2L).localCheckpoint(eager = true)
    val edges = pairs.select($"p1".as("src"), $"p2".as("dst"))
      .unionByName(pairs.select($"p2".as("src"), $"p1".as("dst")))
    pagerankFixedPoint(edges, 3)
      .select($"node".as("part_id"), $"rk".as("rank_fp"))
      .orderBy($"rank_fp".desc, $"part_id")
  }

  val copurchaseRankSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pr AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |edges AS (SELECT p1 AS src, p2 AS dst FROM pr
      |          UNION ALL SELECT p2, p1 FROM pr),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
      |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rk FROM deg),
      |c1 AS (SELECT e.dst AS node, CAST(SUM(r.rk // d.deg) AS BIGINT) AS s
      |       FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
      |       GROUP BY 1),
      |r1 AS (SELECT node, CAST(150000 + (85 * s) // 100 AS BIGINT) AS rk FROM c1),
      |c2 AS (SELECT e.dst AS node, CAST(SUM(r.rk // d.deg) AS BIGINT) AS s
      |       FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
      |       GROUP BY 1),
      |r2 AS (SELECT node, CAST(150000 + (85 * s) // 100 AS BIGINT) AS rk FROM c2),
      |c3 AS (SELECT e.dst AS node, CAST(SUM(r.rk // d.deg) AS BIGINT) AS s
      |       FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
      |       GROUP BY 1),
      |r3 AS (SELECT node, CAST(150000 + (85 * s) // 100 AS BIGINT) AS rk FROM c3)
      |SELECT node AS part_id, rk AS rank_fp FROM r3
      |ORDER BY rank_fp DESC, part_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_copurchase_pairs" -> copurchasePairs,
    "q115_copurchase_rank"  -> copurchaseRank,
  )

  val oracles: Map[String, String] = Map(
    "q114_copurchase_pairs" -> copurchasePairsSql,
    "q115_copurchase_rank"  -> copurchaseRankSql,
  )
}
