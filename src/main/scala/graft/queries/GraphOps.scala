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

  /** q126: per-node triangle counts over the q114 co-purchase graph via
    * DEGREE-ORIENTED wedge join — the standard scale-out triangle algorithm
    * (each undirected edge points low→high in the (degree, id) total order,
    * so every wedge is enumerated at its lowest-degree corner and each
    * triangle is found exactly once; max fan-out per node is O(√|E|)
    * instead of max-degree, which is what makes the self-join survive
    * power-law graphs at 100 TB). Three exchanges: the oriented-edge
    * build, the wedge self-join on the common corner, and the closing-edge
    * semi-join; counts are pure integers. Output: every node with its
    * degree and triangle count (0 for triangle-free nodes).
    */
  def triangleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // mined edges once (see copurchaseRank for the checkpoint rationale)
    val pairs = pairEdges(spark, dir, 2L)
      .select($"p1", $"p2").localCheckpoint(eager = true)
    triangleKernel(pairs)
  }

  /** The kernel, separated for direct unit testing: `pairs` is a canonical
    * undirected edge list (p1 < p2, no duplicates). Returns every node with
    * its degree and triangle count.
    */
  def triangleKernel(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val sym = pairs.select($"p1".as("u"), $"p2".as("v"))
      .unionByName(pairs.select($"p2".as("u"), $"p1".as("v")))
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
    // orient each edge from the (deg, id)-smaller endpoint to the larger
    val ou = sym
      .join(deg.select($"u", $"deg".as("du")), "u")
      .join(deg.select($"u".as("v"), $"deg".as("dv")), "v")
      .filter($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"))
      .select($"u", $"v", $"dv")
    // wedges at the smallest corner; (dv, v) order keeps one per pair
    val wedges = ou.as("a").join(ou.as("b"),
        col("a.u") === col("b.u") &&
          (col("a.dv") < col("b.dv") ||
            (col("a.dv") === col("b.dv") && col("a.v") < col("b.v"))))
      .select(col("a.u").as("x"), col("a.v").as("y"), col("b.v").as("z"))
    // close the wedge: (y, z) must be an oriented edge
    val tris = wedges.join(ou.select($"u".as("y"), $"v".as("z")), Seq("y", "z"))
    val perNode = tris.select($"x".as("node"))
      .unionByName(tris.select($"y".as("node")))
      .unionByName(tris.select($"z".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("tri"))
    deg.select($"u".as("node"), $"deg")
      .join(perNode, Seq("node"), "left")
      .select($"node", $"deg", coalesce($"tri", lit(0L)).as("tri"))
      .orderBy($"node")
  }

  val triangleStatsSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pr AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sym AS (SELECT p1 AS u, p2 AS v FROM pr
      |        UNION ALL SELECT p2, p1 FROM pr),
      |deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
      |ou AS (SELECT s.u, s.v, dv.deg AS dv
      |       FROM sym s
      |       JOIN deg du ON du.u = s.u
      |       JOIN deg dv ON dv.u = s.v
      |       WHERE du.deg < dv.deg OR (du.deg = dv.deg AND s.u < s.v)),
      |wed AS (SELECT a.u AS x, a.v AS y, b.v AS z
      |        FROM ou a JOIN ou b
      |          ON a.u = b.u
      |         AND (a.dv < b.dv OR (a.dv = b.dv AND a.v < b.v))),
      |tri AS (SELECT w.x, w.y, w.z
      |        FROM wed w JOIN ou e ON e.u = w.y AND e.v = w.z),
      |pn AS (SELECT node, COUNT(*) AS tri FROM (
      |         SELECT x AS node FROM tri
      |         UNION ALL SELECT y FROM tri
      |         UNION ALL SELECT z FROM tri) GROUP BY 1)
      |SELECT d.u AS node, CAST(d.deg AS BIGINT) AS deg,
      |       CAST(COALESCE(pn.tri, 0) AS BIGINT) AS tri
      |FROM deg d LEFT JOIN pn ON pn.node = d.u
      |ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_copurchase_pairs" -> copurchasePairs,
    "q115_copurchase_rank"  -> copurchaseRank,
    "q126_triangle_stats"   -> triangleStats,
  )

  val oracles: Map[String, String] = Map(
    "q114_copurchase_pairs" -> copurchasePairsSql,
    "q115_copurchase_rank"  -> copurchaseRankSql,
    "q126_triangle_stats"   -> triangleStatsSql,
  )
}
