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
    // adjacency with out-degree attached once; reused by every iteration —
    // MATERIALIZED once: each unrolled iteration's plan re-executes the
    // deg aggregate + join lineage per reference otherwise (iters× the
    // degree join; the q220 peel lesson applied to the linear case)
    val adj = edges.join(deg, "src").select($"src", $"dst", $"deg")
      .localCheckpoint(eager = true)
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

  /** q215: label-propagation communities over the q114 co-purchase graph —
    * the third graph algorithm beside PageRank (q115) and connected
    * components (q47): LPA finds DENSE communities where CC finds mere
    * reachability, the clustering a catalog/taxonomy pipeline wants.
    * Three SYNCHRONOUS rounds: every node adopts the most frequent label
    * among its neighbors, ties to the smallest label — made deterministic
    * and engine-exact by packing the argmax into one integer key,
    * cnt·2^32 − label, so a plain MAX does frequency-then-min-label in a
    * single aggregate (no window, no arg_max with unspecified ties).
    * Per round: one label join + two hash-aggs, all keyed by node — at
    * 100 TB each round is two exchanges of the label frame, never
    * edge-quadratic. The edge list materializes once (the q115 pattern);
    * rounds are unrolled so Catalyst sees a straight-line plan.
    */
  def labelPropagation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = pairEdges(spark, dir, 2L).localCheckpoint(eager = true)
    // the packing is only an order-isomorphism while labels fit below
    // 2^32 (and counts below 2^31 — ANSI mode throws on that overflow,
    // but an oversized label corrupts the frequency-then-min ordering
    // SILENTLY, identically in engine and oracle, so grading would never
    // catch it — round-9 advice). Fail loudly; larger id spaces need a
    // two-column/struct max instead. One scalar agg on the already-
    // checkpointed edge frame.
    val maxIdRow = pairs.agg(greatest(max($"p1"), max($"p2"))).head()
    // edgeless corpus: the agg over an empty frame is null — skip the guard
    // (everything downstream is empty-safe) instead of NPE-ing on getLong
    if (!maxIdRow.isNullAt(0)) {
      val maxId = maxIdRow.getLong(0)
      require(maxId >= 0 && maxId < 4294967296L,
        s"label-propagation packing (cnt*2^32 - label) needs node ids < 2^32; " +
          s"max id = $maxId — widen the argmax to a struct/two-column aggregate")
    }
    val edges = pairs.select($"p1".as("src"), $"p2".as("dst"))
      .unionByName(pairs.select($"p2".as("src"), $"p1".as("dst")))
    var labels = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    for (_ <- 1 to 3) {
      labels = edges
        .join(labels.select($"node".as("dst"), $"label"), "dst")
        .groupBy($"src", $"label").agg(count(lit(1)).as("cnt"))
        .select($"src", ($"cnt" * lit(4294967296L) - $"label").as("key"))
        .groupBy($"src").agg(max($"key").as("k"))
        .select($"src".as("node"),
          (expr("(k + 4294967295) DIV 4294967296") * lit(4294967296L) - $"k").as("label"))
    }
    labels.groupBy($"label".as("community"))
      .agg(count(lit(1)).as("n_members"), sum($"node").as("sum_nodes"))
      .orderBy($"community")
  }

  val labelPropagationSql: String = {
    def round(i: Int, prev: String) =
      s"""n$i AS (SELECT e.src, l.label, COUNT(*) AS cnt
         |       FROM edges e JOIN $prev l ON e.dst = l.node GROUP BY 1, 2),
         |k$i AS (SELECT src, MAX(cnt * 4294967296 - label) AS k FROM n$i GROUP BY 1),
         |l$i AS (SELECT src AS node,
         |        ((k + 4294967295) // 4294967296) * 4294967296 - k AS label FROM k$i)""".stripMargin
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pr AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |  FROM op a JOIN op b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |edges AS (SELECT p1 AS src, p2 AS dst FROM pr
       |          UNION ALL SELECT p2, p1 FROM pr),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |${round(1, "l0")},
       |${round(2, "l1")},
       |${round(3, "l2")}
       |SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       |  CAST(SUM(node) AS BIGINT) AS sum_nodes
       |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q224: frequent 3-itemsets — the Apriori step above q114's pair
    * mining: parts bought together in ≥2 orders as TRIPLES. The basket
    * 3-way self-join is bounded by basket size (O(7³) per order, never
    * table-quadratic), and the Apriori DOWNWARD-CLOSURE prune semi-joins
    * the (p1,p2) and (p2,p3) legs against the supported-pair list BEFORE
    * the aggregate — candidate volume drops to pairs-supported triples
    * only, which is the property that makes level-wise itemset mining
    * feasible at scale (the support≥2 result is unchanged by the prune —
    * closure guarantees it — so the oracle is the plain HAVING filter).
    */
  def itemsetTriples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val op = orderParts(spark, dir).localCheckpoint(eager = true)
    val sup = pairEdges(spark, dir, 2L).select($"p1", $"p2")
      .localCheckpoint(eager = true)
    val tri = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .join(op.as("c"), col("a.l_orderkey") === col("c.l_orderkey") &&
        col("b.l_partkey") < col("c.l_partkey"))
      .select(col("a.l_orderkey").as("o"),
        col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"),
        col("c.l_partkey").as("p3"))
    tri
      .join(sup, Seq("p1", "p2"), "left_semi")
      .join(sup.select($"p1".as("p2"), $"p2".as("p3")), Seq("p2", "p3"), "left_semi")
      .groupBy($"p1", $"p2", $"p3")
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= 2)
      .orderBy($"p1", $"p2", $"p3")
  }

  val itemsetTriplesSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
      |       COUNT(*) AS support
      |FROM op a
      |JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |JOIN op c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
      |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
      |ORDER BY p1, p2, p3""".stripMargin

  /** q216: multi-source BFS hop distance (3 relaxation rounds) over the
    * co-purchase graph — the reachability-with-DISTANCE query beside
    * q47's plain connectivity: "how many recommendation hops from any
    * anchor product reach this part?" Seeds are every part ≡ 0 (mod 100);
    * each round relaxes d(v) = min(d(v), min over in-neighbors d(u)+1) as
    * one edge⋈label join + one min-aggregate — the frontier never
    * materializes driver-side and each round is one node-keyed exchange.
    * Output is the distance histogram with per-ring id sums (stronger
    * than counts: a node placed in the wrong ring flips two sums).
    * Unreached-within-3 nodes report as distance −1.
    */
  def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = pairEdges(spark, dir, 2L).localCheckpoint(eager = true)
    val edges = pairs.select($"p1".as("src"), $"p2".as("dst"))
      .unionByName(pairs.select($"p2".as("src"), $"p1".as("dst")))
    val nodes = edges.select($"src".as("node")).distinct()
    var dist = nodes.filter($"node" % 100 === 0)
      .select($"node", lit(0L).as("d"))
    // per-round frontier materialized: round k's dist is consumed TWICE in
    // round k+1 (relax join + union), so an unmaterialized lineage doubles
    // per level — 2^rounds recompute by round 3 (the q220 peel fix; the
    // frontier is node-sized, the cheapest frame in the query)
    for (round <- 1 to 3) {
      val next = edges
        .join(dist.select($"node".as("dst"), $"d"), "dst")
        .select($"src".as("node"), ($"d" + 1L).as("d"))
        .unionByName(dist)
        .groupBy($"node").agg(min($"d").as("d"))
        .localCheckpoint(eager = true)
      // free only PRIOR ROUND checkpoints: the initial frontier's lineage
      // contains the pairs checkpoint leaf, which later rounds still need
      if (round > 1) graft.operators.DedupGroups.freeLocalCheckpoint(dist)
      dist = next
    }
    nodes.join(dist, Seq("node"), "left")
      .select($"node", coalesce($"d", lit(-1L)).as("d"))
      .groupBy($"d".as("distance"))
      .agg(count(lit(1)).as("n_nodes"), sum($"node").as("sum_nodes"))
      .orderBy($"distance")
  }

  val bfsHopsSql: String = {
    def relax(i: Int, prev: String) =
      s"""d$i AS (
         |  SELECT node, MIN(d) AS d FROM (
         |    SELECT e.src AS node, l.d + 1 AS d
         |    FROM edges e JOIN $prev l ON e.dst = l.node
         |    UNION ALL SELECT node, d FROM $prev) u
         |  GROUP BY 1)""".stripMargin
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pr AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |  FROM op a JOIN op b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |edges AS (SELECT p1 AS src, p2 AS dst FROM pr
       |          UNION ALL SELECT p2, p1 FROM pr),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM nodes WHERE node % 100 = 0),
       |${relax(1, "d0")},
       |${relax(2, "d1")},
       |${relax(3, "d2")}
       |SELECT COALESCE(l.d, -1) AS distance, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(n.node) AS BIGINT) AS sum_nodes
       |FROM nodes n LEFT JOIN d3 l ON n.node = l.node
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q220: k-core peeling (3 bounded rounds, k=2) — the graph-robustness
    * filter a recommender or fraud pipeline runs before trusting
    * co-occurrence signals: repeatedly delete nodes with degree < k,
    * because a part whose only co-purchase links hang off casual one-off
    * baskets is noise, not structure (k=2 strips the tree-like whiskers
    * and keeps only nodes on cycles). Each peel is one degree aggregate
    * + one semi-join restriction of the edge list — two node-keyed
    * exchanges, nothing pairwise; rounds are UNROLLED as a BOUNDED-round
    * peel (a fixed-depth filter, not a convergence loop — the oracle
    * runs the identical 3 rounds, so the grade is exact at any depth).
    * Graded as the surviving-degree histogram with per-bucket id sums.
    */
  def kCore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = pairEdges(spark, dir, 2L).localCheckpoint(eager = true)
    // each round's survivor edge list is materialized: round k's edges are
    // consumed TWICE in round k+1 (degree aggregate + semi-join restriction),
    // so an unmaterialized lineage re-executes every earlier round's joins
    // 2x per level — 2^rounds recompute of the peel by round 3 (measured
    // 5.2 s vs 2.7 s checkpointed at sf0.1, identical output). Same move as
    // DedupGroups' checkpointed label frames; blocks are freed by the next
    // trial's cleanup / session teardown like every other localCheckpoint
    // in the query tier.
    var edges = pairs.select($"p1".as("src"), $"p2".as("dst"))
      .unionByName(pairs.select($"p2".as("src"), $"p1".as("dst")))
      .localCheckpoint(eager = true)
    for (_ <- 1 to 3) {
      val keep = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= 2).select($"src".as("node"))
      val next = edges
        .join(keep.select($"node".as("src")), Seq("src"), "left_semi")
        .join(keep.select($"node".as("dst")), Seq("dst"), "left_semi")
        .select($"src", $"dst")
        .localCheckpoint(eager = true)
      graft.operators.DedupGroups.freeLocalCheckpoint(edges)
      edges = next
    }
    edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      .groupBy($"deg".as("degree"))
      .agg(count(lit(1)).as("n_nodes"), sum($"src").as("sum_nodes"))
      .orderBy($"degree")
  }

  val kCoreSql: String = {
    def peel(i: Int, prev: String) =
      s"""k$i AS (SELECT src AS node FROM $prev GROUP BY src HAVING COUNT(*) >= 2),
         |e$i AS (SELECT e.src, e.dst FROM $prev e
         |        JOIN k$i a ON e.src = a.node JOIN k$i b ON e.dst = b.node)""".stripMargin
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pr AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |  FROM op a JOIN op b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e0 AS (SELECT p1 AS src, p2 AS dst FROM pr
       |       UNION ALL SELECT p2, p1 FROM pr),
       |${peel(1, "e0")},
       |${peel(2, "e1")},
       |${peel(3, "e2")}
       |SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(src) AS BIGINT) AS sum_nodes
       |FROM (SELECT src, COUNT(*) AS deg FROM e3 GROUP BY src) d
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q217: association rules — the confidence/lift completion of q114's
    * support mining (the recommender/market-basket triple). For each
    * supported pair: conf(a→b) = n12/n1, conf(b→a) = n12/n2, and
    * lift = n12·N/(n1·n2) — each a SINGLE IEEE division of exact 64-bit
    * counts, so values are bit-identical cross-engine with no rounding
    * discipline needed. Item marginals reuse the one deduped basket scan;
    * everything aggregates map-side before the part-keyed exchanges.
    */
  def associationRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val op = orderParts(spark, dir).localCheckpoint(eager = true)
    val total = op.select($"l_orderkey").distinct().count()
    val marg = op.groupBy($"l_partkey").agg(count(lit(1)).as("n1"))
    val pairs = pairEdges(spark, dir, 3L)
    pairs
      .join(marg.select($"l_partkey".as("p1"), $"n1"), "p1")
      .join(marg.select($"l_partkey".as("p2"), $"n1".as("n2")), "p2")
      .select($"p1", $"p2", $"n_orders", $"n1", $"n2",
        ($"n_orders".cast("double") / $"n1".cast("double")).as("conf_12"),
        ($"n_orders".cast("double") / $"n2".cast("double")).as("conf_21"),
        (($"n_orders" * lit(total)).cast("double") / ($"n1" * $"n2").cast("double")).as("lift"))
      .orderBy($"p1", $"p2")
  }

  val associationRulesSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
      |marg AS (SELECT l_partkey, COUNT(*) AS n1 FROM op GROUP BY 1),
      |pr AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT p1, p2, n_orders, m1.n1 AS n1, m2.n1 AS n2,
      |  CAST(n_orders AS DOUBLE) / CAST(m1.n1 AS DOUBLE) AS conf_12,
      |  CAST(n_orders AS DOUBLE) / CAST(m2.n1 AS DOUBLE) AS conf_21,
      |  CAST(n_orders * tot.n AS DOUBLE) / CAST(m1.n1 * m2.n1 AS DOUBLE) AS lift
      |FROM pr JOIN marg m1 ON p1 = m1.l_partkey
      |        JOIN marg m2 ON p2 = m2.l_partkey, tot
      |ORDER BY p1, p2""".stripMargin

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
    "q215_label_propagation" -> labelPropagation,
    "q216_bfs_hops"          -> bfsHops,
    "q217_assoc_rules"       -> associationRules,
    "q220_kcore"             -> kCore,
    "q224_itemset_triples"   -> itemsetTriples,
    "q126_triangle_stats"   -> triangleStats,
  )

  val oracles: Map[String, String] = Map(
    "q114_copurchase_pairs" -> copurchasePairsSql,
    "q115_copurchase_rank"  -> copurchaseRankSql,
    "q126_triangle_stats"   -> triangleStatsSql,
    "q215_label_propagation" -> labelPropagationSql,
    "q216_bfs_hops"          -> bfsHopsSql,
    "q217_assoc_rules"       -> associationRulesSql,
    "q220_kcore"             -> kCoreSql,
    "q224_itemset_triples"   -> itemsetTriplesSql,
  )
}
