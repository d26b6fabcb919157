package graft.queries

import graft.SparkSuite
import graft.operators.PrefixJoin
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._

/** Semantics + plan-shape guards for the q124–q127 family. The oracle
  * grades end-to-end results; these pin (a) the kernels against
  * hand-computed answers on graphs/sets the oracle can't localize, (b) the
  * AllPairs filter losslessness on randomized inputs, and (c) the physical
  * plan shapes the scaladoc scale arguments claim.
  */
class Round8cPlanSpec extends SparkSuite {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  // ---- q124 unigram surprisal ----

  test("q124: the only nested-loop join is the 1-row broadcast total") {
    val plan = executed(CorpusOps.unigramSurprisal(spark, sf))
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl <= 1, s"expected at most the 1-row total broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"))
    // the token-score join must be an equi-join, never a broadcast of the
    // full vocabulary's occurrence rows
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("q124: integer floor-log2 surprisal matches hand arithmetic") {
    // corpus "a a a b": N=4, c(a)=3 -> bits(4 DIV 3 = 1) = 1;
    // c(b)=1 -> bits(4) = 3  ("100")
    import spark.implicits._
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val out = docs
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(Seq(4L).toDF("n_total")))
      .select($"token", length(bin(expr("n_total DIV c"))).cast("long").as("surp"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1L, "b" -> 3L))
  }

  // ---- q125 prefix-filtered exact Jaccard ----

  /** Local brute-force Jaccard ≥ p/q over element sets. */
  private def bruteJaccard(sets: Map[Long, Set[String]], p: Int, q: Int): Set[(Long, Long, Int)] =
    (for {
      (d1, s1) <- sets; (d2, s2) <- sets if d1 < d2
      inter = (s1 & s2).size
      if q * inter >= p * (s1.size + s2.size - inter)
    } yield (d1, d2, inter)).toSet

  private def runPrefixJoin(sets: Map[Long, Set[String]], p: Int, q: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    val el = sets.toSeq.flatMap { case (id, s) => s.map(id -> _) }.toDF("id", "el")
    PrefixJoin.jaccardSelfJoin(el, "id", "el", p, q)
      .select($"d1", $"d2", $"inter".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
  }

  test("q125: AllPairs equals brute force on hand-built edge cases") {
    val sets = Map(
      1L -> Set("a", "b", "c", "d"),        // J(1,2)=3/5 >= 1/2
      2L -> Set("a", "b", "c", "e"),
      3L -> Set("a", "b", "c", "d"),        // identical to 1 -> J=1
      4L -> Set("x"),                       // singleton, disjoint
      5L -> Set("x"),                       // identical singletons -> J=1
      6L -> Set("p", "q"),                  // J(6,7)=1/3 < 1/2 -> excluded
      7L -> Set("p", "r"))
    for ((p, q) <- Seq((1, 2), (6, 10), (9, 10)))
      assert(runPrefixJoin(sets, p, q) == bruteJaccard(sets, p, q), s"tau=$p/$q")
  }

  test("q125: filter losslessness on randomized set families") {
    val rnd = new scala.util.Random(42)
    // skewed universe: a few very frequent elements + a rare tail, the
    // regime the prefix filter's rarest-first order is designed for
    val universe = (1 to 30).map(i => s"e$i")
    val sets: Map[Long, Set[String]] = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(8)
      id -> (1 to n).map { _ =>
        val i = math.min(universe.size - 1, (math.abs(rnd.nextGaussian()) * 6).toInt)
        universe(i)
      }.toSet
    }.toMap
    assert(runPrefixJoin(sets, 1, 2) == bruteJaccard(sets, 1, 2))
  }

  test("q125: candidate generation is equi-join only — no cartesian/NL join") {
    val plan = executed(TextOps.prefixJaccard(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"prefix join must stay an equi-join:\n${plan.take(1500)}")
  }

  // ---- q126 triangle counting ----

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    GraphOps.triangleKernel(edges.toDF("p1", "p2"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("q126: K4 — every node degree 3, triangle count 3") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(triangles(k4) == (1L to 4L).map(_ -> (3L, 3L)).toMap)
  }

  test("q126: path graph has zero triangles, diamond shares an edge") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(triangles(path) == Map(
      1L -> (1L, 0L), 2L -> (2L, 0L), 3L -> (2L, 0L), 4L -> (1L, 0L)))
    // diamond: triangles (1,2,3) and (2,3,4) share edge 2-3
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(triangles(diamond) == Map(
      1L -> (2L, 1L), 2L -> (3L, 2L), 3L -> (3L, 2L), 4L -> (2L, 1L)))
  }

  test("q126: wedge join is an equi-join — no cartesian/NL join") {
    val plan = executed(GraphOps.triangleStats(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"triangle join must stay an equi-join:\n${plan.take(1500)}")
  }

  // ---- q127 skip-gram pairs ----

  test("q127: local pair expansion matches the positional definition") {
    import spark.implicits._
    val got = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(explode(CorpusOps.skipgramExpr).as("p"))
      .select($"p.w1", $"p.w2").as[(String, String)].collect().toSeq
    assert(got == Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d", "c" -> "d"))
    // boundary: short arrays produce only in-range pairs, empty-safe
    val short = Seq(Seq("x"), Seq.empty[String]).toDF("t")
      .select(explode(CorpusOps.skipgramExpr).as("p")).count()
    assert(short == 0L)
  }

  test("q127: pair generation is one scan + one aggregate exchange, no join") {
    val plan = executed(CorpusOps.skipgramPairs(spark, sf))
    assert(!plan.contains("Join"), "pair expansion must be local array work")
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  // ---- q128 event trigrams ----

  test("q128: trigram expansion matches the positional definition") {
    import spark.implicits._
    val got = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(explode(EventOps.trigramExpr).as("g"))
      .select($"g.e1", $"g.e2", $"g.e3").as[(String, String, String)].collect().toSeq
    assert(got == Seq(("a", "b", "c"), ("b", "c", "d")))
    // arrays shorter than 3 produce nothing (greatest(size-2, 0) guard)
    val short = Seq(Seq("x", "y"), Seq("x"), Seq.empty[String]).toDF("t")
      .select(explode(EventOps.trigramExpr).as("g")).count()
    assert(short == 0L)
  }

  test("q128: one user shuffle + one count aggregate, no positional self-join") {
    val plan = executed(EventOps.eventTrigrams(spark, sf))
    assert(!plan.contains("Join"), "trigrams must come from local expansion")
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  // ---- q129 MMR diversified retrieval ----

  test("q129: greedy MMR picks relevance first, then diversity") {
    import spark.implicits._
    // query [1,0]; a sits at +0.1 off-axis, b is a near-dup of a, c
    // mirrors a at -0.1 (same relevance, diverse direction). After picking
    // a, score(b) = (rel_b - ~1)/2 < 0 while score(c) = (rel_c -
    // cos(a,c))/2 > 0 — MMR must pick a then c (plain top-2 picks a, b).
    // (A dup aligned exactly WITH the query would be a degenerate test:
    // every candidate's penalty then equals its relevance and λ=1/2
    // legitimately keeps the dup.)
    val vecs = Seq(
      0L -> Array(1f, 0f),            // the query itself (excluded)
      1L -> Array(1f, 0.1f),          // a: best rel
      2L -> Array(1f, 0.1001f),       // b: near-dup of a
      3L -> Array(1f, -0.1f))         // c: same rel as a, diverse
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val got = graft.operators.Mmr.mmrTopK(vecs, q, "vec_id", "embedding",
        poolK = 3, selectK = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((0L, 1, 1L), (0L, 2, 3L)))
  }

  test("q129: selection stops when the pool is exhausted") {
    import spark.implicits._
    val vecs = Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f)).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val got = graft.operators.Mmr.mmrTopK(vecs, q, "vec_id", "embedding",
        poolK = 5, selectK = 4)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((0L, 1, 1L)))
  }
}
