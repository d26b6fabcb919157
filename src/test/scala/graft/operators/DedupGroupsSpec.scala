package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class DedupGroupsSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side union-find — independent reference implementation. */
  private def refComponents(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    n.map(x => x -> find(x)).toMap
  }

  test("connected components match driver-side union-find on a chain+clique graph") {
    val ids = (1L to 12L).toSeq
    // chain 1-2-3-4 (diameter 3), triangle 5-6-7, pair 8-9, singletons 10-12
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L), (9L, 8L))
    val got = DedupGroups.connectedComponents(
        ids.toDF("id"), "id", edges.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(got == refComponents(ids, edges))
  }

  test("dedupCorpus keeps exactly the min-id representative per group") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "payload")
    val pairs = Seq((2L, 1L), (3L, 2L)).toDF("d1", "d2") // {1,2,3} one group
    val out = DedupGroups.dedupCorpus(df, "id", pairs)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 4L))
  }

  test("components over MinHash pairs equal components over exact Jaccard pairs") {
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val exact = Dedup.ngramJaccardPairs(
      Tables.documents(spark, sf), "doc_id", "text", 3, 0.8).select("d1", "d2")
    val mh = Dedup.minhashNearDupPairs(
      Tables.documents(spark, sf), "doc_id", "text", 64, 16, 3, 0.8).select("d1", "d2")
    val a = DedupGroups.connectedComponents(docs, "doc_id", exact)
      .as[(Long, Long)].collect().toSet
    val b = DedupGroups.connectedComponents(docs, "doc_id", mh)
      .as[(Long, Long)].collect().toSet
    assert(a == b, "the scale pair generator must produce the same groups here")
    spark.catalog.clearCache() // minhash caches its shingle table
  }

  test("edges referencing ids outside the vertex set do not merge or leak") {
    val ids = Seq(1L, 2L, 3L).toDF("id")
    // 99 is not a vertex: (2,99) must not link anything, (99,3) must not
    // surface 99 as a rep, and the valid (1,2) edge still merges
    val pairs = Seq((1L, 2L), (2L, 99L), (99L, 3L)).toDF("d1", "d2")
    val got = DedupGroups.connectedComponents(ids, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("propagation round bound throws instead of under-merging") {
    val ids = (1L to 30L).toDF("id")
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("d1", "d2") // diameter 29
    intercept[IllegalStateException] {
      DedupGroups.connectedComponents(ids, "id", chain, maxRounds = 3,
        localSolveMaxEdges = 0L).collect()
    }
  }

  test("size-gated local solve equals the distributed propagation loop") {
    val ids = (1L to 40L).toSeq
    // mixed shapes: a long chain (tests transitive merges), two cliques, a
    // star, reversed/duplicated edges, singletons
    val edges = (1L until 10L).map(i => (i + 1, i)) ++
      Seq((11L, 12L), (12L, 13L), (11L, 13L), (13L, 11L)) ++
      (20L to 25L).map(i => (20L, i)) ++ Seq((30L, 31L), (30L, 31L))
    val local = DedupGroups.connectedComponents(
        ids.toDF("id"), "id", edges.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    val dist = DedupGroups.connectedComponents(
        ids.toDF("id"), "id", edges.toDF("d1", "d2"), localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local == refComponents(ids, edges))
  }
}
