package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("exact dedup keeps min id and counts copies") {
    val withDup = docs.select($"doc_id", $"text")
      .unionByName(docs.filter($"doc_id" === 3).select($"doc_id" + 100000 as "doc_id", $"text"))
    val out = Dedup.exact(withDup, "doc_id", "text")
    assert(out.count() == docs.count(), "dup collapses into existing group")
    val g = out.filter($"doc_id" === 3).head()
    assert(g.getAs[Long]("n_copies") == 2)
  }

  test("shingles: n-gram count = tokens - n + 1 before dedup") {
    val one = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val sh = TextFunctions.shingles(one, "doc_id", "text", 3).collect()
    assert(sh.map(_.getString(1)).sorted.toSeq == Seq("a b c", "b c d"))
  }

  test("minhash LSH recovers every exact-Jaccard>=0.8 pair (recall=1 on planted dups)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data must contain planted near-dups")
    val mh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3, minJaccard = 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
  }

  test("minhash candidates are verified: no pair below the jaccard threshold") {
    val mh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleN = 3, minJaccard = 0.8)
    assert(mh.filter($"jaccard" < 0.8).count() == 0)
  }

  test("simhash is deterministic and order-insensitive to partitioning") {
    val a = Dedup.simhash(docs, "doc_id", "text").orderBy("doc_id").collect()
    val b = Dedup.simhash(docs.repartition(7), "doc_id", "text").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("simhash near-dup pairs find the planted near-dups") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(sim, "doc_id", maxHamming = 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(pairs), s"missed: ${exact -- pairs}")
  }

  test("identical docs have identical minhash signatures, jaccard-1 pairs") {
    val two = Seq((1L, "x y z w v"), (2L, "x y z w v")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(two, "doc_id", "text", 16, 2)
      .select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    val j = Dedup.ngramJaccardPairs(two, "doc_id", "text", 2, 0.0).head()
    assert(j.getAs[Double]("jaccard") == 1.0)
  }
}
