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

  test("simhash near-dup pairs: full recall at jaccard>=0.9, >=90% at 0.8") {
    // SimHash is approximate BY CONTRACT: hamming concentrates near
    // 60·θ/π, so borderline-0.8 pairs can land just past the hamming
    // threshold (and the 6×10 banding only guarantees candidates to
    // distance 5, geometric falloff above). The honest assertions are
    // perfect recall on strong near-dups and high recall overall —
    // demanding recall 1 at 0.8 would pin hash luck, not the operator.
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"d1", $"d2", $"jaccard").as[(Long, Long, Double)].collect()
    assert(exact.nonEmpty, "test data must contain planted near-dups")
    val sim = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(sim, "doc_id", maxHamming = 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val strong = exact.collect { case (d1, d2, j) if j >= 0.9 => (d1, d2) }.toSet
    assert(strong.subsetOf(pairs), s"missed strong pairs: ${strong -- pairs}")
    val all = exact.map { case (d1, d2, _) => (d1, d2) }.toSet
    val recall = (all & pairs).size.toDouble / all.size
    assert(recall >= 0.9, f"recall $recall%.2f < 0.9 (missed ${all -- pairs})")
  }

  test("incremental dedup finds exactly the cross-set pairs of a full dedup") {
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val delta = docs.filter($"doc_id" % 5 === 0)
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text")
    val got = IncrementalDedup.dedupDelta(index, corpus, delta, "doc_id", "text",
        minJaccard = 0.5)
      .select("delta_id", "corpus_id").as[(Long, Long)].collect().toSet
    // reference: full-corpus exact pairs, restricted to the cross-set
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect()
    val expected = full.flatMap { case (a, b) =>
      (a % 5, b % 5) match {
        case (0, x) if x != 0 => Some((a, b))
        case (x, 0) if x != 0 => Some((b, a))
        case _                => None
      }
    }.toSet
    assert(expected.nonEmpty, "split must cross at least one planted pair")
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("incremental dedup refuses an index built with different hash parameters") {
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val delta = docs.filter($"doc_id" % 5 === 0)
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text", bands = 16)
    val ex = intercept[IllegalArgumentException] {
      IncrementalDedup.dedupDelta(index, corpus, delta, "doc_id", "text", bands = 32)
    }
    assert(ex.getMessage.contains("mh64/b16/sh3"), ex.getMessage)
  }

  test("incremental dedup refuses a MIXED-config index (appended batches)") {
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val delta = docs.filter($"doc_id" % 5 === 0)
    // an index appended over time with drifting parameters: a single-row
    // probe would pass (if it sampled the matching half) while candidates
    // from the mismatched half were silently dropped
    val mixed = IncrementalDedup.buildIndex(corpus, "doc_id", "text", bands = 16)
      .union(IncrementalDedup.buildIndex(corpus, "doc_id", "text", bands = 32))
    val ex = intercept[IllegalArgumentException] {
      IncrementalDedup.dedupDelta(mixed, corpus, delta, "doc_id", "text", bands = 16)
    }
    assert(ex.getMessage.contains("mh64/b32/sh3"), ex.getMessage)
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
