package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Product-quantization index: codebook/encode invariants, determinism
  * under repartitioning, and ADC retrieval quality vs the exact baseline.
  * Note PQ approximates the DISTANCE (not the candidate set), so recall
  * is graded on L2 top-k, the metric PQ quantizes.
  */
class PqIndexSpec extends SparkSuite {
  import spark.implicits._

  private val M = 4; private val DSUB = 16; private val K = 16

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val queries = emb.filter($"vec_id" % 100 === 0)

  test("codebooks: M subspaces x K codes of dsub dims") {
    val cb = PqIndex.codebooks(emb, "vec_id", "embedding", M, DSUB, K)
    val rows = cb.collect()
    assert(rows.length <= M * K && rows.length >= M) // empty cells may drop
    assert(cb.select(size($"centroid")).distinct().head().getInt(0) == DSUB)
    assert(cb.select("m").distinct().count() == M)
  }

  test("encoding covers every vector with one code per subspace") {
    val cb = PqIndex.codebooks(emb, "vec_id", "embedding", M, DSUB, K)
    val codes = PqIndex.assign(
      PqIndex.subvectors(emb, "vec_id", "embedding", M, DSUB), "vec_id", cb)
    assert(codes.count() == emb.count() * M)
    assert(codes.groupBy("vec_id").count().filter($"count" =!= M).count() == 0)
  }

  test("ADC top-k is deterministic under repartitioning") {
    val a = PqIndex.adcTopK(emb, queries, "vec_id", "embedding", M, DSUB, K, 5)
      .orderBy("query_id", "rk").collect()
    val b = PqIndex.adcTopK(emb.repartition(7), queries, "vec_id", "embedding", M, DSUB, K, 5)
      .orderBy("query_id", "rk").collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("ADC recall@5 vs exact L2 top-5 clears the quantization floor") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def l2(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { val d = x(i).toDouble - y(i); s += d * d; i += 1 }
      s
    }
    val qs = vecs.filter(_._1 % 100 == 0)
    val exact = qs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q).sortBy { case (n, nv) => (l2(qv, nv), n) }
        .take(5).map(_._1).toSet
    }.toMap
    val pq = PqIndex.adcTopK(emb, queries, "vec_id", "embedding", M, DSUB, K, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) intersect pq.getOrElse(q, Set.empty)).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ mean recall@5 (M=$M, K=$K, shortlist=50 + exact refine): $mean%.2f")
    // ADC-only ranking measures 0.04 here (quantization error exceeds the
    // within-cluster neighbor gaps); the shortlist+refine path measured
    // 0.56 — assert comfortably above the no-refine floor
    assert(mean > 0.35, f"recall $mean%.2f below quantization floor")
  }
}
