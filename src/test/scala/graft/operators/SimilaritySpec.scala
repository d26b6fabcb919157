package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  /** Driver-side brute-force cosine — independent reference implementation. */
  private def refTopK(vecs: Map[Long, Array[Float]], qid: Long, k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(qid)
    vecs.toSeq.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k).map(_._1)
  }

  test("cosineTopK matches driver-side brute force for every query") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val queries = emb.filter($"vec_id" % 50 === 0)
    val got = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .orderBy("query_id", "rk")
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.nonEmpty)
    got.foreach { case (qid, nbrs) =>
      assert(nbrs == refTopK(vecs, qid, 5), s"query $qid")
    }
  }

  test("driver-side hyperplane components equal the in-engine md5 expression") {
    // the literal matrix shipped in the plan must be the exact value the
    // q35 DuckDB oracle (and the pinned expression) derives from md5
    val pairs = for (p <- 0 until 16; d <- Seq(0, 1, 31, 63)) yield (p, d)
    val exprVals = pairs.map { case (p, d) =>
      spark.range(1)
        .select(Similarity.planeComponentExpr(p, lit(d)).as("c"))
        .head().getDouble(0)
    }
    pairs.zip(exprVals).foreach { case ((p, d), ev) =>
      assert(Similarity.planeComponentValue(p, d) == ev, s"plane $p dim $d")
    }
  }

  test("hyperplaneBucket fails loudly on a dims mismatch (no silent bucket collapse)") {
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      bad.select(Similarity.hyperplaneBucket($"embedding", 4, dims = 64)).collect()
    }
    assert(ex.getMessage.contains("expected 64 dims") ||
      Option(ex.getCause).exists(_.getMessage.contains("expected 64 dims")), ex.getMessage)
  }

  test("cosine of a vector with itself is 1") {
    val one = emb.limit(1)
    val self = one.select(Similarity.cosine($"embedding", $"embedding").as("c")).head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("LSH top-k returns only true-cosine-ranked subsets (precision vs brute force)") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val lsh = Similarity.lshCosineTopK(emb, "vec_id", "embedding", k = 5, planes = 16, bandBits = 8)
      .select("query_id", "nbr_id", "cos").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // every reported cosine must equal the true cosine (re-ranking is exact)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    lsh.take(200).foreach { case (q, n, c) =>
      assert(math.abs(c - cos(vecs(q), vecs(n))) < 1e-9)
    }
  }

  test("cosine near-dup pairs match driver-side brute force") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      c = cos(vecs(i), vecs(j)) if c >= 0.4
    } yield (i, j)).toSet
    val got = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "corpus contains at least one pair above 0.4")
  }

  test("blocked near-dup join equals the single-task brute-force twin") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "cos").as[(Long, Long, Double)].collect().toSet
    val blocked = pairs(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4))
    val brute = pairs(Similarity.cosineNearDupPairsBrute(emb, "vec_id", "embedding", 0.4))
    assert(blocked == brute, "block decomposition must not change the pair set")
    // block count must not matter either (coverage of the diagonal keys)
    val b3 = pairs(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4, blocks = 3))
    assert(b3 == brute)
  }

  test("LSH bucketing is deterministic across partitionings") {
    val a = Similarity.lshCosineTopK(emb, "vec_id", "embedding", 5, 16, 8)
      .orderBy("query_id", "rk").collect()
    val b = Similarity.lshCosineTopK(emb.repartition(7), "vec_id", "embedding", 5, 16, 8)
      .orderBy("query_id", "rk").collect()
    assert(a.toSeq == b.toSeq)
  }
}
