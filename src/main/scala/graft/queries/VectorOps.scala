package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Mmr, Similarity}
import Tables._

/** Embedding / similarity-search queries over `embeddings` (64-dim float
  * vectors). Vector norms are oracle-checked via exact-decimal sums of
  * squares (order-independent, unlike float folds); every ANN query —
  * brute force, hyperplane LSH, IVF — is DuckDB-oracled ids-only, with
  * cosine VALUES asserted against driver-side brute force in
  * SimilaritySpec.
  */
object VectorOps {

  /** Per-vector stats with exact-decimal sum of squares: cross-engine
    * deterministic because decimal addition commutes (a double fold would
    * depend on summation order).
    */
  def vecStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    // exact-decimal sum of squares via explode + decimal SUM (order-
    // independent; a double fold would depend on summation order, and a
    // decimal fold can't reach a type fixpoint under Spark's precision
    // promotion rules)
    val sq = emb
      .select($"vec_id", explode($"embedding").as("x"))
      .groupBy($"vec_id")
      // exact decimal sum, then round through int64-backed decimal(18,9):
      // DECIMAL(38,*)→DOUBLE conversion differs across engines in the last
      // ulp (int128 path), DECIMAL(18,9)→DOUBLE is a single correctly-
      // rounded int64/1e9 division in both
      .agg(sum(($"x".cast("double") * $"x".cast("double")).cast("decimal(38,15)"))
        .cast("decimal(18,9)").cast("double").as("sumsq"))
    emb.select(
        $"vec_id",
        $"label",
        size($"embedding").cast("long").as("dim"),
        element_at($"embedding", 1).cast("double").as("first_dim"))
      .join(sq, Seq("vec_id"))
      .select($"vec_id", $"label", $"dim", $"sumsq", $"first_dim")
      .orderBy($"vec_id")
  }

  val vecStatsSql: String =
    """SELECT vec_id, label,
      | len(embedding) AS dim,
      | CAST(CAST(ROUND(list_sum(list_transform(embedding,
      |   x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,15)))), 9) AS DECIMAL(18,9)) AS DOUBLE) AS sumsq,
      | CAST(embedding[1] AS DOUBLE) AS first_dim
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** Brute-force exact cosine top-5 for a 1-in-50 query subset against the
    * full corpus — the ANN baseline. Broadcast-nested-loop: the corpus
    * never shuffles.
    */
  /** Output is ids-only: the ranking is oracle-checked against DuckDB's
    * list_cosine_similarity (verified to agree rank-for-rank); the cosine
    * VALUES differ in float path and are instead asserted against a
    * driver-side double reference in SimilaritySpec.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val queries = emb.filter($"vec_id" % 50 === 0)
    Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"rk", $"nbr_id")
      .orderBy($"query_id", $"rk")
  }

  /** q129: MMR-diversified retrieval (see [[graft.operators.Mmr]]) — the
    * same 1-in-50 query subset, top-12 candidate pool, 4 greedy picks at
    * λ=1/2. Ids-only output (the q34 trick); the oracle unrolls the
    * greedy selection step by step in SQL, double-cast lists so both
    * engines accumulate in doubles.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val queries = emb.filter($"vec_id" % 50 === 0)
    Mmr.mmrTopK(emb, queries, "vec_id", "embedding", poolK = 12, selectK = 4)
  }

  val mmrRerankSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id % 50 = 0),
      |sc AS (SELECT query_id, vec_id AS cid, embedding::DOUBLE[] AS cv,
      |         list_cosine_similarity(qv, embedding::DOUBLE[]) AS rel
      |       FROM q JOIN embeddings ON vec_id <> query_id),
      |pool AS (SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                 ORDER BY rel DESC, cid) AS rk FROM sc)
      |  WHERE rk <= 12),
      |s1 AS (SELECT query_id, cid, cv FROM pool WHERE rk = 1),
      |c2 AS (SELECT p.query_id, p.cid, p.cv, p.rel,
      |         (SELECT MAX(list_cosine_similarity(p.cv, s.cv)) FROM s1 s
      |          WHERE s.query_id = p.query_id) AS ms
      |       FROM pool p
      |       WHERE NOT EXISTS (SELECT 1 FROM s1 x
      |                         WHERE x.query_id = p.query_id AND x.cid = p.cid)),
      |s2 AS (SELECT query_id, cid, cv FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                 ORDER BY (rel - ms) / 2 DESC, cid) AS rr FROM c2)
      |  WHERE rr = 1),
      |sel2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
      |c3 AS (SELECT p.query_id, p.cid, p.cv, p.rel,
      |         (SELECT MAX(list_cosine_similarity(p.cv, s.cv)) FROM sel2 s
      |          WHERE s.query_id = p.query_id) AS ms
      |       FROM pool p
      |       WHERE NOT EXISTS (SELECT 1 FROM sel2 x
      |                         WHERE x.query_id = p.query_id AND x.cid = p.cid)),
      |s3 AS (SELECT query_id, cid, cv FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                 ORDER BY (rel - ms) / 2 DESC, cid) AS rr FROM c3)
      |  WHERE rr = 1),
      |sel3 AS (SELECT * FROM sel2 UNION ALL SELECT * FROM s3),
      |c4 AS (SELECT p.query_id, p.cid, p.cv, p.rel,
      |         (SELECT MAX(list_cosine_similarity(p.cv, s.cv)) FROM sel3 s
      |          WHERE s.query_id = p.query_id) AS ms
      |       FROM pool p
      |       WHERE NOT EXISTS (SELECT 1 FROM sel3 x
      |                         WHERE x.query_id = p.query_id AND x.cid = p.cid)),
      |s4 AS (SELECT query_id, cid, cv FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                 ORDER BY (rel - ms) / 2 DESC, cid) AS rr FROM c4)
      |  WHERE rr = 1)
      |SELECT query_id, step, cid AS nbr_id FROM (
      |  SELECT query_id, 1 AS step, cid FROM s1
      |  UNION ALL SELECT query_id, 2, cid FROM s2
      |  UNION ALL SELECT query_id, 3, cid FROM s3
      |  UNION ALL SELECT query_id, 4, cid FROM s4)
      |ORDER BY query_id, step""".stripMargin

  val cosineTopKSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
      |s AS (SELECT query_id, vec_id AS nbr_id,
      |        list_cosine_similarity(qv, embedding) AS cos
      |      FROM q JOIN embeddings ON vec_id <> query_id),
      |r AS (SELECT query_id, nbr_id,
      |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |      FROM s)
      |SELECT query_id, rk, nbr_id FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** LSH-bucketed ANN over the whole corpus (16 hyperplanes, 8-bit bands).
    * Fully DuckDB-oracled: the hyperplanes are generated from the portable
    * md5-derived hash (not xxhash64), so the oracle recomputes the whole
    * pipeline — hyperplane family, projections, sign bits, banding,
    * candidate join, exact-cosine re-rank — in SQL. Output is ids-only
    * (the q34 trick): ranks agree rank-for-rank while raw cosine floats
    * differ in engine-internal paths; the cosine VALUES are asserted
    * against a driver-side double reference in SimilaritySpec.
    */
  def cosineLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.lshCosineTopK(embeddings(spark, dir), "vec_id", "embedding",
        k = 5, planes = 16, bandBits = 8)
      .select($"query_id", $"rk", $"nbr_id")
      .orderBy($"query_id", $"rk")
  }

  /** The full hyperplane-LSH pipeline in DuckDB, mirroring
    * [[Similarity.hyperplaneBucket]] + [[Similarity.lshCosineTopK]]
    * (planes=16, bandBits=8 → 2 bands). The hyperplane component for
    * (plane, dim) is ((md5_60("plane|dim") % 2000001)/1e6) − 1, exactly
    * as Spark computes it; projections are double sums (sign flips would
    * need |proj| < 1e-13 — not present in this corpus).
    */
  val cosineLshSql: String =
    """WITH planes AS (
      |  SELECT p.plane, d.dim,
      |    ((('0x' || substr(md5(p.plane::VARCHAR || '|' || d.dim::VARCHAR), 1, 15))::BIGINT
      |       % 2000001)::DOUBLE / 1000000.0) - 1.0 AS comp
      |  FROM generate_series(0, 15) AS p(plane)
      |  CROSS JOIN generate_series(0, 63) AS d(dim)),
      |ex AS (
      |  SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
      |         unnest(CAST(embedding AS DOUBLE[])) AS x
      |  FROM embeddings),
      |proj AS (
      |  SELECT ex.vec_id, pl.plane, SUM(ex.x * pl.comp) AS proj
      |  FROM ex JOIN planes pl ON pl.dim = ex.dim
      |  GROUP BY ex.vec_id, pl.plane),
      |sig AS (
      |  SELECT vec_id,
      |    SUM(CASE WHEN proj > 0 THEN (1::BIGINT << plane) ELSE 0::BIGINT END) AS bucket
      |  FROM proj GROUP BY vec_id),
      |banded AS (
      |  SELECT vec_id, b.band, (bucket >> (b.band * 8)) & 255 AS bandval
      |  FROM sig CROSS JOIN generate_series(0, 1) AS b(band)),
      |cand AS (
      |  SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS nbr_id
      |  FROM banded l JOIN banded r ON l.band = r.band AND l.bandval = r.bandval
      |  WHERE l.vec_id <> r.vec_id),
      |scored AS (
      |  SELECT c.query_id, c.nbr_id,
      |    list_cosine_similarity(q.embedding, n.embedding) AS cos
      |  FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
      |              JOIN embeddings n ON n.vec_id = c.nbr_id),
      |r AS (
      |  SELECT query_id, nbr_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |  FROM scored)
      |SELECT query_id, rk, nbr_id FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** IVF-flat ANN (K=8, nprobe=4, one Lloyd iteration; recall also
    * measured against brute force in IvfIndexSpec — 0.88 recall@5).
    * Ids-only output: every IVF stage is hash-free (lowest-id seeds,
    * grouped-average Lloyd, cosine-argmax assignment), so the whole
    * index build + probe is mirrored in DuckDB SQL below.
    */
  def cosineIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    graft.operators.IvfIndex.search(emb, emb.filter($"vec_id" % 50 === 0),
        "vec_id", "embedding", k = 5, numCentroids = 8, nprobe = 4)
      .select($"query_id", $"rk", $"nbr_id")
      .orderBy($"query_id", $"rk")
  }

  /** The full IVF pipeline in DuckDB: seeds → one Lloyd step (per-dim
    * grouped averages, re-rounded through REAL like the Spark float
    * centroids) → assignment → nprobe probing → exact cosine top-5.
    */
  /** The IVF index-build pipeline (seeds → one Lloyd step → final
    * assignment `a1`) as a reusable CTE prefix — shared verbatim by the
    * q42 search oracle and the q83 semantic-dedup oracle so the two
    * cannot drift.
    */
  val ivfAssignCte: String =
    """WITH seeds AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS centroid_id,
      |         embedding AS centroid
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8) t),
      |a0 AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, s.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, s.centroid) DESC, s.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN seeds s) t WHERE rn = 1),
      |cmeans AS (
      |  SELECT centroid_id, dim, AVG(x) AS m FROM (
      |    SELECT a0.centroid_id,
      |      unnest(range(1, len(e.embedding)+1)) AS dim,
      |      unnest(CAST(e.embedding AS DOUBLE[])) AS x
      |    FROM embeddings e JOIN a0 USING (vec_id)) t
      |  GROUP BY centroid_id, dim),
      |c1 AS (
      |  SELECT centroid_id, CAST(list(m ORDER BY dim) AS REAL[]) AS centroid
      |  FROM cmeans GROUP BY centroid_id),
      |a1 AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN c1 c) t WHERE rn = 1)""".stripMargin

  val cosineIvfSql: String = ivfAssignCte +
    """,
      |probes AS (
      |  SELECT query_id, centroid_id FROM (
      |    SELECT e.vec_id AS query_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN c1 c WHERE e.vec_id % 50 = 0) t WHERE rn <= 4),
      |scored AS (
      |  SELECT p.query_id, n.vec_id AS nbr_id,
      |    list_cosine_similarity(q.embedding, n.embedding) AS cos
      |  FROM probes p
      |  JOIN embeddings q ON q.vec_id = p.query_id
      |  JOIN a1 ON a1.centroid_id = p.centroid_id
      |  JOIN embeddings n ON n.vec_id = a1.vec_id
      |  WHERE n.vec_id <> p.query_id),
      |r AS (
      |  SELECT query_id, nbr_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |  FROM scored)
      |SELECT query_id, rk, nbr_id FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** q72: retrieval-quality grade for the IVF index — recall@5 of
    * [[graft.operators.IvfIndex.search]] against the q34 brute-force
    * ground truth, per query vector. Both sides are the exact pipelines
    * q34/q42 already run; the DuckDB oracle recomputes BOTH from the same
    * vectors (the q34 + q42 SQL, CTE-renamed, joined on (query_id,
    * nbr_id)), so a recall regression — not just a contract change —
    * hash-mismatches. n_hit is integral and recall = n_hit/5 is an exact
    * binary fraction, so the doubles compare exactly cross-engine.
    * IvfIndexSpec asserts the mean recall stays at/above the documented
    * nprobe=4/K=8 bound.
    */
  def cosineIvfRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"nbr_id")
    val ivf = graft.operators.IvfIndex.search(emb, queries,
        "vec_id", "embedding", k = 5, numCentroids = 8, nprobe = 4)
      .select($"query_id", $"nbr_id").withColumn("hit", lit(1))
    exact.join(ivf, Seq("query_id", "nbr_id"), "left")
      .groupBy($"query_id")
      .agg(sum(coalesce($"hit", lit(0))).cast("long").as("n_hit"))
      .withColumn("recall", $"n_hit" / lit(5.0))
      .select($"query_id", $"n_hit", $"recall")
      .orderBy($"query_id")
  }

  /** q34's exact top-5 and q42's IVF top-5 recomputed side by side
    * (CTEs renamed to avoid collisions), joined into per-query recall.
    */
  val cosineIvfRecallSql: String =
    """WITH exq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
      |exs AS (SELECT query_id, vec_id AS nbr_id,
      |          list_cosine_similarity(qv, embedding) AS cos
      |        FROM exq JOIN embeddings ON vec_id <> query_id),
      |exr AS (SELECT query_id, nbr_id,
      |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |        FROM exs),
      |exact AS (SELECT query_id, nbr_id FROM exr WHERE rk <= 5),
      |seeds AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS centroid_id,
      |         embedding AS centroid
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8) t),
      |a0 AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, s.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, s.centroid) DESC, s.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN seeds s) t WHERE rn = 1),
      |cmeans AS (
      |  SELECT centroid_id, dim, AVG(x) AS m FROM (
      |    SELECT a0.centroid_id,
      |      unnest(range(1, len(e.embedding)+1)) AS dim,
      |      unnest(CAST(e.embedding AS DOUBLE[])) AS x
      |    FROM embeddings e JOIN a0 USING (vec_id)) t
      |  GROUP BY centroid_id, dim),
      |c1 AS (
      |  SELECT centroid_id, CAST(list(m ORDER BY dim) AS REAL[]) AS centroid
      |  FROM cmeans GROUP BY centroid_id),
      |a1 AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN c1 c) t WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, centroid_id FROM (
      |    SELECT e.vec_id AS query_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN c1 c WHERE e.vec_id % 50 = 0) t WHERE rn <= 4),
      |ivs AS (
      |  SELECT p.query_id, n.vec_id AS nbr_id,
      |    list_cosine_similarity(q.embedding, n.embedding) AS cos
      |  FROM probes p
      |  JOIN embeddings q ON q.vec_id = p.query_id
      |  JOIN a1 ON a1.centroid_id = p.centroid_id
      |  JOIN embeddings n ON n.vec_id = a1.vec_id
      |  WHERE n.vec_id <> p.query_id),
      |ivr AS (
      |  SELECT query_id, nbr_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |  FROM ivs),
      |ivf AS (SELECT query_id, nbr_id FROM ivr WHERE rk <= 5)
      |SELECT e.query_id,
      |  CAST(SUM(CASE WHEN i.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  SUM(CASE WHEN i.nbr_id IS NOT NULL THEN 1 ELSE 0 END) / 5.0 AS recall
      |FROM exact e LEFT JOIN ivf i ON i.query_id = e.query_id AND i.nbr_id = e.nbr_id
      |GROUP BY e.query_id
      |ORDER BY e.query_id""".stripMargin

  /** Embedding-cosine near-dup pairs via the blocked exact self-join
    * (threshold 0.4 — the synthetic corpus's max off-diagonal cosine is
    * ~0.51, so the result is small but non-empty). Output is ids-only so
    * the DuckDB oracle (list_cosine_similarity, the q34 trick) compares
    * set membership, not float renderings; the cosine VALUES are asserted
    * against a driver-side double reference in SimilaritySpec.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.cosineNearDupPairs(embeddings(spark, dir), "vec_id", "embedding", 0.4)
      .select($"d1", $"d2")
      .orderBy($"d1", $"d2")
  }

  val embeddingNearDupSql: String =
    """SELECT a.vec_id AS d1, b.vec_id AS d2
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
      |ORDER BY d1, d2""".stripMargin

  /** q78: retrieval-quality grade for the hyperplane LSH — recall@5 of
    * [[Similarity.lshCosineTopK]] against the q34 brute-force ground
    * truth, per query vector (the q72 pattern applied to the second ANN
    * path). The per-query filter pushes through the banded self-join's
    * query side, so only the graded subset is ranked. The oracle
    * recomputes BOTH pipelines (q34 + q35 SQL, CTE-renamed) and joins
    * them, so an LSH recall regression hash-mismatches rather than just
    * moving a spec number.
    */
  def cosineLshRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"nbr_id")
    val lsh = Similarity.lshCosineTopK(emb, "vec_id", "embedding",
        k = 5, planes = 16, bandBits = 8)
      .filter($"query_id" % 50 === 0)
      .select($"query_id", $"nbr_id").withColumn("hit", lit(1))
    exact.join(lsh, Seq("query_id", "nbr_id"), "left")
      .groupBy($"query_id")
      .agg(sum(coalesce($"hit", lit(0))).cast("long").as("n_hit"))
      .withColumn("recall", $"n_hit" / lit(5.0))
      .select($"query_id", $"n_hit", $"recall")
      .orderBy($"query_id")
  }

  /** q34's exact top-5 and q35's LSH top-5 recomputed side by side,
    * joined into per-query recall (n_hit/5 is an exact binary fraction —
    * doubles compare exactly cross-engine).
    */
  val cosineLshRecallSql: String =
    """WITH exq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
      |exs AS (SELECT query_id, vec_id AS nbr_id,
      |          list_cosine_similarity(qv, embedding) AS cos
      |        FROM exq JOIN embeddings ON vec_id <> query_id),
      |exr AS (SELECT query_id, nbr_id,
      |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |        FROM exs),
      |exact AS (SELECT query_id, nbr_id FROM exr WHERE rk <= 5),
      |planes AS (
      |  SELECT p.plane, d.dim,
      |    ((('0x' || substr(md5(p.plane::VARCHAR || '|' || d.dim::VARCHAR), 1, 15))::BIGINT
      |       % 2000001)::DOUBLE / 1000000.0) - 1.0 AS comp
      |  FROM generate_series(0, 15) AS p(plane)
      |  CROSS JOIN generate_series(0, 63) AS d(dim)),
      |ex AS (
      |  SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
      |         unnest(CAST(embedding AS DOUBLE[])) AS x
      |  FROM embeddings),
      |proj AS (
      |  SELECT ex.vec_id, pl.plane, SUM(ex.x * pl.comp) AS proj
      |  FROM ex JOIN planes pl ON pl.dim = ex.dim
      |  GROUP BY ex.vec_id, pl.plane),
      |sig AS (
      |  SELECT vec_id,
      |    SUM(CASE WHEN proj > 0 THEN (1::BIGINT << plane) ELSE 0::BIGINT END) AS bucket
      |  FROM proj GROUP BY vec_id),
      |banded AS (
      |  SELECT vec_id, b.band, (bucket >> (b.band * 8)) & 255 AS bandval
      |  FROM sig CROSS JOIN generate_series(0, 1) AS b(band)),
      |cand AS (
      |  SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS nbr_id
      |  FROM banded l JOIN banded r ON l.band = r.band AND l.bandval = r.bandval
      |  WHERE l.vec_id <> r.vec_id AND l.vec_id % 50 = 0),
      |scored AS (
      |  SELECT c.query_id, c.nbr_id,
      |    list_cosine_similarity(q.embedding, n.embedding) AS cos
      |  FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
      |              JOIN embeddings n ON n.vec_id = c.nbr_id),
      |lr AS (
      |  SELECT query_id, nbr_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |  FROM scored),
      |lsh AS (SELECT query_id, nbr_id FROM lr WHERE rk <= 5)
      |SELECT e.query_id,
      |  CAST(SUM(CASE WHEN l.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  SUM(CASE WHEN l.nbr_id IS NOT NULL THEN 1 ELSE 0 END) / 5.0 AS recall
      |FROM exact e LEFT JOIN lsh l ON l.query_id = e.query_id AND l.nbr_id = e.nbr_id
      |GROUP BY e.query_id
      |ORDER BY e.query_id""".stripMargin

  /** q83: semantic dedup (SemDeDup) — IVF-cluster the corpus (K=8, one
    * Lloyd step, the exact q42 index build), then drop every vector with
    * a lower-id same-cluster neighbor at cosine ≥ 0.4 (q43's threshold:
    * the corpus max off-diagonal cosine is ~0.51, and the nearest
    * observed cosine to 0.4 sits 1.3e-4 away — far outside float noise).
    * Ids-only output; the oracle recomputes the whole pipeline from
    * [[ivfAssignCte]] plus the within-cluster NOT EXISTS prune.
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.SemanticDedup.keptAfterDedup(
        embeddings(spark, dir), "vec_id", "embedding",
        numCentroids = 8, minCosine = 0.4)
      .orderBy($"vec_id")
  }

  val semanticDedupSql: String = ivfAssignCte +
    """
      |SELECT a.vec_id, a.centroid_id
      |FROM a1 a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM a1 b
      |  JOIN embeddings ea ON ea.vec_id = a.vec_id
      |  JOIN embeddings eb ON eb.vec_id = b.vec_id
      |  WHERE b.centroid_id = a.centroid_id AND b.vec_id < a.vec_id
      |    AND list_cosine_similarity(ea.embedding, eb.embedding) >= 0.4)
      |ORDER BY a.vec_id""".stripMargin

  /** q98: hybrid retrieval — reciprocal-rank fusion of the sparse lexical
    * ranking (q95's integer-IDF posting-list scorer for the 3-term query)
    * with a dense cosine ranking against doc 0's embedding (the corpus
    * shares one id space: `vec_id` ≡ `doc_id`). Each branch produces its
    * top-20 — the sparse side via `TakeOrderedAndProject` (distributed
    * partial top-k; the trailing window ranks only the 20 survivors), the
    * dense side via the broadcast-query brute-force kernel — and
    * [[graft.operators.HybridRetrieval.rrfFuse]] combines them with
    * integer RRF weights, so `rrf_score` is a BIGINT the oracle
    * reproduces exactly. The output is the fused top-10 with each
    * branch's rank kept (null where only one scorer surfaced the doc).
    */
  def hybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val terms = Seq("order", "fast", "free")
    val sparseScores = graft.operators.InvertedIndex.build(docs, "doc_id", "text")
      .filter($"term".isin(terms: _*))
      .select($"term", expr(s"$n div df").as("w"), explode($"postings").as("p"))
      .select($"p.doc_id".as("doc_id"),
        (size($"p.positions").cast("long") * $"w").as("part"))
      .groupBy($"doc_id").agg(sum($"part").as("score"))
    val sparseTop = sparseScores
      .orderBy($"score".desc, $"doc_id".asc).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy($"score".desc, $"doc_id".asc)))
      .select($"doc_id", $"rank")
    val emb = embeddings(spark, dir)
    val denseTop = Similarity
      .cosineTopK(emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 20)
      .select($"nbr_id".as("doc_id"), $"rk".as("rank"))
    graft.operators.HybridRetrieval
      .rrfFuse(Seq("sparse" -> sparseTop, "dense" -> denseTop), "doc_id", "rank")
      .orderBy($"rrf_score".desc, $"doc_id".asc).limit(10)
      .select($"doc_id", $"sparse_rank", $"dense_rank", $"rrf_score")
  }

  val hybridRetrievalSql: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tk WHERE tok IN ('order','fast','free')
      |  GROUP BY doc_id, tok),
      |dfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |sp AS (
      |  SELECT tf.doc_id, SUM(tf.tf * (nn.n // dfr.df)) AS score
      |  FROM tf JOIN dfr ON tf.tok = dfr.tok CROSS JOIN nn
      |  GROUP BY tf.doc_id),
      |sr AS (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS sparse_rank
      |  FROM sp QUALIFY sparse_rank <= 20),
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |ds AS (
      |  SELECT vec_id AS doc_id, list_cosine_similarity(qv, embedding) AS cos
      |  FROM q CROSS JOIN embeddings WHERE vec_id <> 0),
      |dr AS (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS dense_rank
      |  FROM ds QUALIFY dense_rank <= 20),
      |f AS (
      |  SELECT COALESCE(sr.doc_id, dr.doc_id) AS doc_id,
      |    sr.sparse_rank, dr.dense_rank,
      |    COALESCE(1000000 // (60 + sr.sparse_rank), 0)
      |      + COALESCE(1000000 // (60 + dr.dense_rank), 0) AS rrf
      |  FROM sr FULL JOIN dr ON sr.doc_id = dr.doc_id)
      |SELECT doc_id, sparse_rank, dense_rank, CAST(rrf AS BIGINT) AS rrf_score
      |FROM f
      |ORDER BY rrf_score DESC, doc_id
      |LIMIT 10""".stripMargin

  /** q135: product-quantization ANN ([[graft.operators.PqIndex]]) — 4
    * subspaces × 16 dims, 16 codewords each (64-dim floats compressed to
    * 4 code bytes), one Lloyd step, ADC shortlist-50 + exact re-rank
    * top-5 for the q34 query set (the FAISS IVFPQ+refine shape). The
    * oracle rebuilds the ENTIRE pipeline in DuckDB: seed slices, argmin
    * assignment, float-rounded Lloyd means, re-assignment, the query
    * distance table, the fixed-order ((d0+d1)+d2)+d3 ADC sum, and the
    * exact refinement join —
    * distances are bit-identical cross-engine (double accumulation over
    * promoted floats), and like q42 the graded columns are ids and ranks
    * only. PqIndexSpec grades recall@5 against the exact baseline.
    */
  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    graft.operators.PqIndex.adcTopK(emb, emb.filter($"vec_id" % 50 === 0),
        "vec_id", "embedding", m = 4, dsub = 16, k = 16, topk = 5)
      .orderBy($"query_id", $"rk")
  }

  private def pqD2(a: String, b: String): String =
    s"(list_inner_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))" +
      s" - 2*list_inner_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])))" +
      s" + list_inner_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  val pqAnnSql: String =
    s"""WITH sub AS (
       |  SELECT vec_id, g.m AS m,
       |         list_slice(embedding, 1 + 16*g.m, 16*(g.m+1)) AS sv
       |  FROM embeddings CROSS JOIN generate_series(0, 3) AS g(m)),
       |seeds AS (
       |  SELECT m, CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) AS INTEGER) - 1 AS code_id,
       |         sv AS centroid
       |  FROM sub
       |  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
       |a0 AS (
       |  SELECT vec_id, m, code_id FROM (
       |    SELECT s.vec_id, s.m, c.code_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.m, s.vec_id
       |        ORDER BY ${pqD2("s.sv", "c.centroid")} ASC, c.code_id) AS rn
       |    FROM sub s JOIN seeds c ON c.m = s.m) t WHERE rn = 1),
       |cm AS (
       |  SELECT m, code_id, dim, AVG(x) AS mu FROM (
       |    SELECT a0.m, a0.code_id,
       |      unnest(range(1, len(s.sv)+1)) AS dim,
       |      unnest(CAST(s.sv AS DOUBLE[])) AS x
       |    FROM sub s JOIN a0 ON a0.vec_id = s.vec_id AND a0.m = s.m) t
       |  GROUP BY m, code_id, dim),
       |c1 AS (
       |  SELECT m, code_id, CAST(list(mu ORDER BY dim) AS REAL[]) AS centroid
       |  FROM cm GROUP BY m, code_id),
       |codes AS (
       |  SELECT vec_id AS nbr_id, m, code_id FROM (
       |    SELECT s.vec_id, s.m, c.code_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.m, s.vec_id
       |        ORDER BY ${pqD2("s.sv", "c.centroid")} ASC, c.code_id) AS rn
       |    FROM sub s JOIN c1 c ON c.m = s.m) t WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, m, sv FROM sub WHERE vec_id % 50 = 0),
       |dtab AS (
       |  SELECT q.query_id, c.m, c.code_id, ${pqD2("q.sv", "c.centroid")} AS d
       |  FROM qs q JOIN c1 c ON c.m = q.m),
       |sc AS (
       |  SELECT d.query_id, k.nbr_id,
       |    MAX(CASE WHEN d.m = 0 THEN d.d END) AS d0,
       |    MAX(CASE WHEN d.m = 1 THEN d.d END) AS d1,
       |    MAX(CASE WHEN d.m = 2 THEN d.d END) AS d2,
       |    MAX(CASE WHEN d.m = 3 THEN d.d END) AS d3
       |  FROM codes k JOIN dtab d ON d.m = k.m AND d.code_id = k.code_id
       |  WHERE k.nbr_id <> d.query_id
       |  GROUP BY d.query_id, k.nbr_id),
       |short AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY ((d0 + d1) + d2) + d3 ASC, nbr_id) AS rn
       |    FROM sc) t WHERE rn <= 50),
       |r AS (
       |  SELECT s.query_id, s.nbr_id,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY ${pqD2("q.embedding", "n.embedding")} ASC, s.nbr_id) AS rk
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.query_id
       |  JOIN embeddings n ON n.vec_id = s.nbr_id)
       |SELECT query_id, rk, nbr_id FROM r WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin

  /** q170: cluster labeling via c-TF-IDF (the BERTopic topic-word shape,
    * Grootendorst 2022): embed-cluster the corpus with the SAME IVF
    * pipeline q42/q83 grade (seeds → one Lloyd step → assignment — the
    * oracle reuses `ivfAssignCte` verbatim, so the three queries share
    * one clustering that cannot drift), join cluster ids onto the
    * aligned documents, and rank each cluster's most characteristic
    * tokens: score = tf_in_cluster × bits(N_docs div df) — the integer
    * floor-log2 idf (q124's discipline), deterministic ties broken by
    * token. Top-5 per cluster; one (cluster, token) aggregate + one
    * token-keyed df join; the embeddings never shuffle beyond the
    * broadcast-centroid assignment.
    */
  def clusterLabels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(spark, dir)
    val seeds = graft.operators.IvfIndex.seedCentroids(emb, "vec_id", "embedding", 8)
    val cent = graft.operators.IvfIndex.lloydStep(emb, "vec_id", "embedding", seeds)
    val assigned = graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", cent)
    val docTok = documents(spark, dir)
      .join(assigned.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select($"centroid_id", $"doc_id",
        explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .filter($"tok" =!= "")
    val ctf = docTok.groupBy($"centroid_id", $"tok").agg(count(lit(1)).as("ctf"))
    val dfreq = docTok.select($"doc_id", $"tok").distinct()
      .groupBy($"tok").agg(count(lit(1)).as("dfreq"))
    val nd = docTok.agg(countDistinct($"doc_id").as("nd")) // 1 row
    val scored = ctf.join(dfreq, "tok").crossJoin(broadcast(nd))
      .select($"centroid_id", $"tok", $"ctf", $"dfreq",
        ($"ctf" * length(bin(expr("nd DIV dfreq"))).cast("long")).as("score"))
    val w = Window.partitionBy($"centroid_id").orderBy($"score".desc, $"tok".asc)
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"centroid_id", $"rk", $"tok", $"ctf", $"dfreq", $"score")
      .orderBy($"centroid_id", $"rk")
  }

  val clusterLabelsSql: String = ivfAssignCte +
    """,
      |dt AS (
      |  SELECT a1.centroid_id, d.doc_id, unnest(string_split(d.text, ' ')) AS tok
      |  FROM documents d JOIN a1 ON a1.vec_id = d.doc_id),
      |dt2 AS (SELECT * FROM dt WHERE tok <> ''),
      |ctf AS (SELECT centroid_id, tok, CAST(COUNT(*) AS BIGINT) AS ctf
      |        FROM dt2 GROUP BY 1, 2),
      |dfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfreq FROM (
      |          SELECT DISTINCT doc_id, tok FROM dt2) t GROUP BY tok),
      |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM dt2),
      |sc AS (
      |  SELECT ctf.centroid_id, ctf.tok, ctf.ctf, dfr.dfreq,
      |    ctf.ctf * CAST(length(format('{:b}', nd.nd // dfr.dfreq)) AS BIGINT) AS score
      |  FROM ctf JOIN dfr USING (tok), nd)
      |SELECT centroid_id, rk, tok, ctf, dfreq, score FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY centroid_id
      |    ORDER BY score DESC, tok) AS rk FROM sc) t
      |WHERE rk <= 5
      |ORDER BY centroid_id, rk""".stripMargin

  /** q176: embedding-space outlier pruning — the curation step between
    * clustering and SemDeDup: within each IVF cluster (the SAME q42/q83
    * pipeline; oracle reuses `ivfAssignCte`), the members FURTHEST from
    * their centroid — the bottom decile by cosine — are flagged as
    * stragglers (mislabeled/noise points that pollute cluster-level
    * decisions). Selection is RANK-based, not threshold-based: ranks are
    * integers with vec_id tie-breaks and the decile cut is the integer
    * `(n_members + 9) div 10`, so the flagged set is deterministic
    * cross-engine even though cosines are floats (the q42 precedent:
    * identical ranking, no bit-equality on the scores). One broadcast-
    * centroid pass + one cluster-keyed window; nothing global.
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(spark, dir)
    val seeds = graft.operators.IvfIndex.seedCentroids(emb, "vec_id", "embedding", 8)
    val cent = graft.operators.IvfIndex.lloydStep(emb, "vec_id", "embedding", seeds)
    graft.operators.Similarity.registerNative(spark)
    import graft.operators.Similarity.{ndot, nnorm}
    val w = Window.partitionBy($"centroid_id").orderBy($"cos".asc, $"vec_id".asc)
    val wAll = Window.partitionBy($"centroid_id")
    graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", cent)
      .join(emb, "vec_id")
      .join(broadcast(cent), "centroid_id")
      .withColumn("cos",
        ndot($"embedding", $"centroid") / (nnorm($"embedding") * nnorm($"centroid")))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .filter($"rk" <= expr("(n_members + 9) DIV 10"))
      .select($"centroid_id", $"rk", $"vec_id", $"n_members")
      .orderBy($"centroid_id", $"rk")
  }

  val embeddingOutliersSql: String = ivfAssignCte +
    """,
      |scored AS (
      |  SELECT a1.centroid_id, a1.vec_id,
      |    list_cosine_similarity(e.embedding, c.centroid) AS cos
      |  FROM a1 JOIN embeddings e USING (vec_id)
      |  JOIN c1 c USING (centroid_id)),
      |r AS (
      |  SELECT centroid_id, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY cos ASC, vec_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY centroid_id) AS n_members
      |  FROM scored)
      |SELECT centroid_id, rk, vec_id, CAST(n_members AS BIGINT) AS n_members
      |FROM r WHERE rk <= (n_members + 9) // 10
      |ORDER BY centroid_id, rk""".stripMargin

  /** q186: Matryoshka-style truncated-embedding retrieval recall — the
    * dimension-reduction tradeoff every embedding pipeline prices: search
    * on only the FIRST 16 of 64 dims (cosine is scale-invariant, so no
    * renormalization is needed after truncation) and grade its top-5
    * against the full-dimension exact top-5 per query. The truncated
    * index is 4× smaller/faster at 100 TB; this query measures what that
    * buys and costs ON THIS CORPUS, the same recall contract as q72
    * (IVF) and q78 (LSH). The DuckDB oracle recomputes BOTH rankings
    * from the same vectors (list slicing + list_cosine_similarity).
    */
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"nbr_id")
    val embT = emb.select($"vec_id", slice($"embedding", 1, 16).as("embedding"))
    val queriesT = queries.select($"vec_id", slice($"embedding", 1, 16).as("embedding"))
    val trunc = Similarity.cosineTopK(embT, queriesT, "vec_id", "embedding", k = 5)
      .select($"query_id", $"nbr_id").withColumn("hit", lit(1))
    exact.join(trunc, Seq("query_id", "nbr_id"), "left")
      .groupBy($"query_id")
      .agg(sum(coalesce($"hit", lit(0))).cast("long").as("n_hit"))
      .withColumn("recall", $"n_hit" / lit(5.0))
      .select($"query_id", $"n_hit", $"recall")
      .orderBy($"query_id")
  }

  val matryoshkaRecallSql: String =
    """WITH exq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
      |exs AS (SELECT query_id, vec_id AS nbr_id,
      |          list_cosine_similarity(qv, embedding) AS cos
      |        FROM exq JOIN embeddings ON vec_id <> query_id),
      |exr AS (SELECT query_id, nbr_id,
      |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |        FROM exs),
      |exact AS (SELECT query_id, nbr_id FROM exr WHERE rk <= 5),
      |tq AS (SELECT vec_id AS query_id, qv[1:16] AS qv
      |       FROM (SELECT vec_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0) t),
      |ts AS (SELECT query_id, vec_id AS nbr_id,
      |          list_cosine_similarity(tq.qv, embedding[1:16]) AS cos
      |        FROM tq JOIN embeddings ON vec_id <> query_id),
      |tr AS (SELECT query_id, nbr_id,
      |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |        FROM ts),
      |trunc AS (SELECT query_id, nbr_id FROM tr WHERE rk <= 5)
      |SELECT e.query_id,
      |  CAST(SUM(CASE WHEN t.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  SUM(CASE WHEN t.nbr_id IS NOT NULL THEN 1 ELSE 0 END) / 5.0 AS recall
      |FROM exact e LEFT JOIN trunc t ON t.query_id = e.query_id AND t.nbr_id = e.nbr_id
      |GROUP BY e.query_id
      |ORDER BY e.query_id""".stripMargin

  /** q218: per-dimension feature standardization — the z-score pass a
    * feature store / embedding-curation pipeline runs before training:
    * per-dimension mean and σ from EXACT decimal sums (the q33
    * discipline: per-element products quantize to DECIMAL(38,15), sums
    * are order-independent, the render routes through DECIMAL(18,9)),
    * then one broadcast join-back counts per-dimension |z| > 3 outliers.
    * mean/σ/z stay raw doubles with NO rounding: every post-sum step is
    * the same single-rooted IEEE expression tree in both engines (sqrt is
    * IEEE-correctly-rounded by definition), so the values are
    * bit-identical by construction. Two exchanges at any scale: the
    * 64-row dim aggregate and its broadcast back across the element
    * stream.
    */
  def embedStandardize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, dir)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", $"pos".as("dim"), $"col".cast("double").as("x"))
    val stats = e.groupBy($"dim").agg(
      count(lit(1)).as("n"),
      sum($"x".cast("decimal(38,15)")).cast("decimal(18,9)").cast("double").as("sx"),
      sum(($"x" * $"x").cast("decimal(38,15)")).cast("decimal(18,9)").cast("double").as("sxx"))
      .withColumn("mean", $"sx" / $"n")
      .withColumn("std", sqrt($"sxx" / $"n" - $"mean" * $"mean"))
    e.join(broadcast(stats), "dim")
      .groupBy($"dim")
      .agg(first($"n").as("n"), first($"mean").as("mean"), first($"std").as("std"),
        sum(when(abs(($"x" - $"mean") / $"std") > 3.0, 1L).otherwise(0L)).as("n_clipped"))
      .orderBy($"dim")
  }

  val embedStandardizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |s AS (
      |  SELECT dim, COUNT(*) AS n,
      |    CAST(CAST(ROUND(SUM(CAST(x AS DECIMAL(38,15))), 9) AS DECIMAL(18,9)) AS DOUBLE) AS sx,
      |    CAST(CAST(ROUND(SUM(CAST(x * x AS DECIMAL(38,15))), 9) AS DECIMAL(18,9)) AS DOUBLE) AS sxx
      |  FROM e GROUP BY dim),
      |m AS (SELECT dim, n, sx / n AS mean, sxx, sx FROM s),
      |d AS (SELECT dim, n, mean, SQRT(sxx / n - mean * mean) AS std FROM m)
      |SELECT e.dim, d.n, d.mean, d.std,
      |  CAST(SUM(CASE WHEN ABS((e.x - d.mean) / d.std) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
      |FROM e JOIN d ON e.dim = d.dim
      |GROUP BY e.dim, d.n, d.mean, d.std
      |ORDER BY e.dim""".stripMargin

  /** q223: GEOMETRIC MEDIAN per label (two Weiszfeld iterations) — the
    * robust class centroid an embedding-curation pipeline wants where
    * the arithmetic mean is dragged by outliers: c ← Σ(xᵢ/dᵢ)/Σ(1/dᵢ),
    * dᵢ = ‖xᵢ−c‖. Determinism engineering mirrors q211: the center is
    * QUANTIZED to DECIMAL(18,6) after every step (init = per-dim mean
    * from exact decimal sums), per-vector weights and weighted
    * coordinates quantize to 8dp decimals before their exact sums, and
    * each new coordinate is one double division of two exact-decimal
    * renders — so both engines carry bit-identical centers even though
    * the distance sqrt itself may differ in the last ulp (that noise
    * dies in the 8dp weight quantization, measure-zero from any
    * boundary). Driver holds only the 5×64 center matrix; each
    * iteration is one broadcast join + one (label, dim)-keyed aggregate.
    */
  def geometricMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, dir)
      .select($"label", $"vec_id", posexplode($"embedding"))
      .select($"label", $"vec_id", $"pos".as("dim"), $"col".cast("double").as("x"))
      .persist()
    // c0: per-dim mean, quantized — (label, dim) -> double
    def quantize(c: Column): Column = round(c, 6).cast("decimal(18,6)").cast("double")
    var c = e.groupBy($"label", $"dim")
      .agg((sum($"x".cast("decimal(38,15)")).cast("decimal(18,9)").cast("double") /
        count(lit(1))).as("craw"))
      .select($"label", $"dim", quantize($"craw").as("c"))
    for (_ <- 1 to 2) {
      val dist = e.join(broadcast(c), Seq("label", "dim"))
        .withColumn("sq", ($"x" - $"c") * ($"x" - $"c"))
        .groupBy($"label", $"vec_id")
        .agg(sqrt(sum($"sq".cast("decimal(38,15)")).cast("decimal(18,9)").cast("double")).as("d"))
        .filter($"d" > 1e-9)
        .withColumn("w", round(lit(1.0) / $"d", 8).cast("decimal(18,8)"))
      c = e.join(dist.select($"label", $"vec_id", $"w"), Seq("label", "vec_id"))
        .groupBy($"label", $"dim")
        .agg((sum(round($"w".cast("double") * $"x", 8).cast("decimal(38,8)"))
            .cast("decimal(18,8)").cast("double") /
          sum($"w").cast("decimal(18,8)").cast("double")).as("craw"))
        .select($"label", $"dim", quantize($"craw").as("c"))
    }
    val out = c.filter($"dim" < 4)
      .groupBy($"label")
      .agg(round(sum(when($"dim" === 0, $"c").otherwise(0.0)), 6).as("c0"),
        round(sum(when($"dim" === 1, $"c").otherwise(0.0)), 6).as("c1"),
        round(sum(when($"dim" === 2, $"c").otherwise(0.0)), 6).as("c2"),
        round(sum(when($"dim" === 3, $"c").otherwise(0.0)), 6).as("c3"))
      .orderBy($"label")
    val materialized = out.localCheckpoint(eager = true)
    e.unpersist()
    materialized
  }

  /** The two Weiszfeld steps unrolled; distances sum per-vector over the
    * exploded dims — the float-sum ORDER differs from Spark's, but the
    * noise is killed by the same 8dp weight quantization (scaladoc).
    */
  val geometricMedianSql: String = {
    def distOf(cTab: String) =
      s"""SELECT e.label, e.vec_id,
         |  SQRT(CAST(CAST(ROUND(SUM(CAST((e.x - $cTab.c) * (e.x - $cTab.c) AS DECIMAL(38,15))), 9) AS DECIMAL(18,9)) AS DOUBLE)) AS d
         |FROM e JOIN $cTab ON e.label = $cTab.label AND e.dim = $cTab.dim
         |GROUP BY e.label, e.vec_id""".stripMargin
    def stepOf(dTab: String) =
      s"""SELECT e.label, e.dim,
         |  CAST(CAST(ROUND(CAST(CAST(ROUND(SUM(CAST(ROUND(CAST(w.w AS DOUBLE) * e.x, 8) AS DECIMAL(38,8))), 8) AS DECIMAL(18,8)) AS DOUBLE)
         |    / CAST(CAST(ROUND(SUM(w.w), 8) AS DECIMAL(18,8)) AS DOUBLE), 6) AS DECIMAL(18,6)) AS DOUBLE) AS c
         |FROM e JOIN $dTab w ON e.label = w.label AND e.vec_id = w.vec_id
         |GROUP BY e.label, e.dim""".stripMargin
    s"""WITH e AS (
       |  SELECT label, vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
       |         CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |c0 AS (
       |  SELECT label, dim,
       |    CAST(CAST(ROUND(CAST(CAST(ROUND(SUM(CAST(x AS DECIMAL(38,15))), 9) AS DECIMAL(18,9)) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS c
       |  FROM e GROUP BY label, dim),
       |d1 AS (SELECT label, vec_id, CAST(ROUND(1.0 / d, 8) AS DECIMAL(18,8)) AS w
       |       FROM (${distOf("c0")}) t WHERE d > 0.000000001),
       |c1 AS (${stepOf("d1")}),
       |d2 AS (SELECT label, vec_id, CAST(ROUND(1.0 / d, 8) AS DECIMAL(18,8)) AS w
       |       FROM (${distOf("c1")}) t WHERE d > 0.000000001),
       |c2 AS (${stepOf("d2")})
       |SELECT label,
       |  ROUND(SUM(CASE WHEN dim = 0 THEN c ELSE 0.0 END), 6) AS c0,
       |  ROUND(SUM(CASE WHEN dim = 1 THEN c ELSE 0.0 END), 6) AS c1,
       |  ROUND(SUM(CASE WHEN dim = 2 THEN c ELSE 0.0 END), 6) AS c2,
       |  ROUND(SUM(CASE WHEN dim = 3 THEN c ELSE 0.0 END), 6) AS c3
       |FROM c2 WHERE dim < 4
       |GROUP BY label ORDER BY label""".stripMargin
  }

  /** q225: INCREMENTAL IVF maintenance — the index-lifecycle op q42's
    * one-shot build doesn't cover: new vectors (10% delta) are absorbed
    * by assigning them to the FROZEN centroids trained on the base —
    * one broadcast join per delta batch, no re-cluster, no corpus
    * rescan — and queries immediately retrieve across base + delta
    * through the union index ([[graft.operators.IvfIndex.searchAssigned]]).
    * This is how an IVF deployment runs between periodic re-trainings at
    * 100 TB: train rarely, assign continuously. The oracle re-derives
    * the whole pipeline with centroids FROM THE BASE ONLY and the
    * assignment over all vectors — a delta vector missing from the
    * index, or centroids polluted by the delta, hash-mismatches.
    */
  def cosineIvfIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val base = emb.filter($"vec_id" % 10 =!= 7)
    val delta = emb.filter($"vec_id" % 10 === 7)
    val ivf = graft.operators.IvfIndex
    val centroids = ivf.lloydStep(base, "vec_id", "embedding",
      ivf.seedCentroids(base, "vec_id", "embedding", 8)).cache()
    val assignments = ivf.assign(base, "vec_id", "embedding", centroids)
      .unionByName(ivf.assign(delta, "vec_id", "embedding", centroids))
    ivf.searchAssigned(emb, assignments, centroids,
        emb.filter($"vec_id" % 50 === 0), "vec_id", "embedding", k = 5, nprobe = 4)
      .select($"query_id", $"rk", $"nbr_id")
      .orderBy($"query_id", $"rk")
  }

  /** q42's CTE with centroids trained on the BASE subset only; the final
    * assignment + probes run over ALL embeddings (base ∪ delta).
    */
  val cosineIvfIncrementalSql: String =
    """WITH base AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 7),
      |seeds AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS centroid_id,
      |         embedding AS centroid
      |  FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8) t),
      |a0 AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, s.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, s.centroid) DESC, s.centroid_id) AS rn
      |    FROM base e CROSS JOIN seeds s) t WHERE rn = 1),
      |cmeans AS (
      |  SELECT centroid_id, dim, AVG(x) AS m FROM (
      |    SELECT a0.centroid_id,
      |      unnest(range(1, len(e.embedding)+1)) AS dim,
      |      unnest(CAST(e.embedding AS DOUBLE[])) AS x
      |    FROM base e JOIN a0 USING (vec_id)) t
      |  GROUP BY centroid_id, dim),
      |c1 AS (
      |  SELECT centroid_id, CAST(list(m ORDER BY dim) AS REAL[]) AS centroid
      |  FROM cmeans GROUP BY centroid_id),
      |a1 AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT e.vec_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN c1 c) t WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, centroid_id FROM (
      |    SELECT e.vec_id AS query_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.centroid_id) AS rn
      |    FROM embeddings e CROSS JOIN c1 c WHERE e.vec_id % 50 = 0) t WHERE rn <= 4),
      |scored AS (
      |  SELECT p.query_id, n.vec_id AS nbr_id,
      |    list_cosine_similarity(q.embedding, n.embedding) AS cos
      |  FROM probes p
      |  JOIN embeddings q ON q.vec_id = p.query_id
      |  JOIN a1 ON a1.centroid_id = p.centroid_id
      |  JOIN embeddings n ON n.vec_id = a1.vec_id
      |  WHERE n.vec_id <> p.query_id),
      |r AS (
      |  SELECT query_id, nbr_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rk
      |  FROM scored)
      |SELECT query_id, rk, nbr_id FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** q226: IVF RETRAIN TRIGGER — the feedback loop q225's "train rarely,
    * assign continuously" rhythm was missing (round-9 verdict item 4):
    * per delta batch, the mean cosine of each vector to its nearest
    * FROZEN centroid ([[graft.operators.IvfIndex.assignmentQuality]] —
    * decimal-exact sums, O(delta) per batch), compared cross-multiplied
    * against the base build's mean; a delta whose assignments degrade
    * below 90% of the base signals retrain. Two deltas are graded: the
    * NATURAL holdout (same distribution — must NOT trip) and an
    * ADVERSARIAL drifted one (direction-flipped vectors, mean assigned
    * cosine goes negative — must trip). The corpus is folded into the
    * positive orthant (abs per component) so the base cone is tight and
    * both margins are sign-level, far from the 90% bound: the flag is
    * insensitive to the engines' float-path cosine differences, which is
    * also why the graded columns are counts and flags, not raw sums (the
    * q34 ids-only trick). The oracle re-derives the whole stat in SQL.
    * IvfIndexSpec additionally drives the trip→retrain→clear cycle.
    */
  def ivfRetrainTrigger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val absEmb = embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => abs(x)).as("embedding"))
    val base = absEmb.filter($"vec_id" % 10 =!= 7)
    val deltaNat = absEmb.filter($"vec_id" % 10 === 7)
    val deltaAdv = deltaNat.select($"vec_id",
      transform($"embedding", x => -x).as("embedding"))
    val ivf = graft.operators.IvfIndex
    val centroids = ivf.seedCentroids(base, "vec_id", "embedding", 8).cache()
    def graded(delta: DataFrame, kind: String) =
      ivf.retrainSignal(base, delta, "vec_id", "embedding", centroids, pct = 90)
        .select(lit(kind).as("delta_kind"), $"batch", $"n",
          when($"retrain", 1L).otherwise(0L).as("retrain"))
    graded(deltaNat, "natural")
      .unionByName(graded(deltaAdv, "adversarial"))
      .orderBy($"delta_kind", $"batch")
  }

  val ivfRetrainTriggerSql: String =
    """WITH absemb AS (
      |  SELECT vec_id, list_transform(embedding, x -> abs(x)) AS v FROM embeddings),
      |base AS (SELECT vec_id, v FROM absemb WHERE vec_id % 10 <> 7),
      |dnat AS (SELECT vec_id, v FROM absemb WHERE vec_id % 10 = 7),
      |dadv AS (SELECT vec_id, list_transform(v, x -> -x) AS v FROM dnat),
      |seeds AS (SELECT v AS centroid FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8) t),
      |stat AS (
      |  SELECT batch, COUNT(*) AS n, SUM(CAST(best AS DECIMAL(18,9))) AS s
      |  FROM (
      |    SELECT b.batch, b.vec_id, MAX(list_cosine_similarity(b.v, s.centroid)) AS best
      |    FROM (SELECT 'base' AS batch, vec_id, v FROM base
      |          UNION ALL SELECT 'nat', vec_id, v FROM dnat
      |          UNION ALL SELECT 'adv', vec_id, v FROM dadv) b
      |    CROSS JOIN seeds s GROUP BY 1, 2) t
      |  GROUP BY batch),
      |f AS (
      |  SELECT d.kind AS delta_kind, b.n AS n_b, d.n AS n_d,
      |         CAST(d.s * b.n * 100 < b.s * d.n * 90 AS BIGINT) AS retrain
      |  FROM (SELECT 'natural' AS kind, n, s FROM stat WHERE batch = 'nat'
      |        UNION ALL SELECT 'adversarial', n, s FROM stat WHERE batch = 'adv') d
      |  CROSS JOIN (SELECT n, s FROM stat WHERE batch = 'base') b)
      |SELECT delta_kind, batch, n, retrain FROM (
      |  SELECT delta_kind, 'base' AS batch, n_b AS n, retrain FROM f
      |  UNION ALL SELECT delta_kind, 'delta', n_d, retrain FROM f)
      |ORDER BY delta_kind, batch""".stripMargin

  /** q235: binary (sign-bit) quantization ANN — Hamming shortlist over
    * 64-bit packed signatures (32× smaller than the float vectors),
    * exact-cosine rerank of the shortlist only
    * ([[graft.operators.BinaryAnn]]). The oracle recomputes Hamming as
    * the per-dimension sign-disagreement count (definitionally the
    * packed distance) and replays both stages; ids + integer Hamming
    * output (the q34 trick — cosine floats stay internal, asserted
    * against a driver-side double reference in SimilaritySpec's family).
    */
  def binaryAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val queriesDf = emb.filter($"vec_id" % 50 === 0)
    graft.operators.BinaryAnn.hammingTopK(
      emb, queriesDf, "vec_id", "embedding", shortlist = 20, k = 5)
      .orderBy($"query_id", $"rk")
  }

  val binaryAnnSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
      |           FROM embeddings WHERE vec_id % 50 = 0),
      |h AS (SELECT query_id, qv, vec_id AS nbr_id, embedding AS ev,
      |        CAST(list_sum(list_transform(range(1, len(qv)+1),
      |          i -> CASE WHEN (qv[i] >= 0) <> (embedding[i] >= 0)
      |               THEN 1 ELSE 0 END)) AS BIGINT) AS ham
      |      FROM q JOIN embeddings ON vec_id <> query_id),
      |s AS (SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                 ORDER BY ham, nbr_id) AS hrk FROM h)
      |  WHERE hrk <= 20),
      |r AS (SELECT query_id, nbr_id, ham,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY list_cosine_similarity(qv::DOUBLE[], ev::DOUBLE[]) DESC,
      |                   nbr_id) AS rk
      |      FROM s)
      |SELECT query_id, rk, nbr_id, ham FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q235_binary_ann" -> binaryAnn,
    "q226_ivf_retrain_trigger" -> ivfRetrainTrigger,
    "q218_embed_standardize" -> embedStandardize,
    "q223_geometric_median" -> geometricMedian,
    "q225_ivf_incremental" -> cosineIvfIncremental,
    "q186_matryoshka_recall" -> matryoshkaRecall,
    "q176_embedding_outliers" -> embeddingOutliers,
    "q170_cluster_labels" -> clusterLabels,
    "q135_pq_ann"     -> pqAnn,
    "q33_vec_stats"   -> vecStats,
    "q34_cosine_topk" -> cosineTopK,
    "q35_cosine_lsh"  -> cosineLsh,
    "q42_cosine_ivf"  -> cosineIvf,
    "q43_embedding_neardup" -> embeddingNearDup,
    "q72_ivf_recall"  -> cosineIvfRecall,
    "q78_lsh_recall"  -> cosineLshRecall,
    "q83_semantic_dedup" -> semanticDedup,
    "q98_hybrid_retrieval" -> hybridRetrieval,
    "q129_mmr_rerank" -> mmrRerank,
  )

  val oracles: Map[String, String] = Map(
    "q235_binary_ann" -> binaryAnnSql,
    "q226_ivf_retrain_trigger" -> ivfRetrainTriggerSql,
    "q218_embed_standardize" -> embedStandardizeSql,
    "q223_geometric_median" -> geometricMedianSql,
    "q225_ivf_incremental" -> cosineIvfIncrementalSql,
    "q186_matryoshka_recall" -> matryoshkaRecallSql,
    "q176_embedding_outliers" -> embeddingOutliersSql,
    "q170_cluster_labels" -> clusterLabelsSql,
    "q135_pq_ann"     -> pqAnnSql,
    "q33_vec_stats"   -> vecStatsSql,
    "q34_cosine_topk" -> cosineTopKSql,
    "q35_cosine_lsh"  -> cosineLshSql,
    "q42_cosine_ivf"  -> cosineIvfSql,
    "q43_embedding_neardup" -> embeddingNearDupSql,
    "q72_ivf_recall"  -> cosineIvfRecallSql,
    "q78_lsh_recall"  -> cosineLshRecallSql,
    "q83_semantic_dedup" -> semanticDedupSql,
    "q98_hybrid_retrieval" -> hybridRetrievalSql,
    "q129_mmr_rerank" -> mmrRerankSql,
  )
}
