package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions
import graft.operators.{Contamination, Dedup, DedupGroups}
import Tables._

/** Corpus-level training-data pipeline operators on top of the pair-level
  * dedup primitives: connected-component dedup groups, the deduplicated
  * corpus itself, benchmark contamination, and exact-quota stratified
  * sampling. The graded entries build edges with the MinHash/LSH pipeline
  * (the scale path) and oracle them against exact n-gram Jaccard SQL —
  * valid because the LSH edge set provably coincides with the exact one
  * on this corpus (q30's oracle is that proof); DedupGroupsSpec covers
  * the operators against hand-built graphs as well.
  */
object PipelineOps {

  /** Near-dup edges via the MinHash LSH pipeline — the 100 TB path (one
    * shuffle over shingles, exact Jaccard only on band-bucket candidates).
    * Same q30 argument makes the exact-Jaccard SQL a valid oracle: the
    * 16×4 banding recovers every ≥0.5-Jaccard pair on this corpus with
    * certainty in practice (q30's own oracle proves the coincidence), so
    * the edge sets are identical while the plan never goes quadratic.
    */
  private def jaccardEdges(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(documents(spark, dir), "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3, minJaccard = 0.5)
      .select(col("d1"), col("d2"))

  /** q47: connected components of the exact near-dup graph — every doc
    * with its component representative (minimum doc_id).
    */
  def dedupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    DedupGroups.connectedComponents(
        documents(spark, dir).select($"doc_id"), "doc_id",
        jaccardEdges(spark, dir))
      .orderBy($"doc_id")
  }

  /** The q29 pair CTEs (toks → trigrams → distinct shingles → counts →
    * intersections → jaccard-thresholded pairs), shared by the q47/q48
    * oracles.
    */
  private val pairCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |sh AS (SELECT DISTINCT doc_id, s FROM tri),
      |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id d1, b.doc_id d2, count(*) i
      |  FROM sh a JOIN sh b USING(s) WHERE a.doc_id < b.doc_id
      |  GROUP BY 1,2),
      |pairs AS (
      |  SELECT d1, d2 FROM inter
      |  JOIN cnt c1 ON d1=c1.doc_id JOIN cnt c2 ON d2=c2.doc_id
      |  WHERE CAST(i AS DOUBLE)/(c1.n+c2.n-i) >= 0.5),
      |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
      |          UNION ALL SELECT d2, d1 FROM pairs),
      |reach AS (
      |  SELECT doc_id AS node, doc_id AS r FROM documents
      |  UNION
      |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
      |comps AS (SELECT node AS doc_id, MIN(r) AS rep FROM reach GROUP BY node)""".stripMargin

  val dedupGroupsSql: String =
    s"""WITH RECURSIVE $pairCtes
       |SELECT doc_id, rep FROM comps ORDER BY doc_id""".stripMargin

  /** q48: the deduplicated corpus — component representatives plus all
    * untouched docs (text carried as md5 so the compare stays light).
    */
  def dedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    DedupGroups.dedupCorpus(documents(spark, dir), "doc_id", jaccardEdges(spark, dir))
      .select($"doc_id", md5($"text").as("text_md5"), $"lang", $"source")
      .orderBy($"doc_id")
  }

  val dedupCorpusSql: String =
    s"""WITH RECURSIVE $pairCtes
       |SELECT d.doc_id, md5(d.text) AS text_md5, d.lang, d.source
       |FROM documents d JOIN comps c USING (doc_id)
       |WHERE d.doc_id = c.rep
       |ORDER BY d.doc_id""".stripMargin

  /** q49: benchmark contamination — candidate docs (doc_id % 97 ≠ 0)
    * audited against the benchmark subset (doc_id % 97 = 0) by distinct
    * 3-gram shingle overlap.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    Contamination.report(
        docs.filter($"doc_id" % 97 =!= 0),
        docs.filter($"doc_id" % 97 === 0),
        "doc_id", "text", 3)
      .orderBy($"doc_id")
  }

  val contaminationSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |sh AS (SELECT DISTINCT doc_id, s FROM tri),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      |cand AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
      |SELECT cand.doc_id, COUNT(*) AS n_shingles,
      |  COUNT(bench.s) AS n_contaminated,
      |  CAST(COUNT(bench.s) AS DOUBLE)/COUNT(*) AS contamination
      |FROM cand LEFT JOIN bench ON cand.s = bench.s
      |GROUP BY cand.doc_id
      |ORDER BY cand.doc_id""".stripMargin

  /** q81: Bloom-prefiltered decontamination — the same benchmark/candidate
    * split as q49, but the benchmark shingle set folds into a native
    * Bloom-filter aggregate and the candidate side probes it as a
    * codegen'd map-side filter before the exact confirm semi-join. Output
    * is exact (no false negatives + confirm), so the oracle is plain
    * exact SQL — the bloom only shapes the plan. Only hit documents
    * appear (inner semantics), unlike q49's per-doc fractions.
    */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    graft.operators.BloomDecon.contaminatedDocs(
        docs.filter($"doc_id" % 97 =!= 0),
        docs.filter($"doc_id" % 97 === 0),
        "doc_id", "text", 3)
      .orderBy($"doc_id")
  }

  val bloomDecontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |sh AS (SELECT DISTINCT doc_id, s FROM tri),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      |cand AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
      |SELECT cand.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated,
      |  MIN(cand.s) AS first_shingle
      |FROM cand JOIN bench ON cand.s = bench.s
      |GROUP BY cand.doc_id
      |ORDER BY cand.doc_id""".stripMargin

  /** q50: exact-quota stratified sample — 20 vectors per label, picked by
    * a deterministic multiplicative hash (Knuth 2654435761) of vec_id so
    * the "random" order is reproducible AND SQL-expressible (no RNG, no
    * xxhash). One shuffle on the label key.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = pmod($"vec_id" * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy($"label").orderBy(h.asc, $"vec_id".asc)
    embeddings(spark, dir)
      .select($"vec_id", $"label")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 20)
      .select($"vec_id", $"label")
      .orderBy($"label", $"vec_id")
  }

  val stratifiedSampleSql: String =
    """SELECT vec_id, label FROM (
      |  SELECT vec_id, label,
      |    ROW_NUMBER() OVER (PARTITION BY label
      |      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) AS rn
      |  FROM embeddings) t
      |WHERE rn <= 20
      |ORDER BY label, vec_id""".stripMargin

  /** q51: symmetric per-vector int8 quantization with reconstruction
    * error. The int8 array crosses the oracle as a comma-joined string
    * (array column renderings differ between engines; the string is
    * byte-stable).
    */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Quantize.report(embeddings(spark, dir), "vec_id", "embedding")
      .select($"vec_id", $"scale",
        concat_ws(",", $"q8").as("q8_str"), $"max_err")
      .orderBy($"vec_id")
  }

  val quantizeSql: String =
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))/127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, embedding, scale,
      |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
      |      ELSE CAST(GREATEST(-127.0, LEAST(127.0,
      |        ROUND(CAST(x AS DOUBLE)/scale, 0))) AS INTEGER) END) AS q8
      |  FROM s)
      |SELECT vec_id, scale, array_to_string(q8, ',') AS q8_str,
      |  list_max(list_transform(range(1, len(embedding)+1),
      |    i -> abs(CAST(embedding[i] AS DOUBLE) - q8[i]*scale))) AS max_err
      |FROM q
      |ORDER BY vec_id""".stripMargin

  /** q52: within-document repetition ratio — 1 − distinct/total trigrams,
    * the boilerplate/repetition quality signal.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val total = docs.select($"doc_id",
      greatest(graft.functions.TextFunctions.tokenCount($"text") - 2, lit(0L))
        .as("n_trigrams"))
    val distinctSh = graft.functions.TextFunctions.shingles(docs, "doc_id", "text", 3)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_distinct"))
    total.join(distinctSh, Seq("doc_id"), "left")
      .select($"doc_id", $"n_trigrams",
        coalesce($"n_distinct", lit(0L)).as("n_distinct"))
      .withColumn("rep_frac",
        when($"n_trigrams" === 0, lit(0.0))
          .otherwise(lit(1.0) - $"n_distinct".cast("double") / $"n_trigrams"))
      .orderBy($"doc_id")
  }

  val repetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |d AS (SELECT doc_id, COUNT(DISTINCT s) AS n_distinct FROM tri GROUP BY doc_id),
      |t AS (SELECT doc_id, GREATEST(len(string_split(text,' ')) - 2, 0) AS n_trigrams
      |      FROM documents)
      |SELECT t.doc_id, CAST(t.n_trigrams AS BIGINT) AS n_trigrams,
      |  CAST(COALESCE(d.n_distinct, 0) AS BIGINT) AS n_distinct,
      |  CASE WHEN t.n_trigrams = 0 THEN 0.0
      |       ELSE 1.0 - CAST(COALESCE(d.n_distinct, 0) AS DOUBLE)/t.n_trigrams END AS rep_frac
      |FROM t LEFT JOIN d USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  /** q53: PII scrubbing — emails/phones injected deterministically into
    * the doc text, then redacted; the scrubbed text crosses the oracle as
    * an md5. Proves the redaction regexes behave identically under Java
    * regex and RE2.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions
    val salted = documents(spark, dir).select($"doc_id",
      concat($"text", lit(" contact user"), $"doc_id",
        lit("@mail.example or call +47 22 33 44 55.")).as("t"))
    salted.select($"doc_id", md5(TextFunctions.redactPii($"t")).as("scrubbed_md5"))
      .orderBy($"doc_id")
  }

  val piiScrubSql: String =
    """SELECT doc_id, md5(
      |  regexp_replace(
      |    regexp_replace(
      |      text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example or call +47 22 33 44 55.',
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g')) AS scrubbed_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q69: incremental dedup — the 1-in-5 docs (doc_id % 5 = 0) arrive as a
    * DELTA against the already-indexed corpus (the other 4-in-5). Only the
    * delta is hashed; only collided corpus docs are re-shingled. Oracle:
    * exact cross-set Jaccard ≥ 0.5 (the q30 coincidence argument — the
    * 16×4 banding recovers every such pair on this corpus).
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.IncrementalDedup
    val docs = documents(spark, dir)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val delta = docs.filter($"doc_id" % 5 === 0)
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text")
    IncrementalDedup.dedupDelta(index, corpus, delta, "doc_id", "text")
      .orderBy($"delta_id", $"corpus_id")
  }

  val incrementalDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |sh AS (SELECT DISTINCT doc_id, s FROM tri),
      |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS delta_id, b.doc_id AS corpus_id, count(*) i
      |  FROM sh a JOIN sh b USING(s)
      |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |  GROUP BY 1,2)
      |SELECT delta_id, corpus_id,
      |       CAST(i AS DOUBLE)/(c1.n+c2.n-i) AS jaccard
      |FROM inter
      |JOIN cnt c1 ON delta_id=c1.doc_id
      |JOIN cnt c2 ON corpus_id=c2.doc_id
      |WHERE CAST(i AS DOUBLE)/(c1.n+c2.n-i) >= 0.5
      |ORDER BY delta_id, corpus_id""".stripMargin

  /** q131: deterministic negative sampling — recommender/contrastive
    * training needs (customer, part) pairs the customer did NOT buy, k per
    * customer, reproducible across runs and engines. Candidates come from
    * the portable md5 hash (`portableHash60(custkey:j)` mod |parts|, j
    * over a small oversample range), the customer's actual purchases
    * anti-join out, and the first k survivors by j win.
    *
    * Scale shape: candidate generation is a LOCAL 8-way array expansion
    * per customer (no join against the parts table — part keys are dense
    * 1..P, so the hash maps straight into the key space; P arrives as a
    * 1-row broadcast); the anti-join keys on (custkey, partkey) against
    * the per-customer purchase set; the final pick is a customer-bounded
    * window. No randomness, no sampling nondeterminism — the oracle
    * replays the identical arithmetic.
    */
  def negativeSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bought = lineitem(spark, dir)
      .join(orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c_custkey"), $"l_partkey".as("p_cand"))
      .distinct()
    val nParts = part(spark, dir).agg(count(lit(1)).as("np")) // 1 row
    val cand = customer(spark, dir).select($"c_custkey")
      .crossJoin(broadcast(nParts))
      .select($"c_custkey", explode(expr("sequence(1, 8)")).as("j"), $"np")
      .withColumn("p_cand",
        lit(1) + pmod(TextFunctions.portableHash60(
          concat($"c_custkey".cast("string"), lit(":"), $"j".cast("string"))), $"np"))
    val picked = cand
      // hash collisions inside the oversample range would emit the same
      // negative twice — keep one candidate per (customer, part), at its
      // earliest index so pick order stays the hash order
      .groupBy($"c_custkey", $"p_cand").agg(min($"j").as("j"))
      .join(bought, Seq("c_custkey", "p_cand"), "left_anti")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"c_custkey").orderBy($"j")))
      .filter($"rk" <= 3)
    picked.select($"c_custkey", $"rk", $"p_cand".as("p_partkey"))
      .orderBy($"c_custkey", $"rk")
  }

  val negativeSampleSql: String =
    """WITH np AS (SELECT COUNT(*) AS np FROM part),
      |bought AS (
      |  SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_cand
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |cand AS (
      |  SELECT c.c_custkey, j,
      |    1 + (('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || ':' ||
      |                             CAST(j AS VARCHAR)), 1, 15))::BIGINT % np.np
      |         + np.np) % np.np AS p_cand
      |  FROM customer c, np, generate_series(1, 8) AS t(j)),
      |dedup AS (
      |  SELECT c_custkey, p_cand, MIN(j) AS j FROM cand GROUP BY 1, 2),
      |kept AS (
      |  SELECT c.c_custkey, c.j, c.p_cand,
      |    ROW_NUMBER() OVER (PARTITION BY c.c_custkey ORDER BY c.j) AS rk
      |  FROM dedup c ANTI JOIN bought b
      |    ON b.c_custkey = c.c_custkey AND b.p_cand = c.p_cand)
      |SELECT c_custkey, rk, p_cand AS p_partkey
      |FROM kept WHERE rk <= 3
      |ORDER BY c_custkey, rk""".stripMargin

  /** q229: LEAKAGE-SAFE train/val/test split — the assignment a training
    * pipeline must get right before any evaluation means anything: if two
    * near-duplicate documents land in train and test, the benchmark is
    * contaminated by construction. The split key is the near-dup
    * COMPONENT representative (q47's connected components over the
    * MinHash/LSH edges), not the document — every member of a component
    * inherits its rep's bucket (rep%10: 0-7 train, 8 val, 9 test), so no
    * component can straddle splits. The graded row set carries per-split
    * doc/group counts and id checksums PLUS the leakage audit (number of
    * components observed in more than one split — computed from the data,
    * not assumed; must be 0), all re-derived by the oracle from the exact
    * n-gram Jaccard components in SQL. Scale posture: everything after
    * the q47 component pass is one groupBy(rep) + one groupBy(split) —
    * both map-side-combinable; the split stays deterministic under any
    * partitioning because the bucket is a pure function of rep.
    */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comps = DedupGroups.connectedComponents(
      documents(spark, dir).select($"doc_id"), "doc_id",
      jaccardEdges(spark, dir))
    val sp = comps.withColumn("split",
      when(pmod($"rep", lit(10)) <= 7, lit("train"))
        .when(pmod($"rep", lit(10)) === 8, lit("val"))
        .otherwise(lit("test")))
    val leak = sp.groupBy($"rep")
      .agg(countDistinct($"split").as("ns"))
      .agg(sum(when($"ns" > 1, 1L).otherwise(0L)).as("leaky_groups"))
    sp.groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"rep").as("n_groups"),
        sum($"doc_id").as("id_checksum"))
      .crossJoin(broadcast(leak))
      .orderBy($"split")
  }

  val leakageSafeSplitSql: String =
    s"""WITH RECURSIVE $pairCtes,
       |sp AS (
       |  SELECT doc_id, rep,
       |    CASE WHEN rep % 10 <= 7 THEN 'train'
       |         WHEN rep % 10 = 8 THEN 'val' ELSE 'test' END AS split
       |  FROM comps),
       |leak AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS leaky_groups
       |  FROM (SELECT rep, COUNT(DISTINCT split) AS ns FROM sp GROUP BY rep) t)
       |SELECT split, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT rep) AS n_groups,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum, leaky_groups
       |FROM sp CROSS JOIN leak
       |GROUP BY split, leaky_groups
       |ORDER BY split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q229_leakage_safe_split" -> leakageSafeSplit,
    "q131_negative_sample"  -> negativeSample,
    "q69_incremental_dedup" -> incrementalDedup,
    "q47_dedup_groups"      -> dedupGroups,
    "q48_dedup_corpus"      -> dedupCorpus,
    "q49_contamination"     -> contamination,
    "q50_stratified_sample" -> stratifiedSample,
    "q51_quantize_int8"     -> quantize,
    "q52_repetition"        -> repetition,
    "q53_pii_scrub"         -> piiScrub,
    "q81_bloom_decontam"    -> bloomDecontaminate,
  )

  val oracles: Map[String, String] = Map(
    "q229_leakage_safe_split" -> leakageSafeSplitSql,
    "q131_negative_sample"  -> negativeSampleSql,
    "q69_incremental_dedup" -> incrementalDedupSql,
    "q47_dedup_groups"      -> dedupGroupsSql,
    "q48_dedup_corpus"      -> dedupCorpusSql,
    "q49_contamination"     -> contaminationSql,
    "q50_stratified_sample" -> stratifiedSampleSql,
    "q51_quantize_int8"     -> quantizeSql,
    "q52_repetition"        -> repetitionSql,
    "q53_pii_scrub"         -> piiScrubSql,
    "q81_bloom_decontam"    -> bloomDecontaminateSql,
  )
}
