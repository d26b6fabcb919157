package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Contamination, Dedup, DedupGroups}
import Tables._

/** Corpus-level training-data pipeline operators on top of the pair-level
  * dedup primitives: connected-component dedup groups, the deduplicated
  * corpus itself, benchmark contamination, and exact-quota stratified
  * sampling. The graded entries use exact n-gram Jaccard edges so every
  * stage is DuckDB-expressible (the operators compose identically with
  * the MinHash/LSH pair generators at scale — DedupGroupsSpec covers
  * that path).
  */
object PipelineOps {

  private def jaccardEdges(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(documents(spark, dir), "doc_id", "text", 3, 0.5)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_dedup_groups"      -> dedupGroups,
    "q48_dedup_corpus"      -> dedupCorpus,
    "q49_contamination"     -> contamination,
    "q50_stratified_sample" -> stratifiedSample,
  )

  val oracles: Map[String, String] = Map(
    "q47_dedup_groups"      -> dedupGroupsSql,
    "q48_dedup_corpus"      -> dedupCorpusSql,
    "q49_contamination"     -> contaminationSql,
    "q50_stratified_sample" -> stratifiedSampleSql,
  )
}
