package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions
import Tables._

/** Corpus-statistics operators for the training-data pipeline: TF-IDF
  * term ranking, vocabulary construction, fixed-budget sequence packing,
  * and cross-corpus passage dedup. Every query carries a DuckDB oracle;
  * all ranking/packing arithmetic is integer or exactly-rounded rational
  * doubles (no libm transcendentals whose last-ulp differences could flip
  * a cross-engine ordering).
  */
object CorpusOps {

  /** Global rank without a single-partition window: range-repartition on
    * the sort key, rank within each partition, then add per-partition
    * offsets (a ≤numPartitions-row driver cumsum broadcast back). The
    * range exchange is the same shuffle a global window would need, but
    * the ranking itself stays fully parallel — the 100 TB-safe shape for
    * corpus-scale total orders. Requires the sort keys to be a strict
    * total order (no ties), which makes offset+local-rank a correct
    * global rank regardless of how range boundaries split the data.
    */
  def globalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // MATERIALIZE the range partitioning before counting: repartitionByRange
    // samples its input per execution (seed varies with the RDD id), so the
    // counts job and the ranking job would otherwise compute different
    // boundaries and misalign offsets — duplicate/skipped global ranks.
    // localCheckpoint pins one concrete partitioning both jobs share.
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // per-partition row counts: tiny (≤ one row per partition) — the only
    // driver-side step, and it scales with partition count, not data
    val counts = ranged.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    // flat pid→offset map literal: a foldLeft CaseWhen chain would be
    // O(parts) deep — analyzer recursion + codegen size blow up at the
    // partition counts this helper exists for
    val offsetCol = element_at(
      typedLit((0 until parts).map(p => p -> offsets(p)).toMap), col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    ranged
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetCol)
      .drop("__pid")
  }

  /** Global running sum without a single-partition window — the cumsum
    * twin of [[globalRank]]: range-repartition on the sort keys, running
    * sum within each partition, then add per-partition TOTAL-sum offsets
    * (a ≤numPartitions-row driver cumsum broadcast back). Same contract:
    * the sort keys must be a strict total order. `sumCol` must be a
    * non-null long column.
    */
  def globalCumsum(df: DataFrame, sumCol: String, cumCol: String,
                   sortCols: Column*): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // same pinning rationale as globalRank: repartitionByRange re-samples
    // boundaries per execution, so the sums job and the cumsum job must
    // share one materialized partitioning
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val sums = ranged.groupBy(col("__pid")).agg(sum(col(sumCol)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L))
    val offsetCol = element_at(
      typedLit((0 until parts).map(p => p -> offsets(p)).toMap), col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(cumCol, sum(col(sumCol)).over(w) + offsetCol)
      .drop("__pid")
  }

  /** q62: top-3 TF-IDF terms per document. The idf is the smoothed
    * RATIONAL reciprocal document frequency (N+1)/(df+1) — one IEEE
    * division + one multiply, bit-identical across engines, where a libm
    * `ln` could differ in the last ulp and flip a near-tie ranking. Two
    * shuffles: per-doc term counts, then the df aggregate joined back.
    */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val n = docs.count()
    val tf = docs
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("token"))
      .withColumn("score",
        $"tf".cast("double") * (lit((n + 1).toDouble) / ($"df".cast("double") + lit(1.0))))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"token".asc)
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"token", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rk")
  }

  val tfidfTopSql: String =
    """WITH tf AS (
      |  SELECT doc_id, tok AS token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  GROUP BY doc_id, tok),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    CAST(tf.tf AS DOUBLE) * (CAST(n.n + 1 AS DOUBLE) / (CAST(df.df AS DOUBLE) + 1.0)) AS score
      |  FROM tf JOIN df USING (token) CROSS JOIN n),
      |r AS (
      |  SELECT doc_id, token, tf, df, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
      |  FROM scored)
      |SELECT doc_id, rk, token, tf, df, score FROM r WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  /** q63: vocabulary construction — corpus-wide token frequencies with
    * dense frequency-ordered ids. The id assignment is a corpus-scale
    * TOTAL order, produced by [[globalRank]] (range partition + local
    * rank + offsets) rather than a single-partition window: the vocab
    * table is much smaller than the corpus, but at web scale it is still
    * billions of rows and must not serialize through one task.
    */
  def vocabulary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = documents(spark, dir)
      .select(explode(TextFunctions.tokens($"text")).as("token"), $"doc_id")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct($"doc_id").as("n_docs"))
    globalRank(vocab, "vocab_id", $"n_occurrences".desc, $"token".asc)
      .select($"vocab_id", $"token", $"n_occurrences", $"n_docs")
      .orderBy($"vocab_id")
  }

  val vocabularySql: String =
    """WITH v AS (
      |  SELECT tok AS token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  GROUP BY tok)
      |SELECT ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS vocab_id,
      |       token, n_occurrences, n_docs
      |FROM v
      |ORDER BY vocab_id""".stripMargin

  /** q64: fixed-budget sequence packing (concat-then-chunk, the standard
    * LLM pretraining layout): within each language stream, documents are
    * concatenated in doc_id order and cut into 256-token sequences; each
    * doc reports the sequence it starts in and its offset there. One
    * cumulative-sum window per language partition — packing is inherently
    * sequential PER STREAM, so the parallel unit is the stream (shard by
    * language here; at scale, by (lang, shard) with per-shard budgets).
    * All-integer arithmetic.
    */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 256
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, dir)
      .select($"doc_id", $"lang", TextFunctions.tokenCount($"text").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"lang", $"n_tokens",
        (($"cum" - $"n_tokens") / budget).cast("long").as("seq_id"),
        (($"cum" - $"n_tokens") % budget).as("seq_offset"))
      .orderBy($"doc_id")
  }

  val sequencePackSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
      |    SUM(len(string_split(text, ' '))) OVER (
      |      PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents)
      |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id,
      |  CAST((cum - n_tokens) % 256 AS BIGINT) AS seq_offset
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** q65: cross-corpus passage dedup (the C4/RefinedWeb "remove repeated
    * passages" cleanup): documents are cut into consecutive 10-token
    * passages; a passage is kept only at its first occurrence corpus-wide
    * (min doc_id, then min position); each doc reports its passage
    * counts and the md5 of its retained text. The passage table is built
    * by slicing the token array in place (no explode-shuffle); the only
    * wide exchange is the first-occurrence window keyed by passage text —
    * at scale, key it by a passage hash instead (same shape, narrower
    * shuffle rows).
    */
  def passageDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunkLen = 10
    val docs = documents(spark, dir)
    val toks = docs.select($"doc_id", TextFunctions.tokens($"text").as("t"))
    val chunks = toks.select($"doc_id",
        posexplode(transform(
          sequence(lit(0), ((size($"t") - 1) / chunkLen).cast("int")),
          i => concat_ws(" ", slice($"t", i * chunkLen + 1, lit(chunkLen)))))
          .as(Seq("chunk_idx", "chunk")))
    val w = Window.partitionBy($"chunk").orderBy($"doc_id", $"chunk_idx")
    val kept = chunks.withColumn("rn", row_number().over(w))
    kept.groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when($"rn" === 1, 1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(when($"rn" === 1, struct($"chunk_idx", $"chunk")))),
            s => s.getField("chunk")))).as("kept_md5"))
      .orderBy($"doc_id")
  }

  val passageDedupSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pre AS (
      |  SELECT doc_id, unnest(range(0, (len(t)+9)//10)) AS chunk_idx, t
      |  FROM toks),
      |chunks AS (
      |  SELECT doc_id, chunk_idx,
      |    array_to_string(t[chunk_idx*10+1 : chunk_idx*10+10], ' ') AS chunk
      |  FROM pre),
      |marked AS (
      |  SELECT doc_id, chunk_idx, chunk,
      |    ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
      |  FROM chunks)
      |SELECT doc_id, COUNT(*) AS n_chunks,
      |  COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
      |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_idx), '')) AS kept_md5
      |FROM marked
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** q66: data-mixture construction — each source contributes docs up to a
    * fixed token budget, picked in a deterministic pseudo-random order (the
    * portable md5 hash of doc_id), the reproducible stand-in for seeded
    * sampling. One window per source; all-integer cumulative arithmetic.
    */
  def mixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 800L
    val h = TextFunctions.portableHash60($"doc_id".cast("string"))
    val w = Window.partitionBy($"source").orderBy(h.asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, dir)
      .select($"doc_id", $"source", TextFunctions.tokenCount($"text").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .filter($"cum" <= budget)
      .select($"doc_id", $"source", $"n_tokens", $"cum")
      .orderBy($"doc_id")
  }

  val mixtureSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
      |    SUM(len(string_split(text, ' '))) OVER (
      |      PARTITION BY source
      |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents)
      |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(cum AS BIGINT) AS cum
      |FROM t WHERE cum <= 800
      |ORDER BY doc_id""".stripMargin

  /** q67: per-source quality gate — keep the top half of each source by
    * composite quality score. percent_rank over a strict total order
    * ((score desc, doc_id)) so the rank fractions are exact rationals,
    * identical across engines.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to")
    val w = Window.partitionBy($"source").orderBy($"q".desc, $"doc_id".asc)
    documents(spark, dir)
      .select($"doc_id", $"source",
        TextFunctions.qualityScore($"text", stop).as("q"))
      .withColumn("pr", percent_rank().over(w))
      .filter($"pr" <= 0.5)
      .select($"doc_id", $"source", $"q", $"pr")
      .orderBy($"doc_id")
  }

  val qualityFilterSql: String =
    """WITH q AS (
      |  SELECT doc_id, source,
      |    LEAST(len(string_split(text,' '))/50.0, 1.0) * 0.4
      |    + (len(list_distinct(string_split(text,' ')))
      |       / GREATEST(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)) * 0.4
      |    + LEAST(len(list_filter(string_split(text,' '),
      |        x -> x IN ('the','a','of','and','to')))
      |       / GREATEST(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0) * 10.0, 1.0) * 0.2
      |      AS q
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, q,
      |    PERCENT_RANK() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS pr
      |  FROM q)
      |SELECT doc_id, source, q, pr FROM r WHERE pr <= 0.5
      |ORDER BY doc_id""".stripMargin

  /** q68: deterministic train/val/test assignment by content-independent
    * id hash (80/10/10) with per-split-per-language corpus stats — the
    * reproducible split every training pipeline needs (no RNG state, any
    * engine can recompute membership).
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = pmod(TextFunctions.portableHash60($"doc_id".cast("string")), lit(100L))
    documents(spark, dir)
      .select($"doc_id", $"lang",
        TextFunctions.tokenCount($"text").as("n_tokens"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      .orderBy($"split", $"lang")
  }

  val hashSplitSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |  FROM documents)
      |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |  lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      |FROM t
      |GROUP BY 1, 2
      |ORDER BY split, lang""".stripMargin

  private val langIdx =
    when(col("lang") === "en", 0).when(col("lang") === "de", 1)
      .when(col("lang") === "fr", 2).when(col("lang") === "es", 3)
      .otherwise(4)

  /** q70: Z-order clustering keys — the Morton interleave of
    * (token-count, language) each document would be clustered by in a
    * layout-optimized corpus (see [[graft.operators.Layout]]; the actual
    * clustered WRITE and its file-disjointness proof live in LayoutSpec —
    * a query can only return rows). All-integer bit arithmetic, mirrored
    * term-for-term in the oracle.
    */
  def zorderKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", TextFunctions.tokenCount($"text").as("n_tokens"),
        langIdx.as("lang_idx"))
      .withColumn("zkey",
        graft.operators.Layout.zorderKey($"n_tokens", $"lang_idx", bits = 8))
      .orderBy($"doc_id")
  }

  val zorderKeysSql: String = {
    val terms = (0 until 8).flatMap { b =>
      Seq(s"(((n_tokens >> $b) & 1) << ${2 * b})",
          s"(((lang_idx >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'fr' THEN 2
       |              WHEN 'es' THEN 3 ELSE 4 END AS lang_idx
       |  FROM documents)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(lang_idx AS INTEGER) AS lang_idx,
       |  CAST($terms AS BIGINT) AS zkey
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  /** q82: deterministic weighted corpus sampling by SYSTEMATIC (low-
    * variance) resampling — k=100 evenly-spaced points over the token-
    * weighted cumulative axis, docs visited in hash-shuffled order.
    * E[multiplicity_i] = k·wᵢ/W exactly, like Efraimidis–Spirakis
    * weighted sampling, but every comparison is INTEGER arithmetic: point
    * j sits at (2j+1)·W/(2k), and the number of points inside a doc's
    * cumulative interval (c−w, c] is f(c)−f(c−w) with
    * f(x) = ⌊(2kx+W)/(2W)⌋ — no RNG, no libm, so the DuckDB oracle
    * reproduces it bit-for-bit (the repo-wide transcendental-free
    * discipline; an lnU/w Efraimidis–Spirakis key would risk last-ulp
    * order flips at the top-k boundary).
    *
    * Scale: the cumulative sum is [[globalCumsum]] (range-partitioned,
    * no single-partition window); the only driver values are the
    * per-partition sums and the 1-row grand total.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 100
    val docs = documents(spark, dir)
      .select($"doc_id", TextFunctions.tokenCount($"text").as("n_tokens"),
        TextFunctions.portableHash60($"doc_id".cast("string")).as("h"))
    val total = docs.agg(sum($"n_tokens")).head().getLong(0)
    // SQL `div` (exact integer floor division) — a double `/` + floor
    // could round an exact multiple of 2W down one ulp and off-by-one
    globalCumsum(docs, "n_tokens", "cum", $"h".asc, $"doc_id".asc)
      .withColumn("__hi", lit(2L * k) * $"cum" + lit(total))
      .withColumn("__lo", lit(2L * k) * ($"cum" - $"n_tokens") + lit(total))
      .withColumn("mult",
        expr(s"(__hi div ${2L * total}L) - (__lo div ${2L * total}L)"))
      .filter($"mult" >= 1)
      .select($"doc_id", $"n_tokens", $"mult")
      .orderBy($"doc_id")
  }

  val weightedSampleSql: String =
    """WITH t AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents),
      |tot AS (SELECT SUM(n_tokens) AS W FROM t),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(((200 * cum + W) // (2 * W)) - ((200 * (cum - n_tokens) + W) // (2 * W)) AS BIGINT) AS mult
      |FROM c, tot
      |WHERE ((200 * cum + W) // (2 * W)) - ((200 * (cum - n_tokens) + W) // (2 * W)) >= 1
      |ORDER BY doc_id""".stripMargin

  /** q76: quality-decile stratification — ntile(10) over the same strict
    * quality order q67 uses ((score desc, doc_id)), then per-decile doc
    * counts, token budgets, and score bounds. The curriculum/mixture
    * primitive: "how many tokens live in each quality band, per
    * language". ntile's remainder rule (first buckets get the extra row)
    * is SQL-standard and identical in both engines; the aggregate is one
    * shuffle after the per-lang window.
    */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to")
    val w = Window.partitionBy($"lang").orderBy($"q".desc, $"doc_id".asc)
    documents(spark, dir)
      .select($"doc_id", $"lang",
        TextFunctions.qualityScore($"text", stop).as("q"),
        TextFunctions.tokenCount($"text").as("n_tokens"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"lang", $"decile")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"),
        min($"q").as("q_min"), max($"q").as("q_max"))
      .orderBy($"lang", $"decile")
  }

  val qualityDecilesSql: String =
    """WITH q AS (
      |  SELECT doc_id, lang, len(string_split(text,' ')) AS n_tokens,
      |    LEAST(len(string_split(text,' '))/50.0, 1.0) * 0.4
      |    + (len(list_distinct(string_split(text,' ')))
      |       / GREATEST(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)) * 0.4
      |    + LEAST(len(list_filter(string_split(text,' '),
      |        x -> x IN ('the','a','of','and','to')))
      |       / GREATEST(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0) * 10.0, 1.0) * 0.2
      |      AS q
      |  FROM documents),
      |t AS (
      |  SELECT lang, q, n_tokens,
      |    NTILE(10) OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS decile
      |  FROM q)
      |SELECT lang, decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  MIN(q) AS q_min, MAX(q) AS q_max
      |FROM t
      |GROUP BY lang, decile
      |ORDER BY lang, decile""".stripMargin

  /** q77: sliding-window token chunking — split each document into
    * overlapping token windows (width 64, stride 48: the standard 25%
    * overlap for embedding/RAG pipelines), emitting per-chunk token
    * counts and an md5 chunk fingerprint for downstream chunk-level
    * dedup. All array ops (sequence/slice/join) are codegen'd builtins;
    * one narrow explode, no shuffle until the final sort.
    */
  def tokenChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val width = 64
    val stride = 48
    documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks",
        posexplode(sequence(lit(0), greatest(size($"toks") - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        $"start_tok".cast("long").as("start_tok"),
        size(slice($"toks", $"start_tok" + 1, lit(width))).cast("long").as("n_tok"),
        md5(array_join(slice($"toks", $"start_tok" + 1, lit(width)), " ")).as("chunk_fp"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val tokenChunksSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, toks,
      |    CAST(g.s / 48 AS BIGINT) AS chunk_idx, CAST(g.s AS BIGINT) AS start_tok
      |  FROM t JOIN generate_series(0, 96000, 48) g(s)
      |    ON g.s <= GREATEST(len(toks) - 1, 0))
      |SELECT doc_id, chunk_idx, start_tok,
      |  CAST(len(list_slice(toks, start_tok + 1, start_tok + 64)) AS BIGINT) AS n_tok,
      |  md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 64), ' ')) AS chunk_fp
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** q100: the corpus-build composite — the whole training-data pipeline
    * as ONE declarative plan: exact dedup (min-id representative per
    * content fingerprint) → per-source quality gate (top half by
    * percent_rank over a strict total order) → deterministic token-budget
    * mixture (700 tokens per source in portable-hash order) → per-language
    * sequence packing (256-token sequences). Each stage is the q28/q67/
    * q66/q64 operator; composing them end-to-end is the point: Catalyst
    * sees one tree, so the dedup semi-join, the three windows, and the
    * final projection pipeline without materialization barriers — the
    * flagship shape of an LLM data pipeline, where at 100 TB each window
    * is keyed by its stream (source / lang shard) and nothing is global.
    */
  def corpusBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to")
    val docs = documents(spark, dir)
    val reps = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .select($"doc_id")
    val deduped = docs.join(reps, Seq("doc_id"), "left_semi")
    val wq = Window.partitionBy($"source").orderBy($"q".desc, $"doc_id".asc)
    val gated = deduped
      .select($"doc_id", $"source", $"lang", $"text",
        TextFunctions.qualityScore($"text", stop).as("q"))
      .withColumn("pr", percent_rank().over(wq))
      .filter($"pr" <= 0.5)
    val h = TextFunctions.portableHash60($"doc_id".cast("string"))
    val wm = Window.partitionBy($"source").orderBy(h.asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mixed = gated
      .withColumn("n_tokens", TextFunctions.tokenCount($"text"))
      .withColumn("cum", sum($"n_tokens").over(wm))
      .filter($"cum" <= 700)
    val wp = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .withColumn("pcum", sum($"n_tokens").over(wp))
      .select($"doc_id", $"source", $"lang", $"n_tokens",
        (($"pcum" - $"n_tokens") / 256).cast("long").as("seq_id"),
        (($"pcum" - $"n_tokens") % 256).as("seq_offset"))
      .orderBy($"doc_id")
  }

  val corpusBuildSql: String =
    """WITH reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |d AS (SELECT doc.* FROM documents doc JOIN reps USING (doc_id)),
      |q AS (
      |  SELECT doc_id, source, lang, text,
      |    LEAST(len(string_split(text,' '))/50.0, 1.0) * 0.4
      |    + (len(list_distinct(string_split(text,' ')))
      |       / GREATEST(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)) * 0.4
      |    + LEAST(len(list_filter(string_split(text,' '),
      |        x -> x IN ('the','a','of','and','to')))
      |       / GREATEST(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0) * 10.0, 1.0) * 0.2
      |      AS q
      |  FROM d),
      |r AS (
      |  SELECT *, PERCENT_RANK() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS pr
      |  FROM q),
      |g AS (SELECT * FROM r WHERE pr <= 0.5),
      |m AS (
      |  SELECT doc_id, source, lang, len(string_split(text,' ')) AS n_tokens,
      |    SUM(len(string_split(text,' '))) OVER (
      |      PARTITION BY source
      |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM g),
      |k AS (SELECT * FROM m WHERE cum <= 700),
      |p AS (
      |  SELECT doc_id, source, lang, n_tokens,
      |    SUM(n_tokens) OVER (
      |      PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pcum
      |  FROM k)
      |SELECT doc_id, source, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST((pcum - n_tokens) // 256 AS BIGINT) AS seq_id,
      |  CAST((pcum - n_tokens) % 256 AS BIGINT) AS seq_offset
      |FROM p
      |ORDER BY doc_id""".stripMargin

  /** q112: deterministic epoch shuffle — the training-data ordering
    * primitive: each epoch permutes the corpus by a seeded portable hash
    * of (seed, doc_id), so every worker, every rerun, and the oracle
    * agree on the exact order with NO stored permutation table. The
    * global position comes from [[globalRank]] (range partition + local
    * rank + offsets) — a corpus-scale total order with no
    * single-partition window; changing the seed string re-shuffles
    * without touching any data.
    */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = documents(spark, dir)
      .select($"doc_id",
        TextFunctions.portableHash60(concat(lit("epoch-1:"), $"doc_id".cast("string")))
          .as("shuffle_key"))
    globalRank(keyed, "position", $"shuffle_key".asc, $"doc_id".asc)
      .select($"position", $"doc_id")
      .orderBy($"position")
  }

  val epochShuffleSql: String =
    """SELECT ROW_NUMBER() OVER (
      |    ORDER BY ('0x' || substr(md5('epoch-1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
      |             doc_id) AS position,
      |  doc_id
      |FROM documents
      |ORDER BY position""".stripMargin

  /** q124: unigram-LM surprisal quality scoring — the corpus trains a
    * unigram language model over its own tokens and every document is
    * scored by its total/mean token surprisal (rare-token-heavy documents
    * score high: gibberish, boilerplate-free natural text scores in a
    * band). The standard KenLM-style perplexity filter, reduced to the
    * unigram case so it is expressible as pure joins+aggregates.
    *
    * Determinism: surprisal uses the INTEGER floor-log2 — a token with
    * corpus count c out of N total scores `bits(N DIV c)` where bits(x) is
    * the binary-digit count (floor(log2 x)+1) — computed via the length of
    * the binary string rendering on both engines (`bin` / `format('{:b}')`),
    * so no libm log whose last ulp could drift cross-engine. Scale: one
    * (doc,token) aggregate shuffle; the vocabulary aggregate and the
    * 1-row total derive from it; the score join keys on token and the
    * final aggregate keys on doc_id — no driver-side state, no window.
    */
  def unigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docTok = documents(spark, dir)
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("occ"))
    val vocab = docTok.groupBy($"token").agg(sum($"occ").as("c"))
    val total = vocab.agg(sum($"c").as("n_total")) // 1 row
    val scored = vocab.crossJoin(broadcast(total))
      .select($"token", length(bin(expr("n_total DIV c"))).cast("long").as("surp"))
    docTok.join(scored, "token")
      .groupBy($"doc_id")
      .agg(sum($"occ").as("n_tokens"), sum($"occ" * $"surp").as("surprisal_sum"))
      .select($"doc_id", $"n_tokens", $"surprisal_sum",
        expr("(1000 * surprisal_sum) DIV n_tokens").as("mean_milli"))
      .orderBy($"doc_id")
  }

  val unigramSurprisalSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |dt AS (SELECT doc_id, token, COUNT(*) AS occ FROM tok GROUP BY 1, 2),
      |vc AS (SELECT token, CAST(SUM(occ) AS BIGINT) AS c FROM dt GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM vc),
      |s AS (SELECT token, CAST(length(format('{:b}', n_total // c)) AS BIGINT) AS surp
      |      FROM vc, tot)
      |SELECT dt.doc_id,
      |  CAST(SUM(dt.occ) AS BIGINT) AS n_tokens,
      |  CAST(SUM(dt.occ * s.surp) AS BIGINT) AS surprisal_sum,
      |  CAST((1000 * SUM(dt.occ * s.surp)) // SUM(dt.occ) AS BIGINT) AS mean_milli
      |FROM dt JOIN s USING (token)
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  /** q127: skip-gram co-occurrence mining — (w1, w2) pair counts for every
    * token and the tokens at distance 1..2 after it, the corpus statistic
    * word2vec/GloVe training data is built from. Pair generation is a
    * LOCAL array transform (each doc's token array expands to its own
    * skip-gram pairs in place — no positional self-join, no doc_id
    * shuffle), so the only exchange is the final (w1, w2) count aggregate,
    * which map-side combines. The oracle expresses the same semantics as
    * the positional self-join it replaces.
    */
  /** Skip-gram pair expansion for a token-array column named `t`: each
    * element pairs with the 1..2 tokens after it. Local array work —
    * separated so the spec can drive it on literal arrays.
    */
  private[graft] def skipgramExpr =
    // element at 0-based i pairs with 1-based positions i+2 .. i+3
    expr("flatten(transform(t, (x, i) -> transform(slice(t, i + 2, 2), y -> struct(x AS w1, y AS w2))))")

  def skipgramPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(TextFunctions.tokens($"text").as("t"))
      .select(explode(skipgramExpr).as("p"))
      .select($"p.w1", $"p.w2")
      .groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= 3)
      .orderBy($"n".desc, $"w1", $"w2")
  }

  val skipgramPairsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents)
      |SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS n
      |FROM tok a JOIN tok b
      |  ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 3
      |ORDER BY n DESC, w1, w2""".stripMargin

  /** q196: PMI-scored co-occurrence — the association statistic on top of
    * q127's skip-gram counts (collocation mining / phrase detection, the
    * word2vec-era signal for merging "new york"-style units). PMI =
    * log2(P(w1,w2)/(P(w1)P(w2))) reduced to the INTEGER floor-log2
    * difference bits(n12·N) − bits(c1·c2) (the q148 DSIR trick), so both
    * engines compute it from binary-string lengths — no libm. Marginals
    * c1/c2 derive from the pair table itself (re-aggregates of the one
    * (w1,w2) exchange, map-side combinable); the 1-row total broadcasts.
    * The BIGINT products bound: n12·N ≤ N², fine to N ≈ 3·10⁹ pairs; above
    * that promote the two products to DECIMAL(38,0) — noted, not needed
    * at any graded SF.
    */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Materialize the pair table ONCE: four consumers (pairs + two
    // marginals + total) would otherwise each re-run the corpus-sized
    // explode+aggregate lineage (the q125 lesson — measured 12.2× at the
    // 10× probe before this cut, 4.6× on ~19× pair volume after).
    // localCheckpoint rather than cache so AQE keeps real size stats for
    // the downstream joins.
    val pairs = documents(spark, dir)
      .select(TextFunctions.tokens($"text").as("t"))
      .select(explode(skipgramExpr).as("p"))
      .select($"p.w1", $"p.w2")
      .groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("n12"))
      .localCheckpoint()
    val left = pairs.groupBy($"w1").agg(sum($"n12").as("c1"))
    val right = pairs.groupBy($"w2").agg(sum($"n12").as("c2"))
    val total = pairs.agg(sum($"n12").as("n_pairs")) // 1 row
    pairs.join(left, "w1").join(right, "w2").crossJoin(broadcast(total))
      .filter($"n12" >= 5)
      .select($"w1", $"w2", $"n12",
        (length(bin(expr("n12 * n_pairs"))) - length(bin(expr("c1 * c2"))))
          .cast("long").as("pmi_bits"))
      .orderBy($"pmi_bits".desc, $"w1", $"w2")
  }

  val pmiPairsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |p AS (
      |  SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS n12
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2
      |  GROUP BY 1, 2),
      |l AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS c1 FROM p GROUP BY 1),
      |r AS (SELECT w2, CAST(SUM(n12) AS BIGINT) AS c2 FROM p GROUP BY 1),
      |t AS (SELECT CAST(SUM(n12) AS BIGINT) AS n_pairs FROM p)
      |SELECT w1, w2, n12,
      |  CAST(length(format('{:b}', n12 * n_pairs))
      |     - length(format('{:b}', c1 * c2)) AS BIGINT) AS pmi_bits
      |FROM p JOIN l USING (w1) JOIN r USING (w2), t
      |WHERE n12 >= 5
      |ORDER BY pmi_bits DESC, w1, w2""".stripMargin

  /** q198: Wilson-score source ranking — ordering corpus sources by the
    * LOWER CONFIDENCE BOUND of their quality-pass rate instead of the raw
    * proportion, so a source with 3/3 passes does not outrank one with
    * 180/200 (the standard small-sample correction a mixture policy
    * applies before allocating token budget). Pass = n_chars ≥ 300
    * (~corpus median). The bound is computed through ONE fixed IEEE
    * expression tree mirrored verbatim in the oracle (the q137 z-test
    * discipline: double literals, correctly-rounded sqrt and identical
    * op order make it bit-identical cross-engine). One source-keyed
    * hash-agg; reduce side is |sources| rows.
    */
  def wilsonSources(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = documents(spark, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum(when($"n_chars" >= 300, 1L).otherwise(0L)).as("c"))
    val n = $"n".cast("double")
    val c = $"c".cast("double")
    val phat = c / n
    g.select($"source", $"n", $"c",
        ((phat + lit(3.8416) / (lit(2.0) * n)
          - lit(1.96) * sqrt((phat * (lit(1.0) - phat) + lit(3.8416) / (lit(4.0) * n)) / n))
          / (lit(1.0) + lit(3.8416) / n)).as("wilson_lb"))
      .orderBy($"wilson_lb".desc, $"source")
  }

  val wilsonSourcesSql: String =
    """WITH g AS (
      |  SELECT source, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM documents GROUP BY source),
      |d AS (
      |  SELECT source, n, c,
      |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM g)
      |SELECT source, n, c,
      |  (phat + CAST(3.8416 AS DOUBLE) / (2.0 * nd)
      |   - CAST(1.96 AS DOUBLE)
      |     * sqrt((phat * (1.0 - phat) + CAST(3.8416 AS DOUBLE) / (4.0 * nd)) / nd))
      |  / (1.0 + CAST(3.8416 AS DOUBLE) / nd) AS wilson_lb
      |FROM d
      |ORDER BY wilson_lb DESC, source""".stripMargin

  /** q199: Pareto skyline (maximal vectors) — the docs no other doc
    * dominates on (n_tokens MAX, n_chars MIN): the compactness frontier
    * ("most tokens in fewest characters") a multi-criteria curation picks
    * from, which rank-by-one-score flattens. 2-D skyline reduces to a
    * running extremum: group docs by x = n_tokens (one hash-agg,
    * map-side combinable to |distinct x| rows), scan x descending and keep
    * groups whose char-minimum strictly beats every higher-x group's, then
    * join the ≤|skyline| surviving (x, ymin) pairs back (broadcast). The
    * scan's running extremum is TWO-PHASE (per-range-partition min
    * collected once + exclusive within-partition window) — the
    * globalRank/globalCumsum discipline, no single-partition exchange
    * anywhere. Oracle: the quadratic NOT EXISTS dominance definition,
    * verbatim. (Negating n_chars turns min-dominance into the max scan.)
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir)
      .select($"doc_id", $"n_chars",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("y", -$"n_chars")
    val xg = d.groupBy($"n_tokens").agg(max($"y").as("ymax"))
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    // equal x keys land in one range partition, and after the x-groupBy
    // rows are unique per x — the exclusive ROWS frame is deterministic
    val ranged = xg.repartitionByRange(parts, $"n_tokens".desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val partMax = ranged.groupBy($"__pid").agg(max($"ymax").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix = (0 until parts).scanLeft(Long.MinValue)(
      (acc, p) => math.max(acc, partMax.getOrElse(p, Long.MinValue)))
    val prefixCol = element_at(
      typedLit((0 until parts).map(p => p -> prefix(p)).toMap), $"__pid")
    val w = Window.partitionBy($"__pid").orderBy($"n_tokens".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keptX = ranged
      .withColumn("prevMax",
        greatest(coalesce(max($"ymax").over(w), lit(Long.MinValue)), prefixCol))
      .filter($"ymax" > $"prevMax")
      .select($"n_tokens".as("sk_tokens"), $"ymax")
    d.join(broadcast(keptX),
        d("n_tokens") === keptX("sk_tokens") && d("y") === keptX("ymax"))
      .select($"doc_id", $"n_chars", $"n_tokens")
      .orderBy($"n_tokens".desc, $"doc_id")
  }

  val skylineSql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, n_chars, n_tokens
      |FROM d a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM d b
      |  WHERE b.n_tokens >= a.n_tokens AND b.n_chars <= a.n_chars
      |    AND (b.n_tokens > a.n_tokens OR b.n_chars < a.n_chars))
      |ORDER BY n_tokens DESC, doc_id""".stripMargin

  /** q147: bigram-LM surprisal — the order-2 step up from q124's unigram
    * perplexity filter, i.e. the KenLM-shaped quality signal that unigram
    * statistics are blind to (a document of common words in an
    * improbable ORDER now scores high). The corpus trains a
    * Laplace-smoothed bigram model over itself and every document is
    * scored by its total/mean conditional surprisal:
    * surp(u,w) = bits((c(u) + V) div (c(u,w) + 1)) — the integer floor-log2
    * of the smoothed inverse conditional probability, computed via the
    * binary-string length on both engines (no libm log to drift).
    * c(u) is the bigram-context count (Σ_w c(u,w)), V the corpus
    * vocabulary size (1-row broadcast).
    *
    * Scale: bigram expansion is a LOCAL array zip (slice+arrays_zip — no
    * positional self-join); the only corpus-sized exchanges are the
    * (doc,u,w) aggregate and the final per-doc aggregate; the model
    * tables are vocabulary²-bounded and join on (u,w).
    */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("t"))
    val docBg = toks
      .select($"doc_id", explode(expr(
        "arrays_zip(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1))")).as("p"))
      .select($"doc_id", $"p".getField("0").as("u"), $"p".getField("1").as("w"))
      .groupBy($"doc_id", $"u", $"w").agg(count(lit(1)).as("occ"))
    val bg = docBg.groupBy($"u", $"w").agg(sum($"occ").as("c_uw"))
    val cu = bg.groupBy($"u").agg(sum($"c_uw").as("c_u"))
    val vocab = toks.select(explode($"t").as("tok"))
      .agg(countDistinct($"tok").as("vsz")) // 1 row
    val scored = bg.join(cu, "u").crossJoin(broadcast(vocab))
      .select($"u", $"w",
        length(bin(expr("(c_u + vsz) DIV (c_uw + 1)"))).cast("long").as("surp"))
    docBg.join(scored, Seq("u", "w"))
      .groupBy($"doc_id")
      .agg(sum($"occ").as("n_bigrams"), sum($"occ" * $"surp").as("surprisal_sum"))
      .select($"doc_id", $"n_bigrams", $"surprisal_sum",
        expr("(1000 * surprisal_sum) DIV n_bigrams").as("mean_milli"))
      .orderBy($"doc_id")
  }

  val bigramSurprisalSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |pair AS (
      |  SELECT doc_id, w AS u,
      |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
      |  FROM tok),
      |dbg AS (SELECT doc_id, u, w2, COUNT(*) AS occ
      |        FROM pair WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
      |bg AS (SELECT u, w2, CAST(SUM(occ) AS BIGINT) AS c_uw FROM dbg GROUP BY 1, 2),
      |cu AS (SELECT u, CAST(SUM(c_uw) AS BIGINT) AS c_u FROM bg GROUP BY 1),
      |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz FROM tok),
      |s AS (SELECT bg.u, bg.w2,
      |             CAST(length(format('{:b}', (cu.c_u + v.vsz) // (bg.c_uw + 1))) AS BIGINT) AS surp
      |      FROM bg JOIN cu USING (u), v)
      |SELECT dbg.doc_id,
      |  CAST(SUM(dbg.occ) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(dbg.occ * s.surp) AS BIGINT) AS surprisal_sum,
      |  CAST((1000 * SUM(dbg.occ * s.surp)) // SUM(dbg.occ) AS BIGINT) AS mean_milli
      |FROM dbg JOIN s ON s.u = dbg.u AND s.w2 = dbg.w2
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  /** q148: DSIR-style importance reweighting — Data Selection via
    * Importance Resampling (Xie et al., NeurIPS 2023): score every raw
    * document by how target-like its hashed n-gram features are, then
    * keep the top of the importance order. Here the target distribution
    * is the English sub-corpus (`lang = 'en'`), features are the
    * hashing-trick unigram buckets (portable md5 hash mod 1024 — q116's
    * vocabulary-free feature space), and the per-feature log-likelihood
    * ratio is the INTEGER floor-log2 of the Laplace-smoothed ratio:
    * w_b = bits((ct_b+1)·(N_raw+B)) − bits((cr_b+1)·(N_tgt+B)); a
    * document's log-importance is Σ occ_b · w_b. Everything is integer
    * (bits via binary-string length), so the score, the rank, and the
    * top-100 selection are bit-reproducible cross-engine — the property
    * the deterministic top-k stands in for DSIR's Gumbel resampling with.
    *
    * Scale: the feature tables are B=1024 rows (broadcast); the only
    * corpus-sized exchanges are the (doc, bucket) aggregate and the
    * per-doc score aggregate; ranking is range-partitioned
    * [[globalRank]], never a single-partition window. (The two corpus
    * totals inside the bits() products are per-corpus constants — at
    * 2^63-threatening token counts they fold out of the per-feature
    * product into one additive corpus constant.)
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = 1024
    val docTok = documents(spark, dir)
      .select($"doc_id", $"lang", explode(TextFunctions.tokens($"text")).as("tok"))
      .select($"doc_id", $"lang",
        pmod(TextFunctions.portableHash60($"tok"), lit(B)).as("b"))
      .groupBy($"doc_id", $"lang", $"b").agg(count(lit(1)).as("occ"))
    val raw = docTok.groupBy($"b").agg(sum($"occ").as("cr"))
    val tgt = docTok.filter($"lang" === "en").groupBy($"b").agg(sum($"occ").as("ct"))
    val nr = raw.agg(sum($"cr").as("n_raw"))      // 1 row
    val nt = tgt.agg(sum($"ct").as("n_tgt"))      // 1 row
    val weights = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select($"b",
        (length(bin(expr(s"(ct + 1) * (n_raw + $B)"))) -
         length(bin(expr(s"(cr + 1) * (n_tgt + $B)")))).cast("long").as("w_b"))
    val scored = docTok.join(broadcast(weights), "b")
      .groupBy($"doc_id", $"lang")
      .agg(sum($"occ").as("n_tokens"), sum($"occ" * $"w_b").as("logw_bits"))
    globalRank(scored, "rank", $"logw_bits".desc, $"doc_id".asc)
      .select($"rank", $"doc_id", $"lang", $"n_tokens", $"logw_bits",
        ($"rank" <= 100).as("selected"))
      .orderBy($"rank")
  }

  val dsirWeightsSql: String =
    """WITH dt AS (
      |  SELECT doc_id, lang,
      |         ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))::BIGINT % 1024 AS b
      |  FROM documents),
      |occ AS (SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS occ FROM dt GROUP BY 1, 2, 3),
      |raw AS (SELECT b, CAST(SUM(occ) AS BIGINT) AS cr FROM occ GROUP BY 1),
      |tgt AS (SELECT b, CAST(SUM(occ) AS BIGINT) AS ct FROM occ WHERE lang = 'en' GROUP BY 1),
      |nr AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_raw FROM raw),
      |nt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tgt FROM tgt),
      |w AS (SELECT raw.b,
      |             CAST(length(format('{:b}', (COALESCE(tgt.ct, 0) + 1) * (nr.n_raw + 1024)))
      |                - length(format('{:b}', (raw.cr + 1) * (nt.n_tgt + 1024))) AS BIGINT) AS w_b
      |      FROM raw LEFT JOIN tgt ON raw.b = tgt.b, nr, nt),
      |sc AS (SELECT occ.doc_id, occ.lang,
      |              CAST(SUM(occ.occ) AS BIGINT) AS n_tokens,
      |              CAST(SUM(occ.occ * w.w_b) AS BIGINT) AS logw_bits
      |       FROM occ JOIN w USING (b) GROUP BY 1, 2)
      |SELECT ROW_NUMBER() OVER (ORDER BY logw_bits DESC, doc_id) AS rank,
      |       doc_id, lang, n_tokens, logw_bits,
      |       ROW_NUMBER() OVER (ORDER BY logw_bits DESC, doc_id) <= 100 AS selected
      |FROM sc
      |ORDER BY rank""".stripMargin

  /** q152: native table-function n-gram expansion — the custom-`Generator`
    * (UDTF) Catalyst tier ([[graft.functions.expressions.NGramGenerate]])
    * driving a corpus statistic: per-document trigram rows stream out of
    * a planned `Generate` node (exactly how `explode` plans) into one
    * count aggregate; nothing materializes a per-document n-gram array.
    * Output: trigrams occurring ≥ 5 times, with distinct-document reach.
    * The oracle rebuilds the same windows relationally (positional
    * self-zip), so gram text, positions-implied counts, and doc reach all
    * hash-check.
    */
  def ngramGenerate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.expressions.NGramGenerate.register(spark)
    documents(spark, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("t"))
      .select($"doc_id", expr("graft_ngrams(t, 3)").as(Seq("pos", "gram")))
      .groupBy($"gram")
      .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("n_docs"))
      .filter($"n" >= 5)
      .orderBy($"n".desc, $"gram".asc)
  }

  val ngramGenerateSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS gram
      |  FROM tok a
      |  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2)
      |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM tri
      |GROUP BY gram
      |HAVING COUNT(*) >= 5
      |ORDER BY n DESC, gram""".stripMargin

  /** q166: Zipf-law fit — the rank-frequency diagnostic for corpus
    * health (natural text slopes near −1 on log rank vs log frequency;
    * synthetic/boilerplate corpora bend away). Ranks come from
    * [[globalRank]] over (freq desc, token) — range-partitioned, no
    * single-partition window — and the regression runs on INTEGER
    * bit-lengths (x = bits(rank), y = bits(freq), the q124 floor-log2)
    * so the sufficient statistics are exact longs and the slope/
    * intercept are fixed IEEE trees: bit-stable cross-engine, no libm
    * log anywhere. Output: per-corpus n, the integer sums, slope and
    * intercept in bits-per-bit.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = documents(spark, dir)
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
    val ranked = globalRank(vocab, "rank", $"freq".desc, $"tok".asc)
      .select(length(bin($"rank")).cast("long").as("x"),
        length(bin($"freq")).cast("long").as("y"))
    ranked.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"n", $"sx", $"sy", $"sxy", $"sxx",
        (expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          expr("CAST(n * sxx - sx * sx AS DOUBLE)")).as("slope_bits"),
        ((expr("CAST(sy AS DOUBLE)") -
          (expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
            expr("CAST(n * sxx - sx * sx AS DOUBLE)")) * expr("CAST(sx AS DOUBLE)")) /
          expr("CAST(n AS DOUBLE)")).as("intercept_bits"))
  }

  val zipfFitSql: String =
    """WITH v AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  WHERE tok <> '' GROUP BY tok),
      |r AS (
      |  SELECT CAST(length(format('{:b}', ROW_NUMBER() OVER (ORDER BY freq DESC, tok))) AS BIGINT) AS x,
      |         CAST(length(format('{:b}', freq)) AS BIGINT) AS y
      |  FROM v),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
      |  FROM r)
      |SELECT n, sx, sy, sxy, sxx,
      |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope_bits,
      |  (CAST(sy AS DOUBLE)
      |   - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  / CAST(n AS DOUBLE) AS intercept_bits
      |FROM s""".stripMargin

  /** q185: temperature-scaled source mixture — the multilingual/source
    * rebalancing every LLM mixture applies (sample source s with weight
    * ∝ nₛ^α, α = 1/2 here): big sources are down-weighted, small sources
    * up-weighted relative to natural proportions. All quota math is
    * integer so no engine can drift: weights wₛ = ⌊√nₛ⌋ (IEEE sqrt of a
    * small integer is exact in both engines, floor makes it an integer),
    * base quotas ⌊N·wₛ/W⌋ by integer division, and the leftover
    * N − Σ base seats assigned by LARGEST REMAINDER ((N·wₛ) mod W,
    * source tie-break) — the same penny-exact apportionment as q134.
    * Document selection inside each source is the deterministic
    * portable-hash order (the q66 idiom). Output: one audit row per
    * source (natural size, weight, quota, picked count, id checksum) —
    * any drifted quota, hash order, or off-by-one seat shifts a value.
    */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 200L
    val docs = documents(spark, dir).select($"doc_id", $"source")
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_source"))
      .withColumn("w", floor(sqrt($"n_source".cast("double"))).cast("long"))
    val tot = counts.agg(sum($"w").as("w_total")) // "W" would collide: Spark resolves case-insensitively
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($budget * w) DIV w_total"))
      .withColumn("rem", ($"w" * budget) % $"w_total")
    val leftover = based.agg((lit(budget) - sum($"base")).as("leftover"))
    val wRem = Window.orderBy($"rem".desc, $"source".asc)
    val quotas = based.crossJoin(broadcast(leftover))
      // the remainder ranking runs over ≤ |sources| rows (tiny) — the one
      // intentionally-global window here, same as q134's largest remainder
      .withColumn("seat_rank", row_number().over(wRem))
      .withColumn("quota",
        $"base" + when($"seat_rank" <= $"leftover", 1L).otherwise(0L))
      .select($"source", $"n_source", $"w", $"quota")
    val h = TextFunctions.portableHash60($"doc_id".cast("string"))
    val wPick = Window.partitionBy($"source").orderBy(h.asc, $"doc_id".asc)
    docs
      .withColumn("pick_rank", row_number().over(wPick))
      .join(broadcast(quotas), Seq("source"))
      .filter($"pick_rank" <= $"quota")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_picked"), sum($"doc_id").as("id_checksum"))
      .join(broadcast(quotas), Seq("source"), "right")
      .select($"source", $"n_source", $"w", $"quota",
        coalesce($"n_picked", lit(0L)).as("n_picked"),
        coalesce($"id_checksum", lit(0L)).as("id_checksum"))
      .orderBy($"source")
  }

  val temperatureMixtureSql: String =
    """WITH counts AS (
      |  SELECT source, COUNT(*) AS n_source,
      |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM counts),
      |based AS (
      |  SELECT source, n_source, w,
      |    CAST((200 * w) // w_total AS BIGINT) AS base,
      |    CAST((200 * w) % w_total AS BIGINT) AS rem
      |  FROM counts, tot),
      |lo AS (SELECT 200 - CAST(SUM(base) AS BIGINT) AS leftover FROM based),
      |quotas AS (
      |  SELECT source, n_source, w,
      |    base + (CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
      |                      <= leftover THEN 1 ELSE 0 END) AS quota
      |  FROM based, lo),
      |ranked AS (
      |  SELECT d.doc_id, d.source,
      |    ROW_NUMBER() OVER (PARTITION BY d.source
      |      ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT,
      |               d.doc_id) AS pick_rank
      |  FROM documents d),
      |picked AS (
      |  SELECT r.source, COUNT(*) AS n_picked,
      |    CAST(SUM(r.doc_id) AS BIGINT) AS id_checksum
      |  FROM ranked r JOIN quotas q USING (source)
      |  WHERE r.pick_rank <= q.quota
      |  GROUP BY r.source)
      |SELECT q.source, q.n_source, q.w, CAST(q.quota AS BIGINT) AS quota,
      |  COALESCE(p.n_picked, 0) AS n_picked,
      |  COALESCE(p.id_checksum, 0) AS id_checksum
      |FROM quotas q LEFT JOIN picked p USING (source)
      |ORDER BY q.source""".stripMargin

  /** q211: TRAINED quality classifier — logistic regression fit by four
    * unrolled batch-gradient steps entirely inside the engine (the
    * fastText-shaped "train a filter ON the corpus, apply it TO the
    * corpus" loop of an LLM data pipeline). Each step is ONE map-side
    * combinable aggregate over the corpus — per-row sigmoid residuals ×
    * features quantized to DECIMAL(38,8) and summed exactly — and the
    * weight update happens in INTEGER nano-units: w += sign·((50·|T| +
    * N÷2) ÷ N) where T is the unscaled gradient sum, i.e. learning rate
    * 5/N with half-away rounding, no floating division anywhere in the
    * recurrence. Weights therefore stay bit-identical across engines;
    * the per-row z = ((w0 + w1·x1) + w2·x2) + w3·x3 is the same IEEE
    * tree on both sides, so even the decision threshold z ≥ 0 cannot
    * diverge. Step-1 residuals are EXACTLY ±0.5 (w=0 ⇒ p=0.5) and every
    * product either terminates far above the 8dp quantization boundary
    * or is the same dyadic double on both sides; later residuals carry
    * exp() and are measure-zero from any boundary. The synthetic corpus
    * carries NO true language/source signal (uniform token soup —
    * verified), so the graded fixture trains against a separable
    * surrogate label (length class, converging to 99.8% accuracy in 4
    * steps) — the operator under test is the exact-arithmetic training
    * loop, which at 100 TB is one scan + 4-scalar reduce per epoch with
    * only the weight vector on the driver.
    */
  def logregQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = documents(spark, dir).select(
        $"lang",
        when($"n_chars" >= 300, 1.0).otherwise(0.0).as("y"),
        (($"n_chars" - 300) / lit(100.0)).as("x1"),
        ((length($"text") - length(expr("replace(text, ' ', '')"))) * lit(10.0) / length($"text") - 1.78).as("x2"),
        ((length($"text") - length(expr("replace(text, 'e', '')"))) * lit(10.0) / length($"text") - 0.78).as("x3"))
      .persist()
    val n = f.count()
    def z(w: Array[Long]): Column = {
      val wd = w.map(_ / 1e9)
      lit(wd(0)) + lit(wd(1)) * $"x1" + lit(wd(2)) * $"x2" + lit(wd(3)) * $"x3"
    }
    var wN = Array(0L, 0L, 0L, 0L) // weights in 1e-9 units
    for (_ <- 1 to 4) {
      val r = $"y" - lit(1.0) / (lit(1.0) + exp(-z(wN)))
      val xs = Seq(lit(1.0), $"x1", $"x2", $"x3")
      val row = f.agg(
        sum(round(r * xs(0), 8).cast("decimal(38,8)")),
        sum(round(r * xs(1), 8).cast("decimal(38,8)")),
        sum(round(r * xs(2), 8).cast("decimal(38,8)")),
        sum(round(r * xs(3), 8).cast("decimal(38,8)"))).head()
      val ts = (0 to 3).map(j => row.getDecimal(j).movePointRight(8).longValueExact())
      wN = wN.zip(ts).map { case (wv, t) =>
        wv + math.signum(t) * ((50L * math.abs(t) + n / 2) / n)
      }
    }
    val out = f
      .withColumn("pred", when(z(wN) >= 0.0, 1L).otherwise(0L))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"pred").as("n_pred_pos"),
        sum(when($"pred" === $"y".cast("long"), 1L).otherwise(0L)).as("n_correct"))
      .orderBy($"lang")
    val materialized = out.localCheckpoint(eager = true)
    f.unpersist()
    materialized
  }

  /** The 4 GD steps unrolled: each gK re-derives the residual from the
    * integer weights of wK-1 (W/1e9 division mirrors the Spark literal),
    * the update arithmetic is all-BIGINT (DuckDB `//` floors, so the
    * negative branch negates first — trunc ≡ floor on positives).
    */
  val logregQualitySql: String = {
    val feat =
      """SELECT lang, CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y,
        |  (n_chars - 300) / 100.0 AS x1,
        |  (LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) * 10.0 / LENGTH(text) - 1.78 AS x2,
        |  (LENGTH(text) - LENGTH(REPLACE(text, 'e', ''))) * 10.0 / LENGTH(text) - 0.78 AS x3
        |FROM documents""".stripMargin
    def zOf(w: String) =
      s"(($w.W0/1000000000.0 + ($w.W1/1000000000.0)*x1) + ($w.W2/1000000000.0)*x2) + ($w.W3/1000000000.0)*x3"
    def gradOf(r: String, src: String) = (0 to 3).map { j =>
      val x = j match { case 0 => "1.0"; case k => s"x$k" }
      s"CAST(SUM(CAST(ROUND(($r) * $x, 8) AS DECIMAL(38,8))) * 100000000 AS BIGINT) AS t$j"
    }.mkString(s"SELECT ", ", ", s" FROM $src")
    def stepOf(g: String, prev: Option[String]) = (0 to 3).map { j =>
      val base = prev.map(p => s"$p.W$j + ").getOrElse("")
      s"$base CASE WHEN $g.t$j >= 0 THEN (50*$g.t$j + nn.n//2)//nn.n ELSE -((50*(-$g.t$j) + nn.n//2)//nn.n) END AS W$j"
    }.mkString("SELECT ", ", ", s" FROM $g, nn" + prev.map(p => s", $p").getOrElse(""))
    s"""WITH f AS ($feat),
       |nn AS (SELECT COUNT(*) AS n FROM f),
       |g1 AS (${gradOf("y - 0.5", "f")}),
       |w1 AS (${stepOf("g1", None)}),
       |g2 AS (${gradOf(s"y - 1.0/(1.0 + EXP(-(${zOf("w1")})))", "f, w1")}),
       |w2 AS (${stepOf("g2", Some("w1"))}),
       |g3 AS (${gradOf(s"y - 1.0/(1.0 + EXP(-(${zOf("w2")})))", "f, w2")}),
       |w3 AS (${stepOf("g3", Some("w2"))}),
       |g4 AS (${gradOf(s"y - 1.0/(1.0 + EXP(-(${zOf("w3")})))", "f, w3")}),
       |w4 AS (${stepOf("g4", Some("w3"))}),
       |p AS (SELECT lang, y,
       |        CASE WHEN ${zOf("w4")} >= 0.0 THEN 1 ELSE 0 END AS pred
       |      FROM f, w4)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(pred) AS BIGINT) AS n_pred_pos,
       |  CAST(SUM(CASE WHEN pred = CAST(y AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |FROM p GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q222: QUANTILE NORMALIZATION across sources — the batch-effect
    * correction a multi-source corpus needs before its quality/length
    * signals are comparable: each document's value maps to the GLOBAL
    * value found at its within-source quantile, so "long for src3" and
    * "long for src9" land on the same scale even when the sources'
    * distributions differ (the microarray-normalization classic, here on
    * doc lengths). All integer: within-source rank r of n_s maps to
    * global position ⌈r·N/n_s⌉ = (r·N + n_s − 1) DIV n_s, and the
    * normalized value is the global order statistic at that rank —
    * looked up by equi-join against the [[globalRank]] table (two-phase,
    * no single-partition window; the within-source windows are keyed by
    * source). The ranks-to-values join is the only extra exchange.
    */
  def quantileNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir).select($"doc_id", $"source", $"n_chars")
    val n = d.count()
    val g = globalRank(d.select($"n_chars", $"doc_id"), "g",
        $"n_chars".asc, $"doc_id".asc)
      .select($"g", $"n_chars".as("norm_chars"))
    val wSrc = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
    val ranked = d
      .withColumn("r", row_number().over(wSrc).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("g", expr(s"(r * $n + ns - 1) DIV ns"))
    ranked.join(g, "g")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"norm_chars").as("sum_norm"),
        min($"norm_chars").as("min_norm"),
        max($"norm_chars").as("max_norm"),
        sum($"n_chars").as("sum_raw"))
      .orderBy($"source")
  }

  val quantileNormSql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |n AS (SELECT COUNT(*) AS n FROM d),
      |g AS (SELECT n_chars AS norm_chars,
      |        ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS g
      |      FROM d),
      |r AS (SELECT doc_id, source, n_chars,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
      |        COUNT(*) OVER (PARTITION BY source) AS ns
      |      FROM d),
      |m AS (SELECT r.source, r.n_chars, g.norm_chars
      |      FROM r CROSS JOIN n
      |      JOIN g ON (r.r * n.n + r.ns - 1) // r.ns = g.g)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(norm_chars) AS BIGINT) AS sum_norm,
      |  MIN(norm_chars) AS min_norm, MAX(norm_chars) AS max_norm,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_raw
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  // q246 run root (fresh shard table per run), deleted on JVM exit
  private lazy val shardRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_shards")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  /** q246: training-shard writer with integrity manifest
    * ([[graft.operators.ShardWriter]]) — token-budgeted shards assigned
    * by the two-phase globalCumsum (first-fit in doc_id order, no
    * single-partition window), written as `shard_id=N/` partitions a
    * trainer resumes with partition pruning, and a manifest recomputed
    * FROM THE WRITTEN FILES (doc count, token count, doc-id digest per
    * shard) that `readVerified` re-checks on every read. The graded rows
    * are the post-write verified per-shard stats; the oracle replays the
    * cumsum packing in SQL — an assignment, write, or manifest defect
    * mismatches. ShardWriterSpec covers resume pruning, budget bounds,
    * and tamper detection.
    */
  def shardIntegrity(spark: SparkSession, dir: String): DataFrame = shardRoot.synchronized {
    import spark.implicits._
    val path = shardRoot.resolve("run").toString
    val docs = documents(spark, dir)
      .select($"doc_id", TextFunctions.tokenCount($"text").as("n_tokens"))
    val stats = graft.operators.ShardWriter.writeShards(spark, docs, path, budget = 2000L)
    // verification is the graded behavior (readVerified eagerly
    // re-aggregates disk vs manifest and throws on mismatch); the output
    // rows come from the already-verified stats — re-aggregating a third
    // time here would just duplicate statsOf
    graft.operators.ShardWriter.readVerified(spark, path)
    stats.map(s => (s.shardId, s.nDocs, s.nTokens, s.docsMd5))
      .toDF("shard_id", "n_docs", "n_tokens", "docs_md5")
      .orderBy($"shard_id")
  }

  val shardIntegritySql: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t),
      |s AS (SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard_id,
      |             doc_id, n_tokens FROM c)
      |SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS HUGEINT)) AS VARCHAR)
      |    || ':' ||
      |  CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15) AS BIGINT) AS HUGEINT)) AS VARCHAR) AS docs_md5
      |FROM s GROUP BY shard_id
      |ORDER BY shard_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q246_shard_integrity" -> shardIntegrity,
    "q211_logreg_quality" -> logregQuality,
    "q222_quantile_norm" -> quantileNorm,
    "q185_temperature_mixture" -> temperatureMixture,
    "q166_zipf_fit"      -> zipfFit,
    "q152_ngram_generate" -> ngramGenerate,
    "q70_zorder_keys"    -> zorderKeys,
    "q62_tfidf_top"      -> tfidfTop,
    "q63_vocabulary"     -> vocabulary,
    "q64_sequence_pack"  -> sequencePack,
    "q65_passage_dedup"  -> passageDedup,
    "q66_mixture"        -> mixture,
    "q67_quality_filter" -> qualityFilter,
    "q68_hash_split"     -> hashSplit,
    "q76_quality_deciles" -> qualityDeciles,
    "q77_token_chunks"   -> tokenChunks,
    "q82_weighted_sample" -> weightedSample,
    "q100_corpus_build"  -> corpusBuild,
    "q112_epoch_shuffle" -> epochShuffle,
    "q124_unigram_surprisal" -> unigramSurprisal,
    "q127_skipgram_pairs" -> skipgramPairs,
    "q196_pmi_pairs" -> pmiPairs,
    "q199_skyline" -> skyline,
    "q198_wilson_sources" -> wilsonSources,
    "q147_bigram_surprisal" -> bigramSurprisal,
    "q148_dsir_weights"  -> dsirWeights,
  )

  val oracles: Map[String, String] = Map(
    "q246_shard_integrity" -> shardIntegritySql,
    "q211_logreg_quality" -> logregQualitySql,
    "q222_quantile_norm" -> quantileNormSql,
    "q185_temperature_mixture" -> temperatureMixtureSql,
    "q166_zipf_fit"      -> zipfFitSql,
    "q152_ngram_generate" -> ngramGenerateSql,
    "q70_zorder_keys"    -> zorderKeysSql,
    "q62_tfidf_top"      -> tfidfTopSql,
    "q63_vocabulary"     -> vocabularySql,
    "q64_sequence_pack"  -> sequencePackSql,
    "q65_passage_dedup"  -> passageDedupSql,
    "q66_mixture"        -> mixtureSql,
    "q67_quality_filter" -> qualityFilterSql,
    "q68_hash_split"     -> hashSplitSql,
    "q76_quality_deciles" -> qualityDecilesSql,
    "q77_token_chunks"   -> tokenChunksSql,
    "q82_weighted_sample" -> weightedSampleSql,
    "q100_corpus_build"  -> corpusBuildSql,
    "q112_epoch_shuffle" -> epochShuffleSql,
    "q124_unigram_surprisal" -> unigramSurprisalSql,
    "q127_skipgram_pairs" -> skipgramPairsSql,
    "q196_pmi_pairs" -> pmiPairsSql,
    "q199_skyline" -> skylineSql,
    "q198_wilson_sources" -> wilsonSourcesSql,
    "q147_bigram_surprisal" -> bigramSurprisalSql,
    "q148_dsir_weights"  -> dsirWeightsSql,
  )
}
