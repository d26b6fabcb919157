package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — tokenizer
  * induction as a data-pipeline operator: from a word-frequency table,
  * repeatedly find the most frequent adjacent symbol pair (ties broken
  * lexicographically) and merge it everywhere, emitting the learned
  * merge table.
  *
  * Scale shape: the ONLY corpus-sized pass is the word-frequency
  * aggregate the caller feeds in; every iteration then runs on the
  * vocabulary table (|V| rows — thousands, not billions — independent of
  * corpus size, which is why production BPE trainers all operate on the
  * aggregated vocab). The per-iteration argmax collects exactly one row.
  *
  * Merge application is a LEFT FOLD over each word's symbol array
  * (`aggregate` over the index sequence): greedy left-to-right, so in an
  * overlapping run like `aaa` + merge (a,a) the first pair wins and the
  * result is [aa, a] — the reference semantics of every BPE
  * implementation. The DuckDB oracle reproduces this sequential scan
  * relationally (candidate positions → consecutive-run islands → keep
  * even offsets within each run), which is provably the same selection:
  * overlaps only occur inside runs of a repeated symbol, and a left
  * fold keeps exactly the even-offset candidates of each maximal run.
  *
  * Determinism: pair counts are integer sums of word frequencies;
  * argmax ties break on (left, right) strings. No floats anywhere.
  */
object Bpe {

  /** Split a word into single-character symbols (no end-of-word marker;
    * documented divergence from Sennrich's `</w>` — the merge dynamics
    * are identical, only word-final merges differ).
    */
  def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Adjacent symbol pairs of one symbol array as structs (l, r);
    * empty for single-symbol words (a bare `sequence(0, size-2)` would
    * flip into a descending sequence when size = 1).
    */
  def pairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2), i =>
        struct(element_at(syms, i + 1).as("l"), element_at(syms, i + 2).as("r"))))
      .otherwise(typedLit(Seq.empty[(String, String)])
        .cast("array<struct<l:string,r:string>>"))

  /** One greedy left-to-right merge pass: replace every non-overlapping
    * (l, r) occurrence with the concatenated symbol, first-pair-wins.
    */
  def applyMerge(syms: Column, l: String, r: String): Column = {
    val merged = lit(l + r)
    val folded = aggregate(
      sequence(lit(0), size(syms) - 1),
      struct(typedLit(Seq.empty[String]).as("acc"), lit(false).as("skip")),
      (st, i) => {
        val cur = element_at(syms, i + 1)
        val nxt = try_element_at(syms, i + 2)
        when(st.getField("skip"),
          struct(st.getField("acc").as("acc"), lit(false).as("skip")))
          .when(cur === lit(l) && nxt === lit(r),
            struct(concat(st.getField("acc"), array(merged)).as("acc"), lit(true).as("skip")))
          .otherwise(
            struct(concat(st.getField("acc"), array(cur)).as("acc"), lit(false).as("skip")))
      },
      st => st.getField("acc"))
    folded
  }

  /** Learn `k` merges from a (word, freq) vocabulary. Returns the merge
    * table (rank, lhs, rhs, pair_count) as a local result lifted back to
    * a DataFrame — the iterations themselves run as Spark aggregates
    * over the vocab.
    */
  def learn(vocab: DataFrame, k: Int): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    var cur = vocab.select(col("word"), col("freq"), chars(col("word")).as("syms"))
      .localCheckpoint(eager = true)
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var it = 1
    var done = false
    while (it <= k && !done) {
      val best = cur
        .select(col("freq"), explode(pairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        out += ((it, l, r, c))
        cur = cur.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(eager = true)
        it += 1
      }
    }
    out.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Apply an ordered merge list to a vocabulary — BPE ENCODING with a
    * learned tokenizer: chain one [[applyMerge]] fold per merge, in rank
    * order (the order is semantic: later merges consume earlier merges'
    * output symbols). Returns (word, freq, syms).
    */
  def encode(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      vocab.select(col("word"), col("freq"), chars(col("word")).as("syms"))) {
      // checkpoint per merge: chaining the folds as ONE nested expression
      // makes codegen size (and analysis time) grow multiplicatively with
      // the merge count — the same reason learn() checkpoints per
      // iteration. Vocab-sized data, so each materialization is cheap.
      case (df, (l, r)) =>
        df.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(eager = true)
    }

  /** The q136 oracle: `k` unrolled iterations of the same pipeline in
    * DuckDB SQL (pair counts → argmax → island-parity merge), reading the
    * vocabulary from `documents`.
    */
  def oracleSql(k: Int): String = {
    val unions = (1 to k).map(j =>
      s"SELECT $j AS rank, l AS lhs, r AS rhs, CAST(c AS BIGINT) AS pair_count FROM b$j")
      .mkString("\nUNION ALL ")
    s"""${prefixCtes(k)}
       |$unions
       |ORDER BY rank""".stripMargin
  }

  private def iterCte(j: Int): String = {
    val prev = s"w${j - 1}"
    s"""p$j AS MATERIALIZED (
         |  SELECT s.l, s.r, SUM(s.freq) AS c FROM (
         |    SELECT w.freq, w.syms[t.i] AS l, w.syms[t.i+1] AS r
         |    FROM $prev w CROSS JOIN unnest(range(1, len(w.syms))) AS t(i)) s
         |  GROUP BY s.l, s.r),
         |b$j AS MATERIALIZED (SELECT l, r, c FROM p$j ORDER BY c DESC, l, r LIMIT 1),
         |cand$j AS (
         |  SELECT w.word, t.i FROM $prev w CROSS JOIN b$j b
         |  CROSS JOIN unnest(range(1, len(w.syms))) AS t(i)
         |  WHERE w.syms[t.i] = b.l AND w.syms[t.i+1] = b.r),
         |keep$j AS MATERIALIZED (
         |  SELECT word, i FROM (
         |    SELECT word, i, i - MIN(i) OVER (PARTITION BY word, g) AS off FROM (
         |      SELECT word, i, i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS g
         |      FROM cand$j) t1) t2
         |  WHERE off % 2 = 0),
         |w$j AS MATERIALIZED (
         |  SELECT s.word, s.freq, list(s.sym ORDER BY s.i) AS syms FROM (
         |    SELECT w.word, w.freq, t.i,
         |      CASE WHEN kh.i IS NOT NULL THEN b.l || b.r ELSE w.syms[t.i] END AS sym,
         |      kp.i AS consumed
         |    FROM $prev w CROSS JOIN b$j b
         |    CROSS JOIN unnest(range(1, len(w.syms)+1)) AS t(i)
         |    LEFT JOIN keep$j kh ON kh.word = w.word AND kh.i = t.i
         |    LEFT JOIN keep$j kp ON kp.word = w.word AND kp.i = t.i - 1) s
         |  WHERE s.consumed IS NULL
         |  GROUP BY s.word, s.freq)""".stripMargin
  }

  /** Shared CTE prefix: vocab, w0, and `k` unrolled iterations — used by
    * both the q136 merge-table oracle and the q141 encode oracle so the
    * two cannot drift.
    */
  private def prefixCtes(k: Int): String =
    s"""WITH vocab AS (
       |  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(text,' ')) AS tok FROM documents) t
       |  WHERE tok <> '' GROUP BY tok),
       |w0 AS MATERIALIZED (SELECT word, freq, string_split(word,'') AS syms FROM vocab),
       |${(1 to k).map(iterCte).mkString(",\n")}""".stripMargin

  /** The q141 oracle: the same `k` iterations, then the frequency-weighted
    * symbol table of the ENCODED vocabulary (top `top` symbols).
    */
  def encodeOracleSql(k: Int, top: Int): String =
    s"""${prefixCtes(k)}
       |SELECT s.sym, CAST(SUM(w.freq) AS BIGINT) AS n
       |FROM w$k w CROSS JOIN unnest(w.syms) AS s(sym)
       |GROUP BY s.sym
       |ORDER BY n DESC, s.sym LIMIT $top""".stripMargin
}
