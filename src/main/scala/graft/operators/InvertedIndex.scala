package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + posting-list phrase search — the retrieval
  * primitive of a corpus pipeline (search-based decontamination audits,
  * exact-phrase membership tests, citation mining).
  *
  * Index shape: one row per term carrying document frequency, collection
  * frequency, and the full postings as
  * `array<struct<doc_id, positions array<int>>>`, both levels sorted, so
  * the index is byte-deterministic and mergeable by term.
  *
  * Scale shape: the build is a single explode + two hash aggregations
  * (term×doc, then term) — the same shuffle count as a word-count, with
  * postings materialized as grouped arrays rather than a row per
  * occurrence. Phrase search never touches the corpus: it filters the
  * index to the phrase's terms (a handful of rows out of |vocabulary|),
  * re-explodes ONLY those postings, and intersects on (doc_id,
  * offset-aligned position) with equi-joins. At 100 TB the query-time
  * cost is proportional to the phrase terms' posting lists, not the
  * corpus.
  */
object InvertedIndex {

  /** Build the positional index over whitespace tokens of `textCol`.
    * Output: (term, df, cf, postings) sorted by term; positions are
    * 0-based token offsets.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    toks
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        sort_array(collect_list(struct(col("doc_id"), col("positions"))))
          .as("postings"))
  }

  /** Exact-phrase occurrence counts per document via posting-list
    * intersection: a match at position p requires term k of the phrase at
    * p+k for every k. Output: (doc_id, n_matches) for docs with >= 1
    * match. The corpus is not scanned — only the phrase terms' postings
    * are exploded and equi-joined on (doc_id, aligned position).
    */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val post = index
      .filter(col("term").isin(phrase.distinct: _*))
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"),
        explode(col("p.positions")).as("pos"))
    val starts = post.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(starts) {
      case (acc, (w, k)) =>
        acc.join(
          post.filter(col("term") === w)
            .select(col("doc_id"), (col("pos") - k).as("p0")),
          Seq("doc_id", "p0"))
    }
    aligned.groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
  }
}
