package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Incremental near-dup dedup: check a DELTA of new documents against an
  * existing corpus WITHOUT reprocessing the corpus. This is the operation
  * a growing training corpus actually runs daily — full-corpus dedup is
  * O(corpus) per batch; this path is O(delta + matched candidates):
  *
  *   1. The corpus maintains a persistable band INDEX (one row per
  *      (doc, band): ~`bands` small rows per document — parquet-friendly,
  *      upsert-appendable as the corpus grows).
  *   2. New documents are shingled/hashed (delta-sized work) and their
  *      bands join the index — a plain shuffle equi-join on
  *      (band, bandHash).
  *   3. Exact Jaccard verification re-shingles ONLY the corpus documents
  *      that actually collided (a semi-join against candidate ids), so
  *      corpus text is touched strictly proportionally to match volume.
  *
  * Same banding math as [[Dedup.minhashNearDupPairs]] — a pair of docs
  * lands in the same bucket with probability 1-(1-s^r)^b.
  */
object IncrementalDedup {

  /** Render the hash configuration as the index's `cfg` column value —
    * [[dedupDelta]] refuses an index built with different parameters
    * (mismatched banding would otherwise return an EMPTY candidate set
    * with no error, shipping duplicates into the corpus).
    */
  private def cfgTag(numHashes: Int, bands: Int, shingleN: Int): String =
    s"mh$numHashes/b$bands/sh$shingleN"

  /** The persistable corpus index: (idCol, n_sh, band, bandHash, cfg).
    * Build once per corpus generation, append per ingested batch.
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16,
                 shingleN: Int = 3): DataFrame = {
    val sh = TextFunctions.shingles(corpus, idCol, textCol, shingleN)
    // materialize the expensive shingle+65-aggregate pass ONCE: the band
    // branch and the count branch below would otherwise each recompute it
    val sc = Dedup.minhashSignaturesAndCounts(sh, idCol, numHashes)
      .localCheckpoint(eager = true)
    Dedup.bandRows(sc, idCol, bands)
      .join(sc.select(col(idCol), col("n_sh")), Seq(idCol))
      .select(col(idCol), col("n_sh"), col("band"), col("bandHash"),
        lit(cfgTag(numHashes, bands, shingleN)).as("cfg"))
  }

  /** Near-dup pairs between `delta` and the indexed corpus: output
    * (delta_id, corpus_id, jaccard) for exact n-gram Jaccard ≥ minJaccard
    * among band-bucket collisions. `corpusText` supplies (idCol, textCol)
    * for candidates-only verification — at scale this is the corpus table
    * itself, and the semi-join prunes it to the handful of matched docs.
    */
  def dedupDelta(index: DataFrame, corpusText: DataFrame, delta: DataFrame,
                 idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
                 minJaccard: Double = 0.5): DataFrame = {
    // refuse a config-mismatched index: different banding parameters would
    // produce an empty candidate set SILENTLY. Check EVERY distinct cfg —
    // an index appended over time may be mixed, and a single-row probe
    // would pass validation while dropping candidates for the mismatched
    // portion. distinct() over the cfg column is cheap relative to the join.
    val expectCfg = cfgTag(numHashes, bands, shingleN)
    val cfgs = index.select(col("cfg")).distinct().collect().map(_.getString(0))
    require(cfgs.forall(_ == expectCfg),
      s"index contains cfg(s) [${cfgs.filterNot(_ == expectCfg).mkString(", ")}], " +
        s"dedupDelta called with $expectCfg")
    // localCheckpoint(eager): materialized once, blocks released with the
    // returned frame — per-batch invocations in a long-lived session must
    // not accumulate cached RDDs the way cache()/persist() would
    val dsh = TextFunctions.shingles(delta, idCol, textCol, shingleN)
      .localCheckpoint(eager = true)
    // delta-sized; feeds both the band branch and the n1 counts
    val dsc = Dedup.minhashSignaturesAndCounts(dsh, idCol, numHashes)
      .localCheckpoint(eager = true)
    val dBands = Dedup.bandRows(dsc, idCol, bands)
      .select(col(idCol).as("delta_id"), col("band"), col("bandHash"))
    // candidate pairs: delta bands ⨝ index bands — shuffle join on the
    // band key, nothing corpus-sized is broadcast. n_sh rides along so no
    // separate corpus-wide count scan is ever needed (max() is exact: the
    // value repeats identically on every band row of a doc).
    val cand = dBands
      .join(index.select(col(idCol).as("corpus_id"), col("band"),
          col("bandHash"), col("n_sh")),
        Seq("band", "bandHash"))
      .filter(col("delta_id") =!= col("corpus_id"))
      .groupBy(col("delta_id"), col("corpus_id"))
      .agg(max(col("n_sh")).as("n2"))
    // re-shingle ONLY collided corpus docs
    val matchedCorpus = corpusText
      .join(cand.select(col("corpus_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
    val csh = TextFunctions.shingles(matchedCorpus, idCol, textCol, shingleN)
    val inter = dsh.select(col(idCol).as("delta_id"), col("shingle"))
      .join(cand.select(col("delta_id"), col("corpus_id")), Seq("delta_id"))
      .join(csh.select(col(idCol).as("corpus_id"), col("shingle")),
        Seq("corpus_id", "shingle"))
      .groupBy(col("delta_id"), col("corpus_id"))
      .agg(count(lit(1)).as("inter"))
    val dCnt = dsc.select(col(idCol).as("delta_id"), col("n_sh").as("n1"))
    inter
      .join(dCnt, Seq("delta_id"))
      .join(cand, Seq("delta_id", "corpus_id"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("delta_id"), col("corpus_id"), col("jaccard"))
  }
}
