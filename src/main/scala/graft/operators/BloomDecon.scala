package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.expressions.BloomFilterExprs

/** Bloom-prefiltered benchmark decontamination — the 100 TB shape of
  * [[Contamination]]'s membership join.
  *
  * [[Contamination.report]] joins the candidate shingle stream against the
  * benchmark shingle set: correct, but the candidate side (the 100 TB
  * corpus) must shuffle its shingles to the join even though only a tiny
  * fraction can ever match. Here the benchmark shingles fold into a Bloom
  * filter via [[graft.functions.expressions.BloomBuildAgg]] (mergeable
  * partial aggregation, one small byte-array result), and the corpus side
  * probes it with the codegen'd
  * [[graft.functions.expressions.BloomMightContain]] as a MAP-SIDE filter:
  * the full-corpus shuffle disappears, and only bloom-hit shingles — true
  * matches plus an ε of false positives — reach the exact confirm join.
  *
  * The result is EXACT, not approximate: Bloom filters have no false
  * negatives, and the confirm semi-join removes the false positives. At
  * the default sizing (2^20 bits, 5 hashes ≈ 128 KiB) a 100k-shingle
  * benchmark sees ε ≈ 0.03% — the confirm join's input is the contaminated
  * rows themselves, a vanishing fraction of the corpus.
  */
object BloomDecon {

  /** Per-candidate-document contaminated-shingle count (distinct n-gram
    * shingles also present anywhere in the benchmark corpus), only for
    * documents with at least one hit. Columns: (idCol, n_contaminated,
    * first_shingle) with first_shingle the lexicographically-least hit —
    * a spot-check handle for audits.
    */
  def contaminatedDocs(candidates: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int,
                       numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val spark = candidates.sparkSession
    BloomFilterExprs.register(spark)
    val candSh = TextFunctions.shingles(candidates, idCol, textCol, n)
    val benchSh = TextFunctions.shingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    // The build aggregate returns one bounded row (numBits/8 bytes + 4),
    // collected like any broadcast build side.
    val bloomBytes = benchSh
      .agg(BloomFilterExprs.bloomBuild(col("shingle"), numBits, numHashes).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    candSh
      .filter(BloomFilterExprs.bloomContains(col("shingle"), lit(bloomBytes)))
      .join(benchSh, Seq("shingle"), "left_semi") // exact confirm: kills false positives
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"),
        min(col("shingle")).as("first_shingle"))
  }
}
