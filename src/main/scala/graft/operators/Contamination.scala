package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark-contamination audit for training corpora: for every candidate
  * document, the count and fraction of its distinct n-gram shingles that
  * appear anywhere in a benchmark (evaluation) corpus — the standard
  * n-gram-overlap decontamination check run before training.
  *
  * Scale design: one shingle pass per side (each a single shuffle), then
  * an equi-join on the shingle key — the benchmark side is the small one
  * and AQE broadcasts it; the candidate side never shuffles twice. No
  * quadratic pair space is ever formed.
  */
object Contamination {

  def report(candidates: DataFrame, benchmark: DataFrame, idCol: String,
             textCol: String, n: Int): DataFrame = {
    val candSh = TextFunctions.shingles(candidates, idCol, textCol, n)
    val benchSh = TextFunctions.shingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    candSh.join(benchSh, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
  }
}
