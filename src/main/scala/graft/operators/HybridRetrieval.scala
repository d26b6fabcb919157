package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion for hybrid retrieval — combine ranked candidate
  * lists from heterogeneous scorers (sparse lexical, dense embedding, …)
  * without score calibration: each list contributes `1/(c + rank)`, so
  * top-rank agreement dominates and the raw scores never need to be
  * comparable across scorers (Cormack et al., SIGIR 2009 — the standard
  * hybrid-search combiner).
  *
  * Integer weights: each contribution is `scale div (c + rank)` rather
  * than the real-valued `1/(c + rank)` — the same family, exactly
  * representable, so the fused score is a BIGINT a cross-engine oracle
  * reproduces bit-for-bit (the repo's transcendental-free discipline,
  * like q95's integer IDF).
  *
  * Scale posture: the inputs are already-truncated top-k lists (a few
  * rows per query), so the fuse is a full-outer join over candidate ids
  * plus one top-k — nothing here touches the corpus again.
  */
object HybridRetrieval {

  /** Fuse ranked lists `(name -> df)`, each df carrying (idCol, rankCol)
    * with 1-based ranks. Output: idCol, one nullable `<name>_rank` column
    * per list (null where the list didn't surface the id), and
    * `rrf_score` = Σ over lists of `scale div (c + rank)`.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String, rankCol: String,
              c: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val renamed = lists.map { case (name, df) =>
      name -> df.select(col(idCol), col(rankCol).cast("long").as(s"${name}_rank"))
    }
    val joined = renamed.map(_._2)
      .reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = renamed
      .map { case (name, _) =>
        coalesce(expr(s"${scale}L div ($c + ${name}_rank)"), lit(0L))
      }
      .reduce(_ + _)
    joined.withColumn("rrf_score", score)
  }
}
