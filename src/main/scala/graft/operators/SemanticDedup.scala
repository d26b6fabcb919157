package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Similarity.{ndot, nnorm, registerNative}

/** Semantic (embedding-space) deduplication — the SemDeDup recipe (Abbas
  * et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", 2023): cluster the corpus embeddings with
  * k-means, then compare pairs ONLY within each cluster and drop every
  * vector that has a lower-id near-duplicate neighbor above a cosine
  * threshold (the paper keeps one representative per within-cluster
  * duplicate group; min-id is the deterministic, one-pass choice of
  * representative).
  *
  * Scale shape: the clustering reuses [[IvfIndex]] (broadcast centroids,
  * one shuffle per Lloyd step), and the candidate pair space is the
  * within-cluster self-join — quadratic only in the cluster size, never
  * in the corpus, with cluster count growing with the data. That is the
  * whole point of SemDeDup over all-pairs near-dup: at 100 TB the
  * cross-cluster pairs (the overwhelming majority) are never formed.
  * Every stage is deterministic (lowest-id seeds, argmax assignment with
  * id tie-break, min-id keep rule), so the full pipeline is
  * DuckDB-oracle-able.
  */
object SemanticDedup {

  private def ncos(a: Column, b: Column): Column = ndot(a, b) / (nnorm(a) * nnorm(b))

  /** Kept representatives after within-cluster near-dup pruning: a vector
    * is DROPPED iff some lower-id vector in the same cluster has cosine
    * ≥ minCosine with it (the greedy keep-first-seen rule, made
    * deterministic by scanning in id order). Returns (idCol, centroid_id)
    * for the kept vectors.
    */
  def keptAfterDedup(corpus: DataFrame, idCol: String, vecCol: String,
                     numCentroids: Int, minCosine: Double,
                     lloydIters: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    registerNative(spark)
    var centroids = IvfIndex.seedCentroids(corpus, idCol, vecCol, numCentroids)
    (0 until lloydIters).foreach { _ =>
      centroids = IvfIndex.lloydStep(corpus, idCol, vecCol, centroids)
    }
    val assigned = corpus.select(col(idCol), col(vecCol))
      .join(IvfIndex.assign(corpus, idCol, vecCol, centroids), Seq(idCol))
    val lhs = assigned.select(col("centroid_id"), col(idCol).as("__a"),
      col(vecCol).as("__va"))
    val rhs = assigned.select(col("centroid_id"), col(idCol).as("__b"),
      col(vecCol).as("__vb"))
    // within-cluster pairs only: equi-join on centroid_id (one shuffle),
    // id-ordered so each unordered pair appears once
    val dropped = lhs.join(rhs, Seq("centroid_id"))
      .filter(col("__a") < col("__b"))
      .filter(ncos(col("__va"), col("__vb")) >= lit(minCosine))
      .select(col("__b").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("centroid_id"))
  }
}
