package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  private val tau = 0.4

  test("kept set equals the driver-side brute-force prune over the same clusters") {
    val emb = Tables.embeddings(spark, sf)
    val kept = SemanticDedup.keptAfterDedup(emb, "vec_id", "embedding",
        numCentroids = 8, minCosine = tau)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // independent prune reference: same cluster assignment (pinned by the
    // q42/q83 DuckDB oracles), drop rule recomputed in plain double math
    var centroids = IvfIndex.seedCentroids(emb, "vec_id", "embedding", 8)
    centroids = IvfIndex.lloydStep(emb, "vec_id", "embedding", centroids)
    val cluster = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val expectedKept = ids.filter { id =>
      !ids.exists(o => o < id && cluster(o) == cluster(id) &&
        cos(vecs(o), vecs(id)) >= tau)
    }.map(id => id -> cluster(id)).toMap

    assert(kept == expectedKept)
    assert(kept.size < ids.size, "threshold should drop at least one vector")
  }

  test("kept representatives are closed under the rule: no kept pair within a cluster is near-dup") {
    val emb = Tables.embeddings(spark, sf)
    val kept = SemanticDedup.keptAfterDedup(emb, "vec_id", "embedding",
      numCentroids = 8, minCosine = tau)
    val k2 = kept.select($"vec_id".as("b"), $"centroid_id")
    val joined = kept.join(k2, Seq("centroid_id"))
      .filter($"vec_id" < $"b")
      .join(Tables.embeddings(spark, sf).select($"vec_id", $"embedding"), Seq("vec_id"))
      .join(Tables.embeddings(spark, sf)
        .select($"vec_id".as("b"), $"embedding".as("eb")), Seq("b"))
      .filter(Similarity.cosine($"embedding", $"eb") >= tau)
    assert(joined.count() == 0)
  }
}
