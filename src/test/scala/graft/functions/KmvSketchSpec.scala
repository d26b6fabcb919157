package graft.functions

import graft.SparkSuite
import graft.functions.expressions.KmvSketch
import graft.queries.Tables
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSuite {
  import spark.implicits._

  KmvSketch.register(spark)

  test("k above the distinct count ⇒ exact distinct (buffer never saturates)") {
    val docs = Tables.documents(spark, sf)
    val got = docs.agg(KmvSketch.kmvDistinct($"text", 16384)).head().getLong(0)
    val exact = docs.agg(countDistinct($"text")).head().getLong(0)
    assert(got == exact)
  }

  test("small-k estimate lands within the KMV error envelope") {
    val n = 20000
    val df = (1 to n).map(i => s"value-$i").toDF("v")
    val k = 512
    val est = df.agg(KmvSketch.kmvDistinct($"v", k)).head().getLong(0)
    // KMV relative stderr ≈ 1/√(k−2) ≈ 4.4%; assert 5 sigma
    val tol = 5.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n).toDouble / n < tol, s"est $est vs $n")
  }

  test("deterministic across partitionings (merge path exercised)") {
    val df = (1 to 5000).map(i => s"x-${i % 1700}").toDF("v")
    val a = df.repartition(1).agg(KmvSketch.kmvDistinct($"v", 256)).head().getLong(0)
    val b = df.repartition(17).agg(KmvSketch.kmvDistinct($"v", 256)).head().getLong(0)
    assert(a == b, "partial-aggregate merges must not change the k-minimum set")
  }

  test("nulls are skipped; SQL-reachable; grouped partial aggregation") {
    Seq(Some("a"), None, Some("b"), Some("a")).toDF("v")
      .createOrReplaceTempView("kmv_in")
    val r = spark.sql("SELECT graft_kmv_distinct(v, 64) FROM kmv_in").head().getLong(0)
    assert(r == 2)
    val plan = spark.sql("SELECT graft_kmv_distinct(v, 64) FROM kmv_in")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv_distinct") || plan.contains("ObjectHashAggregate"),
      s"sketch must partial-aggregate map-side:\n${plan.take(600)}")
  }
}
