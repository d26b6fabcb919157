package graft.functions

import graft.SparkSuite
import graft.functions.expressions.{BloomFilterExprs, BloomFilterFormat, BloomProbe}
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BloomFilterSpec extends SparkSuite {
  import spark.implicits._

  BloomFilterExprs.register(spark)

  private def buildBloom(values: Seq[String], numBits: Int = 1 << 14,
                         numHashes: Int = 5): Array[Byte] =
    values.toDF("v")
      .agg(BloomFilterExprs.bloomBuild($"v", numBits, numHashes).as("b"))
      .head().getAs[Array[Byte]]("b")

  test("no false negatives: every inserted value probes true") {
    val values = (1 to 5000).map(i => s"shingle $i of the corpus")
    val bloom = buildBloom(values)
    val misses = values.toDF("v")
      .filter(!BloomFilterExprs.bloomContains($"v", lit(bloom)))
      .count()
    assert(misses == 0)
  }

  test("false-positive rate stays near the (1-e^{-kn/m})^k design point") {
    val n = 5000
    val m = 1 << 16
    val k = 5
    val bloom = buildBloom((1 to n).map(i => s"member $i"), m, k)
    val probes = 20000
    val fps = (1 to probes).map(i => s"non-member $i").toDF("v")
      .filter(BloomFilterExprs.bloomContains($"v", lit(bloom)))
      .count()
    val expected = math.pow(1.0 - math.exp(-k.toDouble * n / m), k)
    assert(fps.toDouble / probes < expected * 3 + 0.001,
      s"fp rate ${fps.toDouble / probes} vs design $expected")
  }

  test("deterministic across partitionings (merge path exercised)") {
    val values = (1 to 3000).map(i => s"v$i")
    val a = buildBloom(values)
    val b = values.toDF("v").repartition(7)
      .agg(BloomFilterExprs.bloomBuild($"v", 1 << 14, 5).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(java.util.Arrays.equals(a, b))
  }

  test("wire format is self-describing and probe matches the aggregate") {
    val bloom = buildBloom(Seq("alpha", "beta"), 64 * 4, 3)
    assert(BloomFilterFormat.decodeNumHashes(bloom) == 3)
    assert(BloomFilterFormat.decodeWords(bloom).length == 4)
    val probe = new BloomProbe(bloom)
    assert(probe.contains(UTF8String.fromString("alpha")))
    assert(probe.contains(UTF8String.fromString("beta")))
  }

  test("SQL surface: graft_bloom_build / graft_bloom_contains round-trip") {
    Seq("x", "y", "z").toDF("v").createOrReplaceTempView("bloom_in")
    val bytes = spark.sql(
      "SELECT graft_bloom_build(v, 1024, 4) AS b FROM bloom_in")
      .head().getAs[Array[Byte]]("b")
    spark.sql("DROP VIEW bloom_in")
    val hits = Seq("x", "q").toDF("v")
      .select(BloomFilterExprs.bloomContains($"v", lit(bytes)).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(hits(0))
  }

  test("invalid sizing rejected") {
    intercept[IllegalArgumentException] {
      graft.functions.expressions.BloomBuildAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 63, 5)
    }
    intercept[IllegalArgumentException] {
      graft.functions.expressions.BloomBuildAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 64, 0)
    }
  }

  test("BloomDecon equals the exact contamination join on real docs") {
    val docs = Tables.documents(spark, sf)
    val cands = docs.filter($"doc_id" % 97 =!= 0)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val got = graft.operators.BloomDecon
      .contaminatedDocs(cands, bench, "doc_id", "text", 3)
      .select($"doc_id", $"n_contaminated")
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = graft.operators.Contamination
      .report(cands, bench, "doc_id", "text", 3)
      .filter($"n_contaminated" > 0)
      .select($"doc_id", $"n_contaminated")
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(exact))
    assert(got.nonEmpty)
  }
}
