package graft.functions

import graft.SparkSuite
import graft.queries.Tables
import graft.functions.expressions.DotProduct
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = {
    DotProduct.register(spark)
    Tables.embeddings(spark, sf).cache()
  }

  test("native expression equals the HOF dot bit-for-bit") {
    val both = emb.select(
      DotProduct.dot($"embedding", $"embedding").as("native"),
      Similarity.dot($"embedding", $"embedding").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("reachable from SQL text after registration") {
    emb.createOrReplaceTempView("v_emb")
    val n = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM v_emb WHERE vec_id = 0")
      .head().getDouble(0)
    val ref = emb.filter($"vec_id" === 0)
      .select(Similarity.dot($"embedding", $"embedding")).head().getDouble(0)
    assert(n == ref)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val plan = emb.select(DotProduct.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the projection
    // containing graft_dot must carry it
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.contains("*(")),
      plan.take(500))
  }

  test("null arrays yield null") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(DotProduct.dot($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("graft_cosine is registered and SQL-reachable; extensions builders agree") {
    DotProduct.register(spark)
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_sqlfn")
    val rows = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_sqlfn").collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
    // the extensions class installs without error (builder fns are shared
    // with the per-session register path exercised above)
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("graft_hash60 is SQL-reachable and equals the portable hash / DuckDB formula") {
    DotProduct.register(spark)
    // md5('abc') = 900150983cd24fb0…; first 15 hex chars as a long — the
    // same value DuckDB returns for ('0x'||substr(md5('abc'),1,15))::BIGINT
    val r = spark.sql("SELECT graft_hash60('abc') AS h").head().getLong(0)
    assert(r == 648541476951500027L)
    val viaColumn = spark.range(1)
      .select(graft.functions.TextFunctions.portableHash60(lit("abc")))
      .head().getLong(0)
    assert(r == viaColumn)
  }

  test("wrong arity fails analysis with a named error, not IndexOutOfBounds") {
    DotProduct.register(spark)
    for (bad <- Seq("graft_hash60()", "graft_hash60('a','b')",
                    "graft_dot(array(1.0f))", "graft_cosine(array(1.0f))")) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $bad").collect()
      }
      assert(ex.getMessage.toLowerCase.contains("parameter"), s"$bad → ${ex.getMessage}")
    }
  }

  test("native kernel is faster than the HOF path on a widened workload") {
    val wide = emb.crossJoin(emb.limit(200).select($"embedding".as("e2")))
    def timed(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      wide.select(sum(c)).head()
      (System.nanoTime() - t0) / 1e9
    }
    timed(DotProduct.dot($"embedding", $"e2")) // warm both paths
    timed(Similarity.dot($"embedding", $"e2"))
    val native = timed(DotProduct.dot($"embedding", $"e2"))
    val hof = timed(Similarity.dot($"embedding", $"e2"))
    info(f"native $native%.2fs vs HOF $hof%.2fs on ${emb.count() * 200} dots")
    assert(native <= hof * 1.5, "native kernel must not be slower than interpreted HOFs")
  }
}
