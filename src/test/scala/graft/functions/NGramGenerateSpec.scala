package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.expressions.NGramGenerate

/** Custom Generator (UDTF) tier: window correctness, degenerate inputs,
  * and the plan shape (a native Generate node, like explode).
  */
class NGramGenerateSpec extends SparkSuite {
  import spark.implicits._

  private def grams(tokens: Seq[String], n: Int): Seq[(Int, String)] = {
    NGramGenerate.register(spark)
    Seq(tokens).toDF("t")
      .select(expr(s"graft_ngrams(t, $n)").as(Seq("pos", "gram")))
      .as[(Int, String)].collect().toSeq
  }

  test("emits every window with its 0-based position") {
    assert(grams(Seq("a", "b", "c", "d"), 2) ==
      Seq((0, "a b"), (1, "b c"), (2, "c d")))
    assert(grams(Seq("a", "b", "c"), 3) == Seq((0, "a b c")))
    assert(grams(Seq("x"), 1) == Seq((0, "x")))
  }

  test("documents shorter than n (and null arrays) emit nothing") {
    assert(grams(Seq("a", "b"), 3).isEmpty)
    NGramGenerate.register(spark)
    val withNull = Seq(Tuple1(Option.empty[Seq[String]])).toDF("t")
      .select(expr("graft_ngrams(t, 2)").as(Seq("pos", "gram")))
    assert(withNull.count() == 0)
  }

  test("plans as a native Generate node (no UDF, no join)") {
    NGramGenerate.register(spark)
    val df = Seq(Seq("a", "b", "c")).toDF("t")
      .select(expr("graft_ngrams(t, 2)").as(Seq("pos", "gram")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("rejects non-array input and non-literal n") {
    NGramGenerate.register(spark)
    val e1 = intercept[Exception](
      Seq("abc").toDF("t").selectExpr("graft_ngrams(t, 2)").collect())
    assert(e1.getMessage.contains("array") || e1.getMessage.contains("DATATYPE"))
    val e2 = intercept[Exception](
      Seq(Seq("a")).toDF("t").selectExpr("graft_ngrams(t, length('xx'))").collect())
    assert(e2.getMessage.contains("literal"))
  }
}
