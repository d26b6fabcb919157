package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class RewriteRankFilterSpec extends SparkSuite {
  import spark.implicits._

  RewriteRankFilterToTopK.register(spark)

  private def rankForm(k: Int) = {
    val df = (1 to 500).map(i => (i % 11, i, s"p-$i")).toDF("g", "v", "payload")
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"payload".asc)
    df.withColumn("rk", row_number().over(w)).filter($"rk" <= k).drop("rk")
  }

  test("discarded row_number<=k filter plans as GraftTopK, no Window") {
    val df = rankForm(3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKFinal"), plan.take(600))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains(" Window"),
      s"window operator should be rewritten away:\n${plan.take(600)}")
  }

  test("rewritten result equals the un-rewritten window form") {
    val expected = {
      // bypass the rewrite: keep the rank column (observable ⇒ no rewrite)
      val df = (1 to 500).map(i => (i % 11, i, s"p-$i")).toDF("g", "v", "payload")
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"payload".asc)
      df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"g", $"v", $"payload")
    }
    val key = Seq($"g", $"v", $"payload")
    assert(rankForm(3).orderBy(key: _*).collect().toSeq ==
      expected.orderBy(key: _*).collect().toSeq)
    // rank kept ⇒ Window preserved (conservative gate)
    val kept = {
      val df = (1 to 100).map(i => (i % 5, i)).toDF("g", "v")
      val w = Window.partitionBy($"g").orderBy($"v".desc)
      df.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
    }
    kept.collect()
    assert(!kept.queryExecution.executedPlan.toString.contains("GraftTopK"))
  }
}
