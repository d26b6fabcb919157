package graft.plans

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerGroupSpec extends SparkSuite {
  import spark.implicits._

  test("custom TopK equals the window-rank form exactly") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    val windowed = li.withColumn("rk", row_number().over(w)).filter($"rk" <= 3).drop("rk")
    val custom = TopKPerGroup.topK(li, Seq("l_suppkey"),
      Seq($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc), 3)
    val key = li.columns.map(col).toSeq
    assert(custom.orderBy(key: _*).collect().toSeq ==
      windowed.orderBy(key: _*).collect().toSeq)
  }

  test("two-phase plan: partial heap sits BELOW the exchange, final above") {
    val li = Tables.lineitem(spark, sf).select($"l_suppkey", $"l_orderkey", $"l_extendedprice")
    val df = TopKPerGroup.topK(li, Seq("l_suppkey"),
      Seq($"l_extendedprice".desc, $"l_orderkey".asc), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKFinal") && plan.contains("GraftTopKPartial"), plan.take(800))
    // textual order in the tree printout: Final ... Exchange ... Partial
    val (fi, ex, pa) = (plan.indexOf("GraftTopKFinal"),
      plan.indexOf("Exchange"), plan.indexOf("GraftTopKPartial"))
    assert(fi < ex && ex < pa, s"unexpected operator order: $fi/$ex/$pa\n${plan.take(800)}")
  }

  test("partial-phase heap flush keeps results exact under a tiny group bound") {
    val saved = TopKPerGroup.partialFlushGroups
    try {
      TopKPerGroup.partialFlushGroups = 2 // every third group forces a segment flush
      val df = (1 to 2000).map(i => (i % 97, i)).toDF("g", "v").repartition(3)
      val got = TopKPerGroup.topK(df, Seq("g"), Seq($"v".desc), 3)
        .orderBy("g", "v").as[(Int, Int)].collect().toSeq
      val expected = (1 to 2000).groupBy(_ % 97).toSeq.flatMap { case (g, vs) =>
        vs.sorted.takeRight(3).map(v => (g, v))
      }.sorted
      assert(got == expected)
    } finally TopKPerGroup.partialFlushGroups = saved
  }

  test("GLOBAL top-k (no groups) returns k rows total, not k per partition") {
    val df = (1 to 1000).map(i => (i, s"p-$i")).toDF("v", "tag").repartition(8)
    val out = TopKPerGroup.topK(df, Nil, Seq($"v".desc, $"tag".asc), 5)
      .select($"v").as[Int].collect().sorted.toSeq
    assert(out == Seq(996, 997, 998, 999, 1000), s"got $out")
  }

  test("deterministic across partitionings; groups smaller than k kept whole") {
    val df = Seq((1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "d"))
      .toDF("g", "v", "tag")
    val top2 = TopKPerGroup.topK(df, Seq("g"), Seq($"v".desc, $"tag".asc), 2)
      .select($"tag").as[String].collect().toSet
    assert(top2 == Set("c", "b", "d"))
    val big = (1 to 1000).map(i => (i % 13, i)).toDF("g", "v")
    val a = TopKPerGroup.topK(big, Seq("g"), Seq($"v".desc), 4)
      .orderBy("g", "v").collect().toSeq
    val b = TopKPerGroup.topK(big.repartition(17), Seq("g"), Seq($"v".desc), 4)
      .orderBy("g", "v").collect().toSeq
    assert(a == b)
  }
}
