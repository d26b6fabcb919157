package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsofRangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)

  test("asofLeft: latest right at-or-before, per key, equal-ts visible") {
    val left = Seq(
      (1L, t(5), "a"), (1L, t(10), "b"), (1L, t(2), "early"),
      (2L, t(7), "c")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t(3), 100.0), (1L, t(10), 200.0), (3L, t(1), 999.0))
      .toDF("k", "ts", "price")
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "ts", Seq("price"))
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "early" -> None,        // no right row at or before t(2)
      "a" -> Some(100.0),     // t(3) is the latest ≤ t(5)
      "b" -> Some(200.0),     // equal-ts right row visible
      "c" -> None))           // key 2 has no right rows
  }

  test("asofLeft: a newer right row with a NULL payload field shadows older values") {
    val left = Seq((1L, t(10), "x")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t(3), Some(3L), Some(7.0)),
      (1L, t(5), Some(5L), None: Option[Double])) // newest: ref_value null
      .toDF("k", "ts", "ref_id", "ref_value")
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "ts", Seq("ref_id", "ref_value"))
      .select($"ref_id", $"ref_value").as[(Option[Long], Option[Double])].head()
    // per-column carry-forward would produce the frankenrow (5, Some(7.0));
    // the row must come from the single latest right row: (5, null)
    assert(out == (Some(5L), None), s"got $out")
  }

  test("asofLeft is deterministic across partitionings") {
    val left = (1 to 200).map(i => ((i % 7).toLong, t(i), i)).toDF("k", "ts", "n")
    val right = (1 to 50).map(i => ((i % 7).toLong, t(i * 3), i * 1.0)).toDF("k", "ts", "v")
    val a = AsofJoin.asofLeft(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts", "n").collect().toSeq
    val b = AsofJoin.asofLeft(left.repartition(13), right.repartition(3), Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts", "n").collect().toSeq
    assert(a == b)
  }

  test("pointInInterval equals the naive inequality join, intervals spanning buckets") {
    val points = (0 until 300).map(i => (i.toLong, t(i * 10))).toDF("pid", "ts")
    // intervals of varied lengths incl. ones spanning multiple 60s buckets
    val intervals = Seq(
      (t(0), t(25), "short"), (t(50), t(290), "long"),
      (t(100), t(101), "tiny"), (t(400), t(500), "empty"))
      .toDF("s", "e", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Nil, "ts", "s", "e",
        Seq("name"), bucketMs = 60000L)
      .select($"pid", $"name").as[(Long, String)].collect().toSet
    val naive = points.join(intervals, $"s" <= $"ts" && $"ts" < $"e")
      .select($"pid", $"name").as[(Long, String)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty && got.exists(_._2 == "long"))
  }

  test("pointInInterval plans as an equi-join, not a nested loop") {
    val points = (0 until 100).map(i => (i.toLong, t(i))).toDF("pid", "ts")
    val intervals = Seq((t(0), t(50), "w")).toDF("s", "e", "name")
    val df = RangeJoin.pointInInterval(points, intervals, Nil, "ts", "s", "e",
      Seq("name"), bucketMs = 60000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }
}
