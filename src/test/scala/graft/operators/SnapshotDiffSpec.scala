package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** SnapshotDiff semantics: insert/update/delete classification, null-safe
  * change detection, unchanged-row suppression, and the plan shape (one
  * full-outer join, nothing broadcast).
  */
class SnapshotDiffSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def run(old: Seq[(Long, Option[String], Option[Double])],
                  neu: Seq[(Long, Option[String], Option[Double])]) =
    SnapshotDiff.diff(
      old.toDF("id", "name", "v"), neu.toDF("id", "name", "v"), Seq("id"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("classifies insert, delete, update; drops unchanged") {
    val old = Seq(
      (1L, Some("a"), Some(1.0)),  // unchanged
      (2L, Some("b"), Some(2.0)),  // value update
      (3L, Some("c"), Some(3.0)),  // deleted
      (5L, Some("e"), None))       // null -> value update
    val neu = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (4L, Some("d"), Some(4.0)),  // inserted
      (5L, Some("e"), Some(5.0)))
    assert(run(old, neu) == Seq(2L -> "update", 3L -> "delete",
      4L -> "insert", 5L -> "update"))
  }

  test("null == null is unchanged; value -> null is an update") {
    val old = Seq((1L, Some("a"), None), (2L, Some("b"), Some(2.0)))
    val neu = Seq((1L, Some("a"), None), (2L, Some("b"), None))
    assert(run(old, neu) == Seq(2L -> "update"))
  }

  test("key-only schemas compare presence: no updates possible") {
    val out = SnapshotDiff.diff(
      Seq(1L, 2L).toDF("id"), Seq(2L, 3L).toDF("id"), Seq("id"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(1L -> "delete", 3L -> "insert"))
  }

  test("mismatched schemas are rejected") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(Seq((1L, "a")).toDF("id", "x"),
        Seq((1L, "a")).toDF("id", "y"), Seq("id"))
    }
  }

  test("plan: one full-outer join, nothing broadcast") {
    val old = (1L to 100L).map(i => (i, Some(s"n$i"), Some(i.toDouble)))
    val neu = (51L to 150L).map(i => (i, Some(s"n$i"), Some(i.toDouble)))
    val df = SnapshotDiff.diff(
      old.toDF("id", "name", "v"), neu.toDF("id", "name", "v"), Seq("id"))
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1, s"expected exactly one join:\n$plan")
    assert(joins.head.joinType == org.apache.spark.sql.catalyst.plans.FullOuter)
    val bcast = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(bcast.isEmpty, s"full-outer diff must not broadcast:\n$plan")
  }
}
