package graft.queries

import graft.SparkSuite

/** q172: each join hint must actually plan its strategy — a hint the
  * planner ignores (wrong side, wrong name) degrades silently into
  * whatever the optimizer preferred, and the "invariance" claim would be
  * vacuously testing one strategy three times.
  */
class JoinHintPlanSpec extends SparkSuite {

  test("q172 plans BroadcastHashJoin, ShuffledHashJoin AND SortMergeJoin") {
    val df = Relational.joinHints(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    Seq("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin").foreach { op =>
      assert(plan.contains(op), s"hint did not plan $op:\n${plan.take(2000)}")
    }
  }
}
