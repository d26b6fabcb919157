package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Plan-shape guards for q98/q99: the scale arguments must be visible in
  * the physical plan — a distributed partial top-k for the sparse branch,
  * broadcast-only nested loops for the dense kernel and the rank probe,
  * and a map-side-combined histogram aggregate for the sketch.
  */
class HybridQuantilePlanSpec extends SparkSuite {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q98: sparse top-20 is TakeOrderedAndProject; every NL join is broadcast") {
    val plan = executed(VectorOps.hybridRetrieval(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      "sparse branch must partial-top-k, not globally sort")
    assert(!plan.contains("CartesianProduct"), "no partitioned cartesian")
    val nl = "NestedLoopJoin".r.findAllIn(plan).size
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl == bnl, s"non-broadcast NL join present ($bnl of $nl broadcast)")
  }

  test("q99: histogram sketch aggregates map-side before the exchange") {
    val ev = Tables.events(spark, sf).select($"event_id", $"value")
    val hist = graft.operators.QuantileHist.sketch(ev, "value", 0.25)
    val plan = executed(hist)
    // partial + final HashAggregate pair on bin — the mergeable-state
    // contract: executors combine before anything shuffles
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate pair:\n${plan.take(1500)}")
    assert(plan.contains("partial_count") || plan.contains("partial count")
        || plan.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("count")),
      "map-side combine must be a partial count")
  }

  test("q99: rank probe broadcasts the 3-row ranks frame, never the histogram") {
    val plan = executed(ScaleOps.quantileSketch(spark, sf))
    assert(!plan.contains("CartesianProduct"), "no partitioned cartesian")
    val nl = "NestedLoopJoin".r.findAllIn(plan).size
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl == bnl, s"non-broadcast NL join present ($bnl of $nl broadcast)")
  }
}
