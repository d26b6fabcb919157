package graft.plans

import graft.SparkSuite
import graft.queries.Relational

/** Pins q206's load-bearing physical property: Catalyst's
  * InjectRuntimeFilter actually fires — the executed plan carries a
  * bloom_filter_might_contain predicate fed by an aggregate over the
  * selective join side — and the rewrite is semantics-preserving.
  */
class BloomJoinPlanSpec extends SparkSuite {

  test("runtime bloom filter is injected into the fact-side scan") {
    val df = Relational.bloomFilterJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("bloom"),
      s"expected an injected bloom filter in:\n${plan.take(1500)}")
    assert(plan.contains("sortmergejoin") || plan.contains("shuffledhashjoin"),
      "runtime filters require the shuffle-join path (MERGE hint)")
  }

  test("rewrite is semantics-preserving (rule off == rule on)") {
    val on = Relational.bloomFilterJoin(spark, sf).collect().toSeq
    // creation-side threshold 0 ⇒ no side qualifies ⇒ rule never fires,
    // even though the query pins enabled=true internally
    val key = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    spark.conf.set(key, "0")
    try {
      val df = Relational.bloomFilterJoin(spark, sf)
      val off = df.collect().toSeq
      assert(!df.queryExecution.executedPlan.toString.toLowerCase.contains("bloom"),
        "rule must not fire with a zero creation-side threshold")
      assert(on == off)
    } finally spark.conf.unset(key)
  }
}
