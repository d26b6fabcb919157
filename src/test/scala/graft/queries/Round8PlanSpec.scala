package graft.queries

import graft.SparkSuite

/** Plan-shape guards for the round-8 operators: the one-scan / one-shuffle
  * scale arguments must be visible in the physical plan, not just claimed
  * in scaladoc.
  */
class Round8PlanSpec extends SparkSuite {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    // AQE's toString renders the final plan FOLLOWED by the initial plan —
    // keep only the final section or every operator counts twice
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  private def countOf(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("q104: grouping sets is ONE Expand over one join — not a scan per grouping") {
    val plan = executed(Aggregates.groupingSetsAgg(spark, sf))
    assert(countOf(plan, "Expand") == 1, s"expected 1 Expand:\n${plan.take(1500)}")
    // one scan of each side feeds the join; three groupings share it
    assert(countOf(plan, "Scan parquet") == 2,
      s"expected exactly 2 parquet scans (orders + lineitem):\n${plan.take(1500)}")
  }

  test("q106: unpivot is one scan + one Expand, no join, no hash shuffle") {
    val plan = executed(Aggregates.unpivotMeasures(spark, sf))
    assert(countOf(plan, "Expand") == 1)
    assert(countOf(plan, "Scan parquet") == 1)
    assert(!plan.contains("Join"), "unpivot must not join")
    // the only exchange is the final presentation sort's range partitioning
    assert(countOf(plan, "Exchange hashpartitioning") == 0,
      s"reshape must stay map-side:\n${plan.take(1500)}")
  }

  test("q108: N-column profile reads the source ONCE (shared Expand for the exact distincts)") {
    val plan = executed(Aggregates.columnProfile(spark, sf))
    assert(countOf(plan, "Scan parquet") == 1,
      s"profiling must scan once regardless of column count:\n${plan.take(1500)}")
    assert(countOf(plan, "Expand") == 1)
  }

  test("q109: funnel shuffles events once per stage on user_id only — no windows, no cartesian") {
    val plan = executed(EventOps.funnel(spark, sf))
    assert(!plan.contains("Window"), "funnel must not window the event stream")
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      "funnel joins must be equi-joins")
    // every hash exchange must key on user_id (stage aggregates + joins);
    // nothing may repartition on anything wider
    val badExchange = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("user_id"))
    assert(badExchange.isEmpty, s"non-user_id exchange:\n${badExchange.mkString("\n")}")
  }
}
