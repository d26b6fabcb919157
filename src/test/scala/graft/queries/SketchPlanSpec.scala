package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.SparkSuite

/** Plan pins for the sketch queries' scale claims: the whole point of a
  * sketch is that its aggregate NEVER shuffles per key — only per-task
  * fixed-size state moves. These specs read the formatted plan blocks and
  * pin the grouping keys of every sketch partial aggregate.
  */
class SketchPlanSpec extends SparkSuite {

  /** Formatted-explain operator blocks (blank-line separated). */
  private def blocks(df: DataFrame): Seq[String] = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .split("\n\n").toSeq
  }

  test("q146: HLL partials group by l_returnflag only — the exact anchor's per-key shuffle never carries the sketch") {
    val bs = blocks(ScaleOps.hllDistinct(spark, sf))
    val hllPartials = bs.filter(b => b.contains("partial_graft_hll"))
    assert(hllPartials.nonEmpty, "expected a partial graft_hll aggregate")
    hllPartials.foreach { b =>
      assert(b.contains("l_returnflag"), b)
      assert(!b.contains("l_orderkey"), s"sketch partials must not group per key:\n$b")
    }
    // the merge side too: no graft_hll aggregate anywhere keys on the orderkey
    bs.filter(_.contains("graft_hll")).foreach { b =>
      assert(!b.contains("Keys [2]"), s"sketch agg must stay 1-key:\n$b")
    }
  }

  test("q151: CMS sketch aggregates are global (Keys [0]) — only 32 KB grids reach the exchange") {
    val bs = blocks(ScaleOps.joinSizeEstimate(spark, sf))
    val cms = bs.filter(b => b.contains("partial_graft_count_min"))
    assert(cms.nonEmpty, "expected partial graft_count_min aggregates")
    cms.foreach { b =>
      assert(b.contains("Keys: []"), s"sketch partial must be ungrouped:\n$b")
    }
  }

  test("q154: per-day HLL partials group by day only; roll-up aggregates are bounded by days x 256 registers") {
    val bs = blocks(ScaleOps.hllRollup(spark, sf))
    val hllPartials = bs.filter(b => b.contains("partial_graft_hll"))
    assert(hllPartials.nonEmpty)
    hllPartials.foreach { b =>
      assert(!b.contains("user_id"), s"day sketches must not shuffle per user:\n$b")
    }
  }
}
