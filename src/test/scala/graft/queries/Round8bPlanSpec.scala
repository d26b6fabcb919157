package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics + plan-shape guards for the q113–q117 family: the scale
  * arguments in their scaladoc (single exchange, broadcast stats joins,
  * no nested-loop joins) must be visible in the executed physical plan,
  * and the fixed-point PageRank arithmetic must match a hand-computed
  * value — the one thing the DuckDB oracle can't localize if it drifts.
  */
class Round8bPlanSpec extends SparkSuite {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  private def countOf(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("q113: both SCD2 window passes share ONE user_id exchange") {
    val plan = executed(MergeOps.scd2(spark, sf))
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1, s"expected exactly 1 hash exchange:\n${hashEx.mkString("\n")}")
    assert(hashEx.head.contains("user_id"))
    assert(!plan.contains("Join"), "SCD2 is windows-only — no join may appear")
  }

  test("q113: intervals chain per user — consecutive-duplicate collapse holds") {
    import spark.implicits._
    val out = MergeOps.scd2(spark, sf).cache()
    try {
      // no two consecutive versions of a user carry the same event_type
      val lagged = out.withColumn("prev",
        lag($"event_type", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"version")))
      assert(lagged.filter($"prev" === $"event_type").count() == 0)
      // valid_to of version k equals valid_from of version k+1 (half-open chain)
      val chain = out.as("a").join(out.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.version") + 1 === col("b.version"))
      assert(chain.filter(col("a.valid_to") =!= col("b.valid_from")).count() == 0)
      // exactly one open (current) interval per user
      val cur = out.filter($"is_current").groupBy($"user_id").count()
      assert(cur.filter($"count" =!= 1).count() == 0)
    } finally out.unpersist()
  }

  test("q114: pair mining joins are equi-joins — no cartesian/nested-loop") {
    val plan = executed(GraphOps.copurchasePairs(spark, sf))
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"basket self-join must stay an equi-join:\n${plan.take(1500)}")
  }

  test("q115: one fixed-point step matches the hand-computed path graph") {
    import spark.implicits._
    // path A(1)-B(2)-C(3): deg 1/2/1; after one step (integer units):
    // A = 150000 + 85*(1000000 DIV 2) DIV 100 = 575000
    // B = 150000 + 85*(1000000 + 1000000) DIV 100 = 1850000, C = A
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
    val got = GraphOps.pagerankFixedPoint(edges, 1)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 575000L), (2L, 1850000L), (3L, 575000L)))
  }

  test("q116: feature hashing is one scan, one aggregate exchange, no join") {
    val plan = executed(TextOps.featureHash(spark, sf))
    assert(countOf(plan, "Scan parquet") == 1)
    assert(!plan.contains("Join"), "hashing trick needs no vocabulary join")
    // explode → partial agg → ONE hash exchange on (doc_id, bucket)
    assert(countOf(plan, "Exchange hashpartitioning") == 1,
      s"expected a single aggregate exchange:\n${plan.take(1500)}")
  }

  test("q118: golden-record survivorship rides ONE user_id exchange, no join") {
    val plan = executed(MergeOps.goldenRecord(spark, sf))
    assert(!plan.contains("Join"),
      "per-column survivorship must not join the history to itself")
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("user_id"),
      s"expected exactly one user_id exchange:\n${hashEx.mkString("\n")}")
  }

  test("q120: transition matrix — one user_id window exchange before the tiny pair aggregate") {
    val plan = executed(EventOps.sessionTransitions(spark, sf))
    val userEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).filter(_.contains("user_id")).size
    assert(userEx == 1, s"the event stream must shuffle on user_id exactly once:\n$plan")
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
  }

  test("q121: Gini rank comes from globalRank — no single-partition exchange anywhere") {
    val plan = executed(ScaleOps.keySkew(spark, sf))
    // the ranking window must be partitioned per range-partition (__pid),
    // never a global single-partition window (the range exchange itself
    // happens inside globalRank's localCheckpoint, so it is not visible in
    // this final plan — the __pid windowspec is the observable proof)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")),
      s"ranking window must partition on __pid:\n${winLines.mkString("\n")}")
    // the only SinglePartition gather happens AFTER partial aggregation —
    // it carries ≤numPartitions pre-aggregated rows, not the key table
    assert(plan.contains("partial_count"),
      "final stats must partial-aggregate before the 1-row gather")
  }

  test("q117: median/MAD stats come back as broadcast joins — events never shuffle-join") {
    val plan = executed(EventOps.madAnomaly(spark, sf))
    // ≥2: AQE stage rendering can repeat a BroadcastQueryStage subtree, so
    // the exact count is unstable — the load-bearing half is the ABSENCE
    // of any shuffle join below
    assert(countOf(plan, "BroadcastHashJoin") >= 2,
      s"med + mad joins must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the event stream must not shuffle for a stats join")
    // the only hash exchanges are the two ranking passes on the group key
    val badEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(l => l.contains("event_type") && l.contains("day"))
    assert(badEx.isEmpty, s"non-group-key exchange:\n${badEx.mkString("\n")}")
  }
}
