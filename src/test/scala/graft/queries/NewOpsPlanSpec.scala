package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Plan-shape guards for the round-7 operators: the scale arguments
  * (map-side bloom probe, cluster-bounded pair join, broadcast confirm)
  * must be visible in the physical plan, not just claimed in scaladoc.
  */
class NewOpsPlanSpec extends SparkSuite {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q81: bloom probe runs as a Filter (map-side), not a join on the corpus side") {
    val docs = Tables.documents(spark, sf)
    val df = graft.operators.BloomDecon.contaminatedDocs(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
      "doc_id", "text", 3)
    val plan = executed(df)
    assert(plan.contains("graft_bloom_contains"),
      "probe expression must appear in the physical plan")
    // the probe must sit in a Filter node, i.e. prefilter before the
    // confirm join rather than a join condition
    val filterLines = plan.linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(filterLines.contains("graft_bloom_contains"),
      s"bloom probe must be a Filter, got:\n${plan.take(2000)}")
  }

  test("q83: within-cluster pair join is an equi-join; no corpus-scale cartesian") {
    val df = graft.operators.SemanticDedup.keptAfterDedup(
      Tables.embeddings(spark, sf), "vec_id", "embedding",
      numCentroids = 8, minCosine = 0.4)
    val plan = executed(df)
    // every NL join must be the broadcast centroid assignment (<=K rows
    // broadcast; the `assigned` subtree is traversed three times so the
    // count is a multiple of the seed/lloyd/assign cross joins) — never a
    // partitioned cartesian over corpus rows
    assert(!plan.contains("CartesianProduct"), "no partitioned cartesian")
    val nl = "NestedLoopJoin".r.findAllIn(plan).size
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl == bnl, s"non-broadcast NL join present ($bnl of $nl broadcast)")
    // the within-cluster pair stage must be hash-keyed on centroid_id
    val hashJoins = plan.linesIterator.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("centroid_id")).size
    assert(hashJoins >= 1,
      s"pair stage must equi-join on centroid_id:\n${plan.take(2000)}")
  }

  test("q85: sketch aggregates partially (map-side) and confirm join broadcasts") {
    graft.functions.expressions.MisraGries.register(spark)
    val toks = graft.functions.TextFunctions.tokens($"text")
    val bigrams = Tables.documents(spark, sf)
      .select(explode(transform(
        slice(toks, lit(1), size(toks) - 1),
        (x, i) => concat_ws(" ", x, element_at(toks, i + 2)))).as("bigram"))

    // sketch pass: TypedImperativeAggregate must plan as partial+final
    // ObjectHashAggregate (mergeable map-side sketches)
    val sketch = bigrams.agg(
      graft.functions.expressions.MisraGries.sketch($"bigram", 2048).as("s"))
    val sketchPlan = executed(sketch)
    assert("ObjectHashAggregate".r.findAllIn(sketchPlan).size >= 2,
      s"partial + final sketch aggregation expected:\n${sketchPlan.take(1500)}")

    // end-to-end: the exact confirm must be a broadcast semi join — the
    // corpus never shuffles on the item key before the candidate filter
    val df = graft.operators.HeavyHitters.topK(bigrams, $"bigram", 20, 2048)
    // topK returns a materialized local result; assert on the confirm
    // plan it ran by rebuilding the confirm shape the operator uses
    val cand = sketch.select(explode($"s").as("e")).select($"e.item".as("item"))
    val confirm = bigrams.select($"bigram".as("item"))
      .join(broadcast(cand), Seq("item"), "left_semi")
      .groupBy($"item").agg(count(lit(1)).as("count"))
    val confirmPlan = executed(confirm)
    assert(confirmPlan.contains("BroadcastHashJoin") &&
      confirmPlan.contains("LeftSemi"),
      s"confirm must be broadcast semi join:\n${confirmPlan.take(1500)}")
    assert(df.count() == 20)
  }

  test("q91: bench-gram probe is a broadcast join — the corpus side never shuffles on the gram") {
    val df = graft.queries.TextOps.ngramNovelty(spark, sf)
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"bench grams must broadcast:\n${plan.take(1500)}")
    // the probe join itself must not be a shuffle join on the gram key
    // (the tiny bench side's internal distinct may shuffle — that's fine)
    val shuffleJoins = plan.linesIterator.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("shingle")).toSeq
    assert(shuffleJoins.isEmpty,
      s"corpus grams must not shuffle-join on the gram key:\n${shuffleJoins.mkString("\n")}")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the runtime complement to q40's explicit salting: one hot key owns
    // most of the fact side, thresholds are scaled down to sf-test data
    // volume, and AQE must mark the sort-merge join skew-handled. At
    // 100 TB the same mechanism splits a hot partition across tasks
    // without any query rewrite.
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
      val fact = spark.range(300000)
        .select(when($"id" % 10 =!= 0, lit(1L)).otherwise(pmod($"id", lit(1000))).as("k"),
          $"id".as("payload"))
      val dim = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("attr"))
      // downstream must NOT require the join key's partitioning: a
      // keyed aggregate on k would veto the skew split (splitting breaks
      // hashpartitioning(k) and AQE refuses to add a recovery shuffle) —
      // a global rollup keeps the split legal, as any non-k consumer does
      // sum(payload) keeps the fact side's 8-byte payload column alive
      // through column pruning — an all-constant key column alone
      // compresses below any skew threshold in the shuffle files
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum($"payload").as("p"), sum($"attr").as("s"))
      val plan = executed(joined)
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q89: co-bucketed join plans with zero Exchange on either join side") {
    // disable AQE so the final (non-adaptive) plan string is inspectable,
    // and pin the non-broadcast path — the bucketed layout is what must
    // carry the join
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (o, c) = graft.operators.BucketedTables.ordersCustomer(spark, sf)
      val joined = o.join(c.hint("MERGE"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      val plan = executed(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!plan.contains("hashpartitioning(o_custkey") &&
        !plan.contains("hashpartitioning(c_custkey"),
        s"join keys must NOT be re-shuffled — bucketing should carry them:\n${plan.take(2000)}")
      assert(plan.contains("SelectedBucketsCount"),
        s"scans must be bucket-aware:\n${plan.take(2000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
