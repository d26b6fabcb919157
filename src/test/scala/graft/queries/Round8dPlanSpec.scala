package graft.queries

import graft.SparkSuite

/** Plan-shape guards for the q132–q136 family: each scaladoc scale claim
  * that matters at 100 TB is pinned against the executed plan.
  */
class Round8dPlanSpec extends SparkSuite {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  test("q132: sketch path is one ObjectHashAggregate pair, no per-token shuffle") {
    val plan = executed(TextOps.cmsFreq(spark, sf))
    // the CountMin TypedImperativeAggregate plans as ObjectHashAggregate:
    // partial per input partition + final after a SinglePartition exchange
    // of fixed-size sketches — never a hashpartitioning of raw tokens on
    // the sketch branch (the probe branch's exact top-20 groupBy is the
    // verification anchor and MAY shuffle tokens)
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single >= 1, "sketch merge needs the 1-row single-partition exchange")
    // the sketch side joins the 20-row probe side without shuffling it:
    // a 1-row side must arrive via broadcast, not exchange
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"1-row sketch should broadcast:\n${plan.take(1500)}")
  }

  test("q134: per-purchase windows ride the user_id join exchange") {
    val plan = executed(EventOps.linearAttribution(spark, sf))
    // exchanges: the two join inputs hash on user_id, plus the final
    // (channel, day) aggregate — the p_id windows must NOT add their own
    val hashEx = "Exchange hashpartitioning\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val pIdOnly = hashEx.filter(keys => keys.contains("p_id") && !keys.contains("user_id"))
    assert(pIdOnly.isEmpty,
      s"window must reuse the user_id partitioning, found exchanges on: $hashEx")
  }

  test("q135: codebooks broadcast; corpus vectors never cartesian/NL-joined") {
    val plan = executed(VectorOps.pqAnn(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(plan.contains("BroadcastExchange"),
      "M x K codebook must arrive at encode/score via broadcast")
  }

  test("q136: merge iterations run on vocab-sized checkpointed data (no re-derivation)") {
    // learn() localCheckpoints each iteration; after learning, the
    // lineage of the NEXT iteration's input must be a scan of the
    // checkpoint, not the full tokenize+aggregate chain
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    val m = graft.operators.Bpe.learn(vocab, 2)
    assert(m.count() == 2)
  }
}
