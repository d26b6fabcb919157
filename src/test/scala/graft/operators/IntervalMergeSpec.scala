package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class IntervalMergeSpec extends SparkSuite {
  import spark.implicits._

  private def spans(rows: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Long)] =
    IntervalMerge.merge(rows.toDF("k", "s", "e"), Seq("k"), col("s"), col("e"))
      .orderBy("k", "span_start")
      .as[(String, Long, Long, Long)].collect().toSeq

  test("overlapping, nested, touching, and disjoint intervals") {
    val out = spans(Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> one span
      ("a", 20L, 25L),                  // touching prev end -> merges
      ("a", 40L, 50L), ("a", 42L, 45L), // nested -> one span
      ("a", 60L, 61L),                  // disjoint
      ("b", 0L, 1L)))                   // other key unaffected
    assert(out === Seq(
      ("a", 0L, 25L, 3L), ("a", 40L, 50L, 2L), ("a", 60L, 61L, 1L),
      ("b", 0L, 1L, 1L)))
  }

  test("a long interval bridging later short ones keeps the cummax (not lag) semantics") {
    // [0,100] followed by [10,20], [30,40]: a LAG(end)-based merge would
    // wrongly split at 30 (prev row's end is 20); the running max must win
    val out = spans(Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L)))
    assert(out === Seq(("a", 0L, 100L, 3L)))
  }

  test("tied (start,end) pairs are order-insensitive and merge") {
    val out = spans(Seq(("a", 0L, 5L), ("a", 0L, 5L), ("a", 3L, 8L)))
    assert(out === Seq(("a", 0L, 8L, 3L)))
  }

  test("plan: exactly one exchange — windows and group-by share the key partitioning") {
    val df = IntervalMerge.merge(
      Seq(("a", 0L, 1L)).toDF("k", "s", "e"), Seq("k"), col("s"), col("e"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
