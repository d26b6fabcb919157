package graft.operators

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Maintenance algebra: folding deltas into the state must equal
  * recomputing from scratch, for any split of the rows and any fold
  * grouping (the monoid property the operator rests on).
  */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(777L + i)))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select($"user_id", $"n", $"total".cast("string"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("property: maintain(state(hist), delta) == state(hist ++ delta), any split") {
    val rowGen = for {
      u <- Gen.choose(0L, 5L)
      v <- Gen.choose(-1000, 1000)
    } yield (u, v / 100.0)
    val gen = for {
      rows <- Gen.nonEmptyListOf(rowGen)
      cut <- Gen.choose(0, rows.size)
    } yield (rows, cut)
    samples(gen, 15).foreach { case (rows, cut) =>
      val (hist, delta) = rows.splitAt(cut)
      val all = rows.toDF("user_id", "value")
      val expected = asMap(IncrementalAgg.state(all, Seq("user_id"), "value"))
      val prev = IncrementalAgg.state(hist.toDF("user_id", "value"), Seq("user_id"), "value")
      val got = asMap(IncrementalAgg.maintain(
        prev, delta.toDF("user_id", "value"), Seq("user_id"), "value"))
      assert(got == expected, s"split at $cut of ${rows.size} diverged")
    }
  }

  test("sequential folds compose: two deltas one at a time == both at once") {
    val hist = Seq((1L, 1.25), (2L, 2.0)).toDF("user_id", "value")
    val d1 = Seq((1L, 0.75), (3L, 5.5)).toDF("user_id", "value")
    val d2 = Seq((2L, -2.0), (3L, 0.5)).toDF("user_id", "value")
    val s0 = IncrementalAgg.state(hist, Seq("user_id"), "value")
    val oneAtATime = asMap(IncrementalAgg.maintain(
      IncrementalAgg.maintain(s0, d1, Seq("user_id"), "value"),
      d2, Seq("user_id"), "value"))
    val bothAtOnce = asMap(IncrementalAgg.maintain(
      s0, d1.unionByName(d2), Seq("user_id"), "value"))
    assert(oneAtATime == bothAtOnce)
    assert(oneAtATime(3L)._1 == 2L)
  }
}
