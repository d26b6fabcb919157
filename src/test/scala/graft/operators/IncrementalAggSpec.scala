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

  private def asCdcMap(df: org.apache.spark.sql.DataFrame) =
    df.select($"user", $"n", $"nv", $"total".cast("string"))
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("property: maintainCdc(state(v1), diff(v1,v2)) == state(v2), any snapshots") {
    // snapshots share an id space (overlap => updates, including rows that
    // MOVE between user groups and values that go null <-> non-null)
    val rowGen = for {
      id <- Gen.choose(0L, 30L)
      u <- Gen.choose(0L, 4L)
      v <- Gen.option(Gen.choose(-1000, 1000).map(_ / 100.0))
    } yield (id, u, v)
    val snapGen = Gen.listOf(rowGen).map(_.groupBy(_._1).map(_._2.head).toSeq)
    samples(Gen.zip(snapGen, snapGen), 12).foreach { case (s1, s2) =>
      val v1 = s1.toDF("id", "user", "value")
      val v2 = s2.toDF("id", "user", "value")
      val changes = SnapshotDiff.diff(v1, v2, Seq("id"),
        carryValues = Seq("user", "value"))
      val got = asCdcMap(IncrementalAgg.maintainCdc(
        IncrementalAgg.state(v1, Seq("user"), "value"),
        changes, Seq("user"), "value"))
      val expected = asCdcMap(IncrementalAgg.state(v2, Seq("user"), "value"))
      assert(got == expected,
        s"CDC fold diverged from recompute: v1=$s1 v2=$s2")
    }
  }

  test("maintainCdc: delete-everything empties the state; all-null keys keep NULL totals") {
    val v1 = Seq((1L, 10L, Option(1.5)), (2L, 10L, Option(2.5)),
      (3L, 20L, Option.empty[Double])).toDF("id", "user", "value")
    val v2 = Seq((3L, 20L, Option.empty[Double])).toDF("id", "user", "value")
    val out = asCdcMap(IncrementalAgg.maintainCdc(
      IncrementalAgg.state(v1, Seq("user"), "value"),
      SnapshotDiff.diff(v1, v2, Seq("id"), carryValues = Seq("user", "value")),
      Seq("user"), "value"))
    assert(out == Map(20L -> (1L, 0L, None))) // user 10 gone; 20's sum stays SQL-NULL
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
