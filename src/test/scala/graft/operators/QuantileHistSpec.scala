package graft.operators

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The histogram sketch's contract: for any data and any requested rank,
  * the reported bin lower edge is ≤ the exact order statistic and within
  * one bin width of it. Raw ScalaCheck generators with fixed seeds
  * (scalatestplus isn't in the offline dependency set), the MediaFuzzSpec
  * idiom.
  */
class QuantileHistSpec extends SparkSuite {
  import spark.implicits._

  private val width = 0.5

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4321L + i)))

  test("property: exact order statistic lands inside the selected bin") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))
    samples(gen, 15).foreach { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "value")
      val n = vals.size
      val ranks = Seq(1L, (n / 2 + 1).toLong, n.toLong).distinct
        .map(r => (r, r)).toDF("q_pm", "rk") // label col reused as the rank
      val got = QuantileHist
        .quantileLo(QuantileHist.sketch(df, "value", width), width, ranks)
        .select($"rk", $"approx_lo").as[(Long, Double)].collect().toMap
      val sorted = vals.sorted
      got.foreach { case (rk, lo) =>
        val exact = sorted(rk.toInt - 1)
        assert(lo <= exact && exact < lo + width,
          s"rank $rk: exact $exact outside [$lo, ${lo + width})")
      }
    }
  }

  test("sketch state is one row per occupied bin and counts sum to n") {
    val df = Seq(0.1, 0.2, 0.6, 0.7, 2.4).map(Tuple1(_)).toDF("value")
    val h = QuantileHist.sketch(df, "value", width)
      .orderBy($"bin").as[(Long, Long)].collect().toSeq
    assert(h == Seq((0L, 2L), (1L, 2L), (4L, 1L)))
  }

  test("rrfFuse: integer weights, null ranks contribute zero, full outer keeps both sides") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val fused = HybridRetrieval.rrfFuse(Seq("s" -> a, "d" -> b), "id", "rank", c = 60)
      .orderBy($"id")
      .select($"id", $"s_rank", $"d_rank", $"rrf_score")
      .collect()
    // 1000000 div 61 = 16393, div 62 = 16129
    assert(fused.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 16393L), (2L, 16129L + 16393L), (3L, 16129L)))
    assert(fused(0).isNullAt(2) && fused(2).isNullAt(1))
  }
}
