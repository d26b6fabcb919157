package graft

import org.scalatest.funsuite.AnyFunSuite

/** The graded JSON line's byte budget and the median/failure semantics.
  * The driver keeps only the last 2000 chars of output (~1900 usable after
  * sbt's trailing "[success]" line); these tests pin >=25% headroom under
  * that at a 100-query hypothetical, so adding queries can never silently
  * clip the line again.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("median: odd count picks middle") {
    assert(BenchFormat.median(Seq(3.0, 1.0, 2.0)) == 2.0)
  }

  test("median: even count averages the two middle elements") {
    assert(BenchFormat.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(BenchFormat.median(Seq(1.0, 2.0)) == 1.5)
  }

  test("median: zero trials rejected") {
    intercept[IllegalArgumentException](BenchFormat.median(Nil))
  }

  test("shortKeys: unique prefixes shorten, colliders keep full names") {
    val m = BenchFormat.shortKeys(Seq("q01_agg_sum", "q02_filter_dates"))
    assert(m == Map("q01_agg_sum" -> "q01", "q02_filter_dates" -> "q02"))
    val c = BenchFormat.shortKeys(Seq("q01_agg_sum", "q01_other"))
    assert(c == Map("q01_agg_sum" -> "q01_agg_sum", "q01_other" -> "q01_other"))
  }

  test("line: 100 hypothetical long-named queries stay >=25% under 1900 bytes") {
    val names = (1 to 100).map(i => f"q$i%02d_some_rather_long_query_name_$i")
    val medians = names.map(_ -> 123.456)
    val line = BenchFormat.line(medians, 3, "/root/testdata/sf0.1")
    assert(line.length <= 1425, s"line is ${line.length} bytes")
  }

  test("line: the real SparkEntry query set has ample headroom") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case rendering: every median at 999.99 s — which %.1f rounds
    // to the 6-char "1000.0", the true per-entry maximum (the real
    // 111-query line measures ~1360 bytes). The binding constraint is
    // absolute: worst-case line + sbt's ~80-byte [success] suffix must
    // clear the driver's 2000-char tail window. Each query costs ≤14
    // worst-case bytes, so the format as-is survives to ~130 queries;
    // this assert trips at ~125 (1830 + 80 ≈ the window) as the signal
    // to shorten the graded keys further (e.g. drop the 'q' prefix),
    // BEFORE the driver clips anything
    val line = BenchFormat.line(names.map(_ -> 999.99), 3, "/root/testdata/sf0.1")
    assert(line.length <= 1830, s"line is ${line.length} bytes")
    // and the REALISTIC line (every query at its observed <10 s scale)
    // must keep ample headroom outright
    val realistic = BenchFormat.line(names.map(_ -> 9.99), 3, "/root/testdata/sf0.1")
    assert(realistic.length <= 1500, s"realistic line is ${realistic.length} bytes")
    // short keys must stay collision-free for the real set
    assert(BenchFormat.shortKeys(names).values.toSet.size == names.size)
  }

  test("line: failures surface as errors array, absent when clean") {
    val ms = Seq("q01_a" -> 1.0, "q02_b" -> -1.0)
    val clean = BenchFormat.line(ms.take(1), 3, "sf")
    assert(!clean.contains("errors"))
    val dirty = BenchFormat.line(ms, 3, "sf", failed = Seq("q02_b"))
    assert(dirty.contains(""""errors":["q02"]"""))
    // failed query's -1 median is excluded from the total
    assert(dirty.contains(""""value":1.000"""))
  }

  test("detail: failed trials render as -1, spread covers successes") {
    val d = BenchFormat.detail(
      Seq("q01_a" -> Seq(Some(1.0), None, Some(3.0))), 3, "sf")
    assert(d.contains(""""q01_a":[1.000,-1.000,3.000]"""))
    assert(d.contains(""""spread_min_med_max":{"q01_a":[1.000,2.000,3.000]}"""))
  }
}
