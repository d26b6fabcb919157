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

  test("line: byte cap holds at ANY query count (500 worst-case queries)") {
    // 500 long-named queries, every median at the 6-char maximum rendering,
    // WITH the normalized-twin fields present: the budget-capped format
    // must stay at/below MaxLineBytes — adding queries can never clip the
    // driver tail again
    val names = (1 to 500).map(i => f"q$i%03d_some_rather_long_query_name_$i")
    val line = BenchFormat.line(names.map(_ -> 999.99), 3, "/root/testdata/sf0.1",
      normTotal = Some(499995.0), fastProbe = Some(0.238))
    assert(line.length <= BenchFormat.MaxLineBytes, s"line is ${line.length} bytes")
    assert(line.contains(""""omitted":"""), "cap must surface an omitted count")
    // total still covers every query, not just the kept entries
    assert(line.contains(""""value":499995.000"""))
  }

  test("line: probe-normalized twin rides beside the raw total") {
    val line = BenchFormat.line(Seq("q01_a" -> 4.0, "q02_b" -> 2.0), 3, "sf",
      normTotal = Some(3.0), fastProbe = Some(0.25))
    assert(line.contains(""""value":6.000"""))
    assert(line.contains(""""norm":3.000"""))
    assert(line.contains(""""probe_sec":0.250"""))
    // absent when not provided (subset/dev runs)
    val plain = BenchFormat.line(Seq("q01_a" -> 4.0), 3, "sf")
    assert(!plain.contains("norm") && !plain.contains("probe_sec"))
  }

  test("line: omitted entries are exactly the fastest; worst queries always kept") {
    val medians = (1 to 300).map(i => f"q$i%03d_name" -> i.toDouble)
    val line = BenchFormat.line(medians, 3, "sf")
    assert(line.length <= BenchFormat.MaxLineBytes)
    // the slowest query must be present, the fastest must be the one dropped
    assert(line.contains(""""q300":300.0""")) // >=100 s renders 1-decimal
    assert(!line.contains(""""q001":"""))
    // omitted count + kept entries == total queries
    val omitted = """"omitted":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    val kept = """"q\d+":""".r.findAllIn(line).size
    assert(kept + omitted == 300)
  }

  test("line: all-trials-failed queries outrank even the slowest successes") {
    val medians = (1 to 300).map(i => f"q$i%03d_name" -> i.toDouble) :+ ("q999_dead" -> -1.0)
    val line = BenchFormat.line(medians, 3, "sf", failed = Seq("q999_dead"))
    assert(line.contains(""""q999":-1.00"""))
    assert(line.contains(""""errors":["q999"]"""))
    assert(line.length <= BenchFormat.MaxLineBytes)
  }

  test("line: the real SparkEntry query set fits and keys stay collision-free") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case rendering: every median at 999.99 s — %.1f rounds it to
    // the 6-char "1000.0", the per-entry maximum
    val line = BenchFormat.line(names.map(_ -> 999.99), 3, "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.MaxLineBytes, s"line is ${line.length} bytes")
    // the REALISTIC line (every query at its observed <10 s scale) should
    // currently keep every query un-omitted; if the set outgrows that, the
    // omitted tail is by construction the fastest queries only
    val realistic = BenchFormat.line(names.map(_ -> 9.99), 3, "/root/testdata/sf0.1")
    assert(realistic.length <= BenchFormat.MaxLineBytes, s"realistic line is ${realistic.length} bytes")
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

  test("detail: per-trial probes, normalized medians, and retry annotations persist") {
    val d = BenchFormat.detail(
      Seq("q01_a" -> Seq(Some(1.0), Some(2.0), Some(3.0))), 3, "sf",
      probeTrials = Seq("q01_a" -> Seq(0.24, 0.62, 0.25)),
      normMedians = Seq("q01_a" -> 0.9),
      retried = Seq("q01_a" -> Seq((2, 13.9, 0.64))))
    // EVERY trial's probe is in the artifact — a contention window spanning
    // trials 2-3 is now attributable from the file alone (round-10 item 1)
    assert(d.contains(""""cpu_probe_trials":{"q01_a":[0.240,0.620,0.250]}"""))
    assert(d.contains(""""median_norm":{"q01_a":0.900}"""))
    assert(d.contains(""""contended_retries":{"q01_a":[[2,13.900,0.640]]}"""))
    // absent sections stay absent (subset/dev runs)
    val plain = BenchFormat.detail(Seq("q01_a" -> Seq(Some(1.0))), 1, "sf")
    assert(!plain.contains("cpu_probe_trials") && !plain.contains("median_norm")
      && !plain.contains("contended_retries"))
  }
}
