package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row

/** The live q108 table (orders) has no nulls, so the null-count path —
  * the operator's raison d'être for data-quality gates — needs its own
  * fixture.
  */
class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  test("null counts, distinct-ignores-null, and non-numeric min/max") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(3), Some("b")),
      (None, Some("a")), (None, None))
      .toDF("num", "str")
    val rows = Profiling.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r).toMap

    val num = rows("num")
    assert(num.getLong(1) === 5L)        // n
    assert(num.getLong(2) === 2L)        // n_null
    assert(num.getLong(3) === 2L)        // n_distinct (1, 3 — null ignored)
    assert(num.getDouble(4) === 1.0 && num.getDouble(5) === 3.0)

    val str = rows("str")
    assert(str.getLong(2) === 2L)        // n_null
    assert(str.getLong(3) === 2L)        // a, b
    assert(str.isNullAt(4) && str.isNullAt(5)) // non-numeric: no min/max
  }

  test("all-null column profiles without error") {
    val df = Seq((1, Option.empty[java.lang.Double]), (2, Option.empty[java.lang.Double]))
      .toDF("id", "v")
    val r = Profiling.profile(df, Seq("v")).collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
