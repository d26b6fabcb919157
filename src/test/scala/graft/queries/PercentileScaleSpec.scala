package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q60 uses EXACT percentile (the oracle demands it); this spec pins the
  * documented 100 TB alternative: approx_percentile with bounded,
  * mergeable state must track the exact values within its accuracy bound.
  */
class PercentileScaleSpec extends SparkSuite {
  import spark.implicits._

  test("approx_percentile tracks exact percentile within the GK accuracy bound") {
    val ev = Tables.events(spark, sf)
    val acc = 1000 // relative rank error <= 1/acc
    val rows = ev.groupBy($"event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact50"),
        expr(s"approx_percentile(value, 0.5, $acc)").as("apx50"),
        expr("percentile(value, 0.95)").as("exact95"),
        expr(s"approx_percentile(value, 0.95, $acc)").as("apx95"),
        count(lit(1)).as("n"),
        max(abs($"value")).as("vmax"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      // rank error 1/acc ⇒ value error bounded by the local value spread;
      // assert loosely via relative-to-range distance
      val range = math.max(r.getAs[Double]("vmax"), 1.0)
      assert(math.abs(r.getAs[Double]("exact50") - r.getAs[Double]("apx50")) <= range * 0.05,
        s"${r.get(0)}: p50 diverged (n=$n)")
      assert(math.abs(r.getAs[Double]("exact95") - r.getAs[Double]("apx95")) <= range * 0.05,
        s"${r.get(0)}: p95 diverged (n=$n)")
    }
  }
}
