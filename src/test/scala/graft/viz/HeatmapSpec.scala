package graft.viz

import graft.SparkSuite

class HeatmapSpec extends SparkSuite {
  import spark.implicits._

  private lazy val shipping = Seq(
    (1L, Some(59.91), Some(10.75)),
    (2L, Some(59.91), Some(10.75)),
    (3L, Some(60.39), Some(5.32)),
    (4L, None, None), // dropped by na.drop
  ).toDF("id", "latitude", "longitude")

  test("heat cells: grid binning with weights, nulls dropped") {
    val cells = Heatmap.heatCells(shipping).collect()
    assert(cells.length == 2)
    val oslo = cells.find(_.getLong(2) == 2)
    assert(oslo.isDefined, "two Oslo rows share one bin")
  }

  test("center is the mean of non-null coordinates") {
    val (lat, lon) = Heatmap.center(shipping)
    assert(math.abs(lat - (59.91 + 59.91 + 60.39) / 3) < 1e-9)
    assert(math.abs(lon - (10.75 + 10.75 + 5.32) / 3) < 1e-9)
  }

  test("renders self-contained HTML with the data inlined") {
    val html = Heatmap.renderHtml(shipping)
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("59.91") && html.contains("10.75"))
    assert(!html.contains("http"), "no external resources (zero egress)")
  }

  test("empty input renders without errors") {
    val html = Heatmap.renderHtml(shipping.filter($"id" < 0))
    assert(html.contains("const pts = []"))
  }
}
