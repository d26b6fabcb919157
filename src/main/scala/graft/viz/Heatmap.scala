package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E3 heatmap (`/root/reference/utils.py:7-23`, `shopifydb.py:97-105`):
  * an HTML heatmap of shipping coordinates.
  *
  * The reference hands every row to folium on the driver; here the
  * aggregation is server-side (S8/A7 per SURVEY §3 E3): null-drop → grid
  * binning at 3 decimals (~110 m) → weighted cells → only the (bounded)
  * cell set is collected. Render is a dependency-free self-contained HTML
  * canvas — no CDN, zero egress.
  */
object Heatmap {

  /** Grid-binned heat cells: (lat_bin, lon_bin, weight). Distributed agg;
    * output cardinality is bounded by the grid, not the row count.
    */
  def heatCells(shipping: DataFrame, precision: Int = 3): DataFrame =
    shipping.na.drop(Seq("latitude", "longitude"))
      .groupBy(
        round(col("latitude"), precision).as("lat_bin"),
        round(col("longitude"), precision).as("lon_bin"))
      .agg(count(lit(1)).as("weight"))

  /** Map center = mean of coordinates (`utils.py:16`). */
  def center(shipping: DataFrame): (Double, Double) = {
    val r = shipping.na.drop(Seq("latitude", "longitude"))
      .agg(avg("latitude"), avg("longitude")).head()
    if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
  }

  /** Self-contained HTML: canvas-rendered intensity dots over an
    * equirectangular projection around the data's bounding box.
    */
  def renderHtml(shipping: DataFrame, precision: Int = 3): String = {
    val cells = heatCells(shipping, precision).collect()
    val (cLat, cLon) = center(shipping)
    val points = cells.map { r =>
      val lat = r.get(0) match { case d: java.math.BigDecimal => d.doubleValue; case d: Double => d }
      val lon = r.get(1) match { case d: java.math.BigDecimal => d.doubleValue; case d: Double => d }
      s"[$lat,$lon,${r.getLong(2)}]"
    }.mkString("[", ",", "]")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>Shipping heatmap</title></head>
       |<body style="margin:0">
       |<canvas id="m" width="1200" height="800" style="background:#0b1d2a"></canvas>
       |<script>
       |const pts = $points;
       |const center = [$cLat, $cLon];
       |const cv = document.getElementById('m'), ctx = cv.getContext('2d');
       |if (pts.length) {
       |  const lats = pts.map(p=>p[0]), lons = pts.map(p=>p[1]);
       |  const la0=Math.min(...lats), la1=Math.max(...lats);
       |  const lo0=Math.min(...lons), lo1=Math.max(...lons);
       |  const wMax = Math.max(...pts.map(p=>p[2]));
       |  const px = lon => 40 + (cv.width-80) * (lon-lo0) / Math.max(1e-9, lo1-lo0);
       |  const py = lat => cv.height-40 - (cv.height-80) * (lat-la0) / Math.max(1e-9, la1-la0);
       |  for (const [lat,lon,w] of pts) {
       |    const a = 0.25 + 0.75*w/wMax;
       |    const g = ctx.createRadialGradient(px(lon),py(lat),0,px(lon),py(lat),12);
       |    g.addColorStop(0, 'rgba(255,90,40,'+a+')');
       |    g.addColorStop(1, 'rgba(255,90,40,0)');
       |    ctx.fillStyle = g;
       |    ctx.beginPath(); ctx.arc(px(lon),py(lat),12,0,2*Math.PI); ctx.fill();
       |  }
       |  // center-of-mass crosshair (utils.py:16's map center)
       |  ctx.strokeStyle = 'rgba(255,255,255,0.8)';
       |  const cx = px(center[1]), cy = py(center[0]);
       |  ctx.beginPath(); ctx.moveTo(cx-8,cy); ctx.lineTo(cx+8,cy);
       |  ctx.moveTo(cx,cy-8); ctx.lineTo(cx,cy+8); ctx.stroke();
       |}
       |</script></body></html>""".stripMargin
  }

  def save(shipping: DataFrame, outFile: String, precision: Int = 3): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      renderHtml(shipping, precision))
  }
}
