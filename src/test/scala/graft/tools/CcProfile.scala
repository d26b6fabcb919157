package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiling harness for the q47 stages at a given SF dir (probe
  * tooling, not shipped): times the pair pipeline alone, then the full
  * connected-components query, and reports the edge count the local-solve
  * gate sees.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ccprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.queries.Tables.documents(spark, dir)
    val pairs = graft.operators.Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", 64, 16, 3, 0.5).select(col("d1"), col("d2"))
    val n = time("pairs.count")(pairs.count())
    println(s"[ccprof] edges: $n")
    spark.catalog.clearCache(); System.gc()
    time("pairs.count again")(pairs.count())
    spark.catalog.clearCache(); System.gc()
    val full = time("full q47")(graft.queries.PipelineOps.dedupGroups(spark, dir).count())
    println(s"[ccprof] q47 rows: $full")
    spark.stop()
  }
}
