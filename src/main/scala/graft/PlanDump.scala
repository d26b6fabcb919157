package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round measurement tool (guide §1.1/§7.2): dump
  * `.explain("formatted")` for declared queries to files so plan-shape
  * claims (Exchange count, join strategy, PushedFilters/ReadSchema) are
  * auditable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  * Note: query FUNCTIONS run eagerly for DML/streaming entries (their
  * side effects happen at call time); the dumped plan is the plan of the
  * returned DataFrame. For pure queries that is the full logical →
  * physical pipeline the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq
      .filter(kv => only.forall(s => s.exists(p => kv._1.startsWith(p))))
      .sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
