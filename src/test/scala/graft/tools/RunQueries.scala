package graft.tools

import org.apache.spark.sql.SparkSession

/** Regression sweep: run a subset (or all) of SparkEntry.queries at one SF
  * in a single JVM and print rows-or-error per query — the fast way to
  * check a fix across many queries without paying Verify's parquet writes.
  *
  *   sbt "Test/runMain graft.tools.RunQueries /root/testdata/sf0.001 q37,q55,q84"
  *   sbt "Test/runMain graft.tools.RunQueries /root/testdata/sf0.001 all"
  *   sbt "Test/runMain graft.tools.RunQueries /root/testdata/sf0.01 q104 /tmp/vq104"
  *
  * Prefix match: "q37" selects q37_time_buckets. With a third arg the
  * selected queries also dump Verify-shaped output (result parquet +
  * oracle_sql.json restricted to the selection) so
  * `scripts/verify_local.py <sf> <outDir>` can oracle-check a subset
  * without paying the full Verify run.
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val sel = if (args.length > 1) args(1) else "all"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = sel.split(',').map(_.trim).filter(_.nonEmpty)
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      sel == "all" || wanted.exists(n.startsWith)
    }
    var failed = 0
    qs.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, dir)
        val n = outDir match {
          case Some(o) =>
            df.coalesce(1).write.mode("overwrite").parquet(s"$o/$name")
            spark.read.parquet(s"$o/$name").count()
          case None => df.count()
        }
        println(f"[run] $name%-28s OK    rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      } catch {
        case e: Throwable =>
          failed += 1
          println(f"[run] $name%-28s FAIL  ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
      spark.catalog.clearCache()
    }
    outDir.foreach { o =>
      // verify_local.py needs the oracle map; restrict it to the selection
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      val json = graft.SparkEntry.oracleSql
        .filter { case (k, _) => qs.exists(_._1 == k) }
        .map { case (k, v) => "\"" + esc(k) + "\": \"" + esc(v) + "\"" }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$o/oracle_sql.json"), json)
    }
    println(s"[run] ${qs.size - failed}/${qs.size} ok")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
