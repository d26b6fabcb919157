package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 56 queries × several codegen stages far exceed the 100-entry
      // default generated-class cache; evictions between the warmup and
      // the timed run force slow Janino recompiles inside the timings
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warmup on DIFFERENT (10× smaller) data, then the cache
    // is cleared so no results can leak into the timed runs. sf0.01 rather
    // than sf0.001: AQE join/codegen decisions at sf0.001 diverge from the
    // timed SF's, leaving the real code paths JIT-cold — measured 2-3× on
    // the flagship's first run (tools.ProfileQ).
    val warmDir =
      if (sfDir.contains("sf0.1")) "/root/testdata/sf0.01"
      else "/root/testdata/sf0.001"
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1) // stable run order
    if (warmDir != sfDir)
      ordered.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    // localCheckpoint blocks (dedup/corpus operators) are freed by the
    // ContextCleaner only after the owning RDD is GC'd — without an explicit
    // GC here, 70 warmup executions' worth of blocks sit in the block
    // manager and squeeze the timed runs' shuffle memory
    System.gc()
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // per-query persist()s must not help successors
      System.gc()                // release this query's checkpoint blocks (untimed)
      name -> dt
    }
    // 3-decimal times: full precision makes the line ~2.9 KB, which
    // overflowed the driver's output tail window in rounds 1-2 (the line
    // was clipped mid-JSON and recorded as parsed:null). ~1.7 KB fits.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver parses the JSON line out of the run's output; sbt's logger
    // may prefix stdout lines, so ALSO persist the result to a plain file
    // (cwd and /tmp) where it can be read back verbatim.
    println(json)
    for (p <- Seq("bench_out.json", "/tmp/bench_out.json"))
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
      catch { case _: Throwable => () }
    spark.stop()
  }
}
