package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: every SparkEntry query timed at the SF pointed to
  * by SPARK_GRAFT_SF_DIR, median of SPARK_GRAFT_TRIALS (default 3) trials
  * per query.
  *
  * Round-5 verdict: a single timed trial per query swung 2-4x between rounds
  * on byte-identical code (q47 2.0s -> 7.6s), making the perf gate
  * unadjudicable. Three timed trials with an untimed clearCache+GC between
  * them pin a median; the driver-graded JSON line carries short-key 2-decimal
  * medians (see [[BenchFormat]] for the byte budget), and full per-trial
  * times go to bench_detail.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    require(trials >= 1, s"SPARK_GRAFT_TRIALS must be >= 1, got $trials")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // All SparkEntry queries × several codegen stages far exceed the
      // 100-entry default generated-class cache; evictions between the
      // warmup and the timed run force slow Janino recompiles inside the
      // timings
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // queries × (1 warmup + `trials` timed) executions in one JVM: the
      // status stores retain plan graphs + metrics per execution/job/stage
      // by default (1000 executions) — tens of GB of slowly-dying heap that
      // turns late-bench GCs into multi-second stalls. Keep a handful.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warmups run at the TIMED SF (earlier rounds warmed on 10×-smaller
    // data; AQE join/codegen decisions diverge across SFs, so the timed
    // SF's generated code stayed C2-cold and heavy dedup queries ran 3-6×
    // slow on trial 1 — the round-5 "regression on identical code").
    // After a warmup every cache is cleared so no RESULTS leak into the
    // timed trials — only JIT/page-cache warmth remains, which is the
    // steady state of any long-running cluster.
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // Untimed cleanup. clearCache drops per-query persists; the explicit
    // SYNCHRONOUS unpersist of whatever is still registered (localCheckpoint
    // RDDs) removes those blocks now, on this thread, instead of leaving
    // them to the async ContextCleaner whose deletion work would otherwise
    // land inside the NEXT timed trial.
    def dropBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def cleanup(): Unit = { dropBlocks(); System.gc() }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1) // stable run order
    // Warm-up runs PER QUERY, immediately before that query's timed trials
    // (not one global warmup pass before a global timed pass): with 100+
    // queries in one JVM, a query warmed at the start of the run is cold
    // again ~100 queries later — JIT profiles decay, generated classes and
    // page cache get evicted, and the round-7 driver run showed exactly
    // that signature (q36 trials [40.9, 11.5, 5.9] decaying toward the
    // ~4 s local steady state). Zero distance between warmup and timing
    // makes the measurement independent of how many queries precede it.
    //
    // Per-trial times; a trial whose query THROWS records None (surfaced as
    // -1 in bench_detail.json and an "errors" entry on the JSON line), so a
    // failure never masquerades as an ordinary duration.
    val results: Seq[(String, Seq[Option[Double]])] = ordered.map { case (name, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      cleanup() // drop the warmup's result blocks before the timed trials
      val times = (1 to trials).map { t =>
        val gc0 = gcMs
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        val gcIn = gcMs - gc0
        cleanup()
        // stderr diagnostic (never the stdout JSON): how much of the trial
        // was GC stall — the round-5 variance investigation's instrument
        System.err.println(f"[bench] $name trial $t: $dt%.3f s, gc ${gcIn}ms, ok=$ok")
        if (ok) Some(dt) else None
      }
      name -> times
    }
    val medians = results.map { case (k, ts) =>
      val good = ts.flatten
      k -> (if (good.nonEmpty) BenchFormat.median(good) else -1.0)
    }
    val failed = results.collect { case (k, ts) if ts.exists(_.isEmpty) => k }
    val json = BenchFormat.line(medians, trials, sfDir, failed)
    if (json.length > 1400) // BenchFormatSpec asserts the 80-query budget
      System.err.println(s"[bench] WARNING: json line ${json.length} bytes risks tail clipping")
    // The driver parses the JSON line out of the run's output; sbt's logger
    // may prefix stdout lines, so ALSO persist the result to a plain file
    // (cwd and /tmp) where it can be read back verbatim.
    println(json)
    for (p <- Seq("bench_out.json", "/tmp/bench_out.json"))
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
      catch { case _: Throwable => () }
    // Full fidelity (every trial of every query under its FULL name, in run
    // order) plus the [min,median,max] spread per query, for variance work.
    val detail = BenchFormat.detail(results, trials, sfDir)
    for (p <- Seq("bench_detail.json", "/tmp/bench_detail.json"))
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), detail + "\n")
      catch { case _: Throwable => () }
    spark.stop()
  }
}
