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
  *
  * Round-10 verdict item 1 — the artifact must be CONTENTION-PROOF: the
  * box is bimodal at the hypervisor level and its windows open/close
  * mid-run, so (a) the fixed-work parallel CPU probe is now persisted for
  * EVERY trial (round 10 kept only the last trial's, so a window spanning
  * trials 2-3 left no machine-state evidence and the driver run recorded
  * q36/q139 3-5x phantom regressions); (b) a trial whose probe exceeds
  * [[Bench.ContendedRatio]]x the run's fast-state probe is ANNOTATED in the
  * artifact and re-run once (bounded: one retry per query) — the discarded
  * measurement stays in `contended_retries` so the attribution is
  * auditable, not silent; (c) the graded JSON line and the detail file
  * carry a probe-NORMALIZED twin of every median (trial time scaled by
  * fastProbe/trialProbe before the median), so cross-run comparisons have
  * a machine-speed-corrected number beside the raw one.
  */
object Bench {

  /** A trial is flagged contended when its parallel probe exceeds this
    * multiple of the run's fast-state probe. The two machine states sit
    * ~2.6x apart (0.238s vs 0.625s fixed work, round-10 measurement);
    * 2.0 splits them with margin on both sides.
    */
  val ContendedRatio = 2.0

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
    // Fixed-work CPU reference probe (round-9 verdict item 3): the box this
    // runs on is observably bimodal — identical code measured 1.5-2× apart
    // across same-day runs with zero residual storage, zero page-cache
    // effect (17 MB dataset) and an idle loadavg, i.e. hypervisor-level
    // contention. A single-threaded integer loop and a 32-thread variant
    // timed before/after the run give every bench artifact a machine-speed
    // denominator: driver-vs-clean drift beyond the probe ratio is ours,
    // drift matching it is the box.
    def cpuProbeOnce(iters: Int = 300000000): Double = {
      val t0 = System.nanoTime()
      var s = 0L; var i = 0
      while (i < iters) { s += i.toLong * i; i += 1 }
      if (s == 42L) System.err.print("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    def cpuProbe(): (Double, Double) = {
      cpuProbeOnce() // JIT warm
      val single = cpuProbeOnce()
      val t0 = System.nanoTime()
      val threads = (1 to cpus.toInt).map(_ => new Thread(() => { cpuProbeOnce(); () }))
      threads.foreach(_.start()); threads.foreach(_.join())
      (single, (System.nanoTime() - t0) / 1e9)
    }
    // per-trial machine-state reading: the box's contention windows open
    // and close WITHIN a run (run C of round 10: q30 5.6 s vs 1.6 s on
    // identical code with clean endpoint probes), so each TRIAL carries
    // its own denominator. It must be the PARALLEL probe — the
    // single-thread loop reads the same in both machine states; only
    // aggregate throughput drops.
    def parallelProbe(): Double = {
      val t0p = System.nanoTime()
      val ths = (1 to cpus.toInt).map(_ => new Thread(() => { cpuProbeOnce(37500000); () }))
      ths.foreach(_.start()); ths.foreach(_.join())
      (System.nanoTime() - t0p) / 1e9
    }
    // fixed-work fsync probe (round-11 verdict item 4): the CPU probe is
    // exact for CPU-bound queries but only a LOWER bound for fsync-bound
    // streaming replays — their wall clock follows storage latency, which
    // the hypervisor modulates independently of CPU. Four 4 KiB
    // create+write+fsync cycles measure exactly that axis; per-trial
    // values persist beside the CPU probes so the heavy tail
    // (q145/q208/q249 class) has an honest denominator.
    // Device choice is deliberate: the probe lives in java.io.tmpdir
    // because the fsync-bound queries' checkpoints, offset logs, and
    // staged fixtures ALL live there too (createTempDirectory) — the
    // probe must measure the device those queries actually sync against,
    // not the data dir's (read-only testdata, never fsynced).
    val ioDir = java.nio.file.Files.createTempDirectory("graft_ioprobe")
    def ioProbe(): Double = {
      val buf = Array.fill[Byte](4096)(42)
      val t0i = System.nanoTime()
      (0 until 4).foreach { i =>
        val f = ioDir.resolve(s"p$i").toFile
        val out = new java.io.FileOutputStream(f)
        try { out.write(buf); out.getFD.sync() } finally out.close()
      }
      val dt = (System.nanoTime() - t0i) / 1e9
      (0 until 4).foreach(i => ioDir.resolve(s"p$i").toFile.delete())
      dt
    }
    // Untimed cleanup. Order matters (round-9 q47 bench-context
    // regression): Catalog.clearCache() unpersists cached plans with
    // blocking=false AND deregisters their RDDs from getPersistentRDDs, so
    // running it FIRST hid those blocks from the blocking loop and their
    // deletion landed inside the NEXT timed trial — each q47 trial ran
    // against the previous trial's still-evicting multi-GB shingle cache.
    // The blocking unpersist now runs first and covers Dataset caches,
    // explicit persists, and localCheckpoint blocks alike; clearCache()
    // afterwards only clears the (now block-less) CacheManager registry.
    def dropBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    def cleanup(): Unit = {
      dropBlocks()
      // Scrub broadcast blocks synchronously BEFORE the gc: the gc enqueues
      // the dead Broadcast refs for the ASYNC ContextCleaner, and racing it
      // (scrub-after-gc) made both sides remove the same block — harmless
      // but ERROR-logged by Spark internals. Scrub-first leaves the cleaner
      // a quiet no-op, and the eviction still cannot land in the next timed
      // trial (safe here: between trials no plan is live, and a fresh plan
      // re-broadcasts what it needs).
      org.apache.spark.graft.BlockHygiene.dropBroadcasts(spark.sparkContext)
      System.gc()
    }
    // SPARK_GRAFT_ONLY="q29,q47_dedup_groups": run only queries whose name
    // starts with one of the comma-separated prefixes — local iteration on a
    // family without paying the full run (driver leaves it unset).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1) // stable run order
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
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
    // Per-query post-cleanup residual storage (blocks, memBytes, diskBytes,
    // broadcasts) after the LAST trial — the round-9 drift-attribution
    // instrument: a nonzero residual here is exactly the storage pressure
    // the next query's trials would have run under.
    val residual = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Long, Long, Int)]
    val probeTrials = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val ioProbeTrials = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val retriedTrials = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(Int, Double, Double)]]
    ioProbe() // page-cache/metadata warm before the first reading counts
    var fastIo = ioProbe()
    val probeBefore = cpuProbe()
    System.err.println(f"[bench] cpu probe before: single ${probeBefore._1}%.3f s, " +
      f"${cpus}x ${probeBefore._2}%.3f s")
    // the run's fast-state probe: a RUNNING min over every parallel probe
    // seen (endpoints + every trial), in PER-TRIAL units — the endpoint
    // probe does 8x the per-trial fixed work (300M vs 37.5M iterations),
    // so it seeds the min divided by 8. The contention flag compares each
    // trial against the fastest state observed so far; normalization after
    // the run uses the final (whole-run) minimum.
    var fastProbe = probeBefore._2 / 8.0
    val results: Seq[(String, Seq[Option[Double]])] = ordered.map { case (name, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      cleanup() // drop the warmup's result blocks before the timed trials
      val times = scala.collection.mutable.ArrayBuffer.empty[Option[Double]]
      val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ioProbes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val retries = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
      var retried = false
      var t = 1
      while (t <= trials) {
        val gc0 = gcMs
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        val gcIn = gcMs - gc0
        cleanup()
        val (rb, rm, rd, rbc) = org.apache.spark.graft.BlockHygiene.snapshot(spark.sparkContext)
        val probeQ = parallelProbe()
        val ioQ = ioProbe()
        fastProbe = math.min(fastProbe, probeQ)
        fastIo = math.min(fastIo, ioQ)
        val contended = probeQ > ContendedRatio * fastProbe
        // outlier policy (round-10 q36 [6.4,13.6,11.6] vs independent
        // 2.90 s): a contended trial is discarded into the annotation and
        // re-run ONCE per query — bounded, so a permanently-slow machine
        // state costs at most one extra trial and the artifact still
        // records reality (the retry's own probe is persisted; if the
        // window outlives the retry, the raw numbers stay and the
        // normalized twin carries the correction).
        if (contended && !retried) {
          retried = true
          retries += ((t, if (ok) dt else -1.0, probeQ))
          System.err.println(f"[bench] $name trial $t: $dt%.3f s CONTENDED " +
            f"(probe ${probeQ * 1000}%.0fms > ${ContendedRatio}%.1fx fast " +
            f"${fastProbe * 1000}%.0fms) — discarding and re-running once")
        } else {
          times += (if (ok) Some(dt) else None)
          probes += probeQ
          ioProbes += ioQ
          if (t == trials) residual(name) = (rb, rm, rd, rbc)
          System.err.println(f"[bench] $name trial $t: $dt%.3f s, gc ${gcIn}ms, ok=$ok, " +
            f"resid blocks=$rb mem=${rm / 1048576}MB disk=${rd / 1048576}MB bcast=$rbc, " +
            f"probe ${probeQ * 1000}%.0fms")
          t += 1
        }
      }
      probeTrials(name) = probes.toSeq
      ioProbeTrials(name) = ioProbes.toSeq
      if (retries.nonEmpty) retriedTrials(name) = retries.toSeq
      name -> times.toSeq
    }
    val probeAfter = cpuProbe()
    System.err.println(f"[bench] cpu probe after: single ${probeAfter._1}%.3f s, " +
      f"${cpus}x ${probeAfter._2}%.3f s")
    fastProbe = math.min(fastProbe, probeAfter._2 / 8.0)
    val medians = results.map { case (k, ts) =>
      val good = ts.flatten
      k -> (if (good.nonEmpty) BenchFormat.median(good) else -1.0)
    }
    // the probe-normalized twin: each trial scaled by fastProbe/trialProbe
    // (a trial in the slow machine state shrinks by the measured
    // machine-speed ratio), THEN the median — so a window spanning two of
    // three trials cannot drag the normalized median the way it drags the
    // raw one.
    val normMedians = results.map { case (k, ts) =>
      val pq = probeTrials(k)
      val normed = ts.zip(pq).flatMap { case (o, p) =>
        o.map(_ * (fastProbe / math.max(p, 1e-9)))
      }
      k -> (if (normed.nonEmpty) BenchFormat.median(normed) else -1.0)
    }
    // the IO-normalized twin for fsync-bound queries: same scaling, fsync
    // denominator — readers pick per query by which resource dominates it
    val ioNormMedians = results.map { case (k, ts) =>
      val pq = ioProbeTrials(k)
      val normed = ts.zip(pq).flatMap { case (o, p) =>
        o.map(_ * (fastIo / math.max(p, 1e-9)))
      }
      k -> (if (normed.nonEmpty) BenchFormat.median(normed) else -1.0)
    }
    val failed = results.collect { case (k, ts) if ts.exists(_.isEmpty) => k }
    val normTotal = normMedians.map(_._2).filter(_ >= 0).sum
    val json = BenchFormat.line(medians, trials, sfDir, failed,
      normTotal = Some(normTotal), fastProbe = Some(fastProbe))
    if (json.length > BenchFormat.MaxLineBytes)
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
    val detail = BenchFormat.detail(results, trials, sfDir, residual.toSeq,
      Seq(probeBefore._1, probeBefore._2, probeAfter._1, probeAfter._2),
      probeTrials.toSeq, normMedians, retriedTrials.toSeq,
      ioProbeTrials.toSeq, ioNormMedians)
    for (p <- Seq("bench_detail.json", "/tmp/bench_detail.json"))
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), detail + "\n")
      catch { case _: Throwable => () }
    ioDir.toFile.delete()
    spark.stop()
  }
}
