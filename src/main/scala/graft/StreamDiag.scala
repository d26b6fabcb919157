package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Optimization-round measurement tool (guide §1): attach a
  * StreamingQueryListener and run the named streaming queries once, printing
  * each micro-batch's durationMs breakdown (addBatch / walCommit /
  * queryPlanning / commitOffsets ...) and state-operator commit times, so
  * the replay harnesses' wall time is attributed to real phases instead of
  * guessed at.
  *
  * Usage: runMain graft.StreamDiag <sfDir> q145,q208,...
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args(1).split(",").toSeq
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
    // Per-job wall time + call site: attributes addBatch time to the
    // individual Spark jobs a foreachBatch body runs (guide §1 measure
    // first) — the gap between the sum of jobs and the batch's
    // triggerExecution is driver-side work (planning, file moves).
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val start = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = Option(e.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")
        start.put(e.jobId, (System.nanoTime(), cs))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(start.remove(e.jobId)).foreach { case (t0, cs) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20) System.err.println(f"[diagjob] job=${e.jobId} $ms%.0f ms  $cs")
        }
      }
    })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2.longValue)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        val st = p.stateOperators.map { s =>
          s"${s.operatorName}: commit=${s.commitTimeMs}ms rows=${s.numRowsTotal} " +
            s"updated=${s.numRowsUpdated} shufflePart=${s.numShufflePartitions} " +
            s"storeFiles=${s.customMetrics}"
        }.mkString(" | ")
        System.err.println(s"[diag] batch=${p.batchId} rows=${p.numInputRows} $dur")
        if (st.nonEmpty) System.err.println(s"[diag]   state: $st")
      }
    })
    SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[diag] $name failed: ${e.getMessage}") }
        System.err.println(f"[diag] $name total ${(System.nanoTime()-t0)/1e9}%.2f s")
        Thread.sleep(500) // let the last progress events flush
      }
    spark.stop()
  }
}
