package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSuite}
import graft.queries.Tables
import graft.store.TableStore

class EventStreamSpec extends SparkSuite {
  import spark.implicits._

  /** Stage the events table as a streaming source directory (one parquet
    * file per "arrival"), ts normalized to TimestampType.
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("events-stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventsStream = {
    val schema = Tables.events(spark, sf).schema
    spark.readStream.schema(schema).parquet(streamDir)
  }

  test("windowed counts over the stream match the batch bucket aggregation") {
    val q = EventStream.windowedCounts(eventsStream)
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_out")
      .select($"window_start", $"event_type", $"n")
      .orderBy($"window_start", $"event_type").collect()
    val batch = graft.queries.EventOps.timeBuckets(spark, sf)
      .select($"window_start", $"event_type", $"n").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sliding windows multiply coverage windowLength/slide times") {
    val q = EventStream.windowedCounts(eventsStream, "10 minutes", "20 minutes",
        slide = Some("5 minutes"))
      .writeStream.format("memory").queryName("slide_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val slid = spark.table("slide_out")
    val total = slid.agg(sum($"n")).head().getLong(0)
    val nEvents = Tables.events(spark, sf).count()
    assert(total == 2 * nEvents, "every event falls in exactly 2 sliding windows")
  }

  test("built-in session windows agree with the lag-based session counts (q39)") {
    val q = EventStream.sessionWindowCounts(eventsStream, "30 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_out")
      .groupBy($"user_id").agg(count($"session_start").as("n_sessions"))
      .orderBy($"user_id").as[(Long, Long)].collect().toSeq
    val batch = graft.queries.EventOps.sessionCounts(spark, sf)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("sessionize emits closed sessions with correct bounds") {
    val events = Seq(
      EventStream.Event(1, ts(0), 1, "click", 1.0, "{}"),
      EventStream.Event(2, ts(60), 1, "click", 2.0, "{}"),
      EventStream.Event(3, ts(5000), 1, "view", 3.0, "{}"),  // > gap → new session
      EventStream.Event(4, ts(30), 2, "click", 4.0, "{}"),
    ).toDS()
    val out = EventStream.sessionize(events, gapMs = 1800 * 1000).collect()
    // one closed session for user 1 (events 1+2); user 2's and user 1's
    // second session remain open in state
    assert(out.length == 1)
    val s = out.head
    assert(s.user_id == 1 && s.n_events == 2 && s.total_value == 3.0)
  }

  test("streaming upsert sink is idempotent across replays") {
    val target = Files.createTempDirectory("stream-target").toString + "/events_tbl"
    val cp1 = Files.createTempDirectory("cp1").toString
    val q1 = EventStream.upsertSink(eventsStream, target, Seq("event_id"), cp1)
    q1.awaitTermination()
    val n1 = TableStore.read(spark, target).count()
    // replay from a fresh checkpoint: same data upserted again → unchanged
    val cp2 = Files.createTempDirectory("cp2").toString
    val q2 = EventStream.upsertSink(eventsStream, target, Seq("event_id"), cp2)
    q2.awaitTermination()
    val n2 = TableStore.read(spark, target).count()
    assert(n1 == n2)
    assert(n1 == Tables.events(spark, sf).count())
  }

  test("streaming upsert replay equals the batch upsert row-for-row") {
    val events = Tables.events(spark, sf)
    // streaming: sink the stream, then replay it from a fresh checkpoint
    val streamTarget = Files.createTempDirectory("stream-eq").toString + "/t"
    for (_ <- 1 to 2) {
      val cp = Files.createTempDirectory("cp-eq").toString
      EventStream.upsertSink(eventsStream, streamTarget, Seq("event_id"), cp)
        .awaitTermination()
    }
    // batch: the reference-style idempotent upsert of the same rows, twice
    val batchTarget = Files.createTempDirectory("batch-eq").toString + "/t"
    TableStore.upsert(spark, batchTarget, events, Seq("event_id"))
    TableStore.upsert(spark, batchTarget, events, Seq("event_id"))
    val cols = events.columns.map(col).toSeq
    val a = TableStore.read(spark, streamTarget).select(cols: _*)
      .orderBy($"event_id").collect().toSeq
    val b = TableStore.read(spark, batchTarget).select(cols: _*)
      .orderBy($"event_id").collect().toSeq
    assert(a == b, "streamed replay state must equal the batch upsert state")
  }

  test("streaming CDC sink: replay equals batch applyCdc; re-apply is idempotent") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val m5 = pmod($"event_id", lit(5))
    // one op per key across the feed: D(%5==1), U(%5==0, value+1), I(clones)
    val feed = ev.filter(m5 === 1)
      .select(lit("D").as("op"), $"event_id", $"user_id", $"event_type", $"value")
      .unionByName(ev.filter(m5 === 0)
        .select(lit("U").as("op"), $"event_id", $"user_id", $"event_type",
          ($"value" + 1.0).as("value")))
      .unionByName(ev.filter(m5 === 4)
        .select(lit("I").as("op"), ($"event_id" + 900000L).as("event_id"),
          $"user_id", $"event_type", $"value"))
    val feedDir = Files.createTempDirectory("cdc-feed").toString
    feed.repartitionByRange(3, $"event_id").write.mode("overwrite").parquet(feedDir)
    def feedStream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    // streaming replica: several micro-batches, then a FULL re-apply from a
    // fresh checkpoint (the at-least-once worst case)
    val streamTarget = Files.createTempDirectory("cdc-stream").toString + "/t"
    TableStore.atomicWrite(spark, ev, streamTarget)
    for (_ <- 1 to 2) {
      val cp = Files.createTempDirectory("cdc-cp").toString
      EventStream.cdcSink(feedStream, streamTarget, Seq("event_id"), cp)
        .awaitTermination()
    }
    // batch reference: one applyCdc of the whole feed
    val batchTarget = Files.createTempDirectory("cdc-batch").toString + "/t"
    TableStore.atomicWrite(spark, ev, batchTarget)
    TableStore.applyCdc(spark, batchTarget, feed, Seq("event_id"))
    val a = TableStore.read(spark, streamTarget).orderBy($"event_id").collect().toSeq
    val b = TableStore.read(spark, batchTarget).orderBy($"event_id").collect().toSeq
    assert(a == b, "streamed CDC replica must equal the batch applyCdc state")
  }

  test("streaming dedup drops re-delivered events (both state modes)") {
    // stage the events TWICE (two files) — a full at-least-once redelivery
    val dir = Files.createTempDirectory("events-dup").toString
    val ev = Tables.events(spark, sf)
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val schema = ev.schema
    def run(within: Boolean, name: String): Long = {
      val q = EventStream.dedupStream(
          spark.readStream.schema(schema).parquet(dir), Seq("event_id"),
          withinWatermark = within)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).count()
    }
    val exact = ev.count()
    assert(run(within = false, "dedup_exact_out") == exact)
    // duplicates land in the same batch window, well within the watermark
    assert(run(within = true, "dedup_wm_out") == exact)
  }

  test("q71 streamUpsert is rerun-deterministic and does not accumulate disk") {
    // r7 staged the fixtures once per JVM and reuses one run dir per
    // invocation: repeated runs must give byte-identical results (fresh
    // checkpoint + re-seeded target each time) with bounded temp usage
    def roots() = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles((_, n) => n.startsWith("graft_stream_upsert")).length
    val a = graft.queries.EventOps.streamUpsert(spark, sf).collect()
    val tmpRoots = roots()
    val b = graft.queries.EventOps.streamUpsert(spark, sf).collect()
    val tmpRootsAfter = roots()
    assert(a.toSeq == b.toSeq, "stream replay must be deterministic across reruns")
    assert(tmpRootsAfter == tmpRoots,
      "reruns must reuse the per-JVM temp root, not allocate new ones")
  }

  test("runningUserAggs carries exact state across micro-batches") {
    // two single-file micro-batches for the same user: the second batch's
    // emitted aggregate must include the first batch's state, and the
    // decimal sum must be exact (0.1 + 0.2 == 0.3 in decimal, not binary)
    val dir = Files.createTempDirectory("state-agg").toString
    def dec(s: String) = new java.math.BigDecimal(s).setScale(6)
    Seq(EventStream.UserEventDec(1L, 7L, dec("0.1"))).toDS()
      .coalesce(1).write.mode("append").parquet(dir)
    Seq(EventStream.UserEventDec(2L, 7L, dec("0.2")),
        EventStream.UserEventDec(3L, 8L, dec("5"))).toDS()
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.runningUserAggs(stream.as[EventStream.UserEventDec])
      .toDF().writeStream.format("memory").queryName("state_agg_out")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last update per user is the converged aggregate
    val fin = spark.table("state_agg_out")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"total_value").as("tot"))
      .orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSeq
    assert(fin == Seq((7L, 2L, "0.3"), (8L, 1L, "5")))
  }

  test("transformWithState composite state carries across micro-batches") {
    // same cross-batch contract as runningUserAggs, on the v2 API: the
    // second batch's emission must reflect ValueState AND MapState from
    // the first, and the decimal sum must be exact
    val dir = Files.createTempDirectory("tws-agg").toString
    def dec(s: String) = new java.math.BigDecimal(s).setScale(6)
    Seq(EventStream.UserEventTyped(1L, 7L, "view", dec("0.1"))).toDS()
      .coalesce(1).write.mode("append").parquet(dir)
    Seq(EventStream.UserEventTyped(2L, 7L, "purchase", dec("0.2")),
        EventStream.UserEventTyped(3L, 7L, "purchase", dec("0.4")),
        EventStream.UserEventTyped(4L, 8L, "error", dec("5"))).toDS()
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventStream.userStatsTws(stream.as[EventStream.UserEventTyped])
        .toDF().writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
      val fin = spark.table("tws_out")
        .groupBy($"user_id")
        .agg(max($"n_events").as("n"), max($"total_value").as("tot"),
          max($"n_types").as("nt"), max($"n_purchases").as("np"),
          max($"max_event_id").as("mx"))
        .orderBy($"user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).stripTrailingZeros.toPlainString,
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(fin == Seq((7L, 3L, "0.7", 2L, 2L, 3L), (8L, 1L, "5", 1L, 0L, 4L)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("q88/q90 stream queries are rerun-deterministic") {
    val a1 = graft.queries.EventOps.streamStateAgg(spark, sf).collect()
    val a2 = graft.queries.EventOps.streamStateAgg(spark, sf).collect()
    assert(a1.toSeq == a2.toSeq)
    val d1 = graft.queries.EventOps.streamDedup(spark, sf).collect()
    val d2 = graft.queries.EventOps.streamDedup(spark, sf).collect()
    assert(d1.toSeq == d2.toSeq)
    assert(d1.length == Tables.events(spark, sf).count(),
      "dedup must recover exactly the original event set")
  }

  test("upsert sink resumes from its checkpoint across runs — no loss, no double-count") {
    // restart-recovery: drain half the source, stop, add the other half,
    // restart from the SAME checkpoint. The offset log must make the
    // second run process only the remainder (a from-scratch rescan would
    // re-merge old keys — caught because the upsert would then see the
    // already-present rows and the interim count below would not double)
    // and the final table must equal the full dataset exactly.
    val ev = Tables.events(spark, sf)
    val staged = Files.createTempDirectory("resume-staged").toString
    ev.repartitionByRange(4, $"event_id").write.mode("overwrite").parquet(staged)
    val parts = new java.io.File(staged).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 4)
    val srcDir = Files.createTempDirectory("resume-src")
    def addFile(f: java.io.File): Unit =
      Files.copy(f.toPath, srcDir.resolve(f.getName))
    parts.take(2).foreach(addFile)
    val target = Files.createTempDirectory("resume-tgt").toString + "/t"
    val cp = Files.createTempDirectory("resume-cp").toString
    val schema = ev.schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    EventStream.upsertSink(src, target, Seq("event_id"), cp).awaitTermination()
    val partial = TableStore.read(spark, target).count()
    assert(partial > 0 && partial < ev.count(),
      "first run must land mid-dataset for this test to bite")
    parts.drop(2).foreach(addFile)
    EventStream.upsertSink(src, target, Seq("event_id"), cp).awaitTermination()
    val cols = ev.columns.map(col).toSeq
    val got = TableStore.read(spark, target).select(cols: _*)
      .orderBy($"event_id").collect().toSeq
    val want = ev.select(cols: _*).orderBy($"event_id").collect().toSeq
    assert(got == want, "resumed replay must reconstruct the table exactly")
  }

  test("q84 stream-stream interval join replay equals the batch join") {
    val got = graft.queries.EventOps.streamIntervalJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ev = Tables.events(spark, sf)
    val batch = ev.as("v").join(ev.as("p"),
        col("v.event_type") === "view" && col("p.event_type") === "purchase" &&
          col("p.user_id") === col("v.user_id") &&
          col("p.ts") >= col("v.ts") &&
          col("p.ts") < col("v.ts") + expr("INTERVAL 30 MINUTE"))
      .select(col("v.event_id"), col("p.event_id"))
      .orderBy(col("v.event_id"), col("p.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == batch, "micro-batch replay must reproduce the batch interval join")
    assert(got.nonEmpty)
  }

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
}
