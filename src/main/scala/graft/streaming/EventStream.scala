package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.store.TableStore

/** Structured Streaming layer (SURVEY §2.10): the reference's incremental
  * model is date-bounded refetch + idempotent upsert; this module is the
  * capability superset — event-time windowed aggregation with watermarks,
  * stateful sessionization, and a streaming upsert sink via foreachBatch,
  * exercised against the driver's `events` table shape.
  *
  * Scale posture: watermark bounds state; windowed aggs shuffle on
  * (window, key); `Trigger.AvailableNow` gives batch-incremental replays
  * identical to the reference's refetch semantics.
  */
object EventStream {

  /** Event row (events.parquet shape, ts normalized to micros). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class SessionSummary(user_id: Long, n_events: Int, first_ts: Long,
                            last_ts: Long, total_value: Double)

  /** Input row for [[runningUserAggs]]: `value_dec` is the event value
    * pre-cast to decimal(38,6) BY SPARK at fixture-staging time, so the
    * double→decimal cast semantics stay Spark's (oracle parity with
    * `CAST(value AS DECIMAL(38,6))`) and the in-state sum is exact.
    */
  case class UserEventDec(event_id: Long, user_id: Long,
                          value_dec: java.math.BigDecimal)

  case class UserAgg(user_id: Long, n_events: Long,
                     total_value: java.math.BigDecimal)

  /** Per-user running aggregates via mapGroupsWithState — the
    * update-mode stateful-aggregation API (the one state API the q71/q84
    * harnesses don't touch). State per user is O(1): (count, exact
    * decimal sum). BigDecimal addition is associative and exact, so the
    * emitted aggregates are identical for every micro-batch partitioning
    * of the input — which is what lets a multi-batch replay be graded
    * against a plain batch GROUP BY. Emits the updated running aggregate
    * for every user seen in the batch; an upsert sink keyed on user_id
    * then converges the table to the final aggregates.
    */
  def runningUserAggs(events: Dataset[UserEventDec]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEventDec], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(
            UserAgg(uid, 0L, java.math.BigDecimal.ZERO))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot = tot.add(r.value_dec) }
          val next = UserAgg(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Event-time windowed counts with a watermark: tumbling by default,
    * sliding when `slide` differs from `windowLength` (each event lands in
    * windowLength/slide windows). The tumbling form is the streaming twin
    * of the q37 batch bucket aggregation.
    */
  def windowedCounts(events: DataFrame, windowLength: String = "5 minutes",
                     watermark: String = "10 minutes",
                     slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide.getOrElse(windowLength)),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,6)")), 2).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Built-in gap-based session windows (event-time): the declarative twin
    * of [[sessionize]]'s explicit state machine.
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")), 2).cast("double").as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("total_value"))

  /** Stateful sessionization via flatMapGroupsWithState: a session closes
    * after `gapMs` of user inactivity (event-time, driven by processing
    * order within AvailableNow batches). Emits one summary per closed
    * session.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[Event]]) =>
          val sortedNew = rows.toList.sortBy(_.ts.getTime)
          val all = (state.getOption.getOrElse(Nil) ++ sortedNew).sortBy(_.ts.getTime)
          // split into sessions on gaps
          val sessions = all.foldLeft(List.empty[List[Event]]) {
            case (Nil, e) => List(List(e))
            case (cur :: done, e) if e.ts.getTime - cur.head.ts.getTime <= gapMs =>
              (e :: cur) :: done
            case (acc, e) => List(e) :: acc
          }
          sessions match {
            case Nil => Iterator.empty
            case open :: closed =>
              state.update(open.reverse)
              closed.reverse.map { s =>
                val es = s.reverse
                SessionSummary(userId, es.length, es.head.ts.getTime,
                  es.last.ts.getTime, es.map(_.value).sum)
              }.iterator
          }
      }
  }

  /** Streaming exact dedup — the streaming twin of `Dedup.exact`: drop
    * re-deliveries of the same key. `withinWatermark = true` bounds the
    * dedup state to the watermark horizon (the 100 TB posture — state for
    * a key is dropped once the watermark passes it, so only duplicates
    * arriving within the lateness budget are caught, which is exactly the
    * at-least-once-redelivery case); `false` keeps exact dedup with
    * unbounded state (documented: only for bounded replays).
    */
  def dedupStream(events: DataFrame, keys: Seq[String], watermark: String = "1 hour",
                  withinWatermark: Boolean = true): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    if (withinWatermark) wm.dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else wm.dropDuplicates(keys)
  }

  /** Stream-stream event-time interval join: left rows match right rows
    * with the same `keys` whose timestamp falls in
    * [left.ts, left.ts + windowMs). Both sides carry watermarks — Spark
    * derives the join-state retention from the watermark delay plus the
    * interval bound, so state for a key is dropped once no future match
    * is possible. `watermarkDelay` is the lateness budget: at scale it
    * bounds state to (delay + window) of per-key traffic; a replay that
    * must exactly equal the batch join (the q84 correctness harness)
    * passes a delay covering the full replayed span, trading state for
    * exactness. Inner join ⇒ append semantics: every result row is final
    * when emitted, no retractions.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   windowMs: Long, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).as("l")
    val r = right.withWatermark("ts", watermarkDelay).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col("r.ts") >= col("l.ts") &&
      col("r.ts") < col("l.ts") + expr(s"INTERVAL ${windowMs / 1000} SECOND")
    l.join(r, keyCond && timeCond, "inner")
  }

  /** LEFT OUTER stream-stream interval join — the state-expiry semantics
    * the inner join cannot show: an unmatched left row emits with null
    * right columns only when the watermark passes `left.ts + window`, so
    * the OUTER rows in the output are direct evidence of correct state
    * eviction. Unlike [[intervalJoin]], the CALLER applies watermarks —
    * and must feed flush/sentinel rows THROUGH the event-type filters
    * into the join inputs (excluding them from the result downstream):
    * Catalyst pushes non-event-time predicates below the watermark node,
    * so a filtered-out sentinel advances nothing, rows near stream end
    * stay buffered forever, and AvailableNow termination silently
    * swallows their outer results (the q145 harness documents the full
    * ritual: single shared source, three sentinels).
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, keys: Seq[String],
                        windowMs: Long): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col("r.ts") >= col("l.ts") &&
      col("r.ts") < col("l.ts") + expr(s"INTERVAL ${windowMs / 1000} SECOND")
    l.join(r, keyCond && timeCond, "leftOuter")
  }

  /** FULL OUTER stream-stream interval join — both directions of state
    * expiry at once: an unmatched LEFT row emits (l, null) when the
    * watermark passes `l.ts + window`, and an unmatched RIGHT row emits
    * (null, r) when it passes `r.ts` (the engine derives each side's
    * state watermark from the range condition). This is the reconciliation
    * shape — two feeds that should pair 1:1 within a time bound, where
    * BOTH a feed-A orphan and a feed-B orphan are findings. Same caller
    * contract as [[intervalJoinOuter]]: watermarks applied upstream of any
    * event-type filter, sentinels fed through both inputs.
    */
  def intervalJoinFull(left: DataFrame, right: DataFrame, keys: Seq[String],
                       windowMs: Long): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col("r.ts") >= col("l.ts") &&
      col("r.ts") < col("l.ts") + expr(s"INTERVAL ${windowMs / 1000} SECOND")
    l.join(r, keyCond && timeCond, "fullOuter")
  }

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * the STATIC dimension frame — the lookup-table pattern of an ingest
    * pipeline (user profile, product catalog, geo table). Stateless for
    * the stream (no watermark, no join state): Spark re-plans the static
    * side per micro-batch, broadcasting it when it fits the threshold —
    * at 100 TB/day of stream the dim join costs a broadcast per trigger,
    * never a stream-side shuffle. Left join keeps unmatched stream rows
    * (nulls in dim columns) so enrichment never drops events.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(dim, keys, "left")

  /** Streaming upsert sink: every micro-batch merges into the parquet
    * table with the same partial-update semantics as the batch path — the
    * reference's idempotent-upsert incrementality, as a stream.
    */
  def upsertSink(stream: DataFrame, targetPath: String, keys: Seq[String],
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try {
          if (!TableStore.exists(spark, targetPath))
            TableStore.atomicWrite(spark, materialized, targetPath)
          else
            TableStore.upsert(spark, targetPath, materialized, keys)
        } finally materialized.unpersist()
      }
      .start()

  /** Streaming CDC-apply sink — the replication loop closed end-to-end:
    * a changelog FEED (op column: 'D' deletes by key, anything else
    * upserts) maintains a replica table through the real micro-batch path,
    * each batch landing via [[TableStore.applyCdc]]'s single
    * read → anti-join → merge plan and ONE atomic swap. foreachBatch is
    * at-least-once; a replayed batch re-applies cleanly because applyCdc
    * is idempotent per batch (delete-again no-ops, merge-again converges) —
    * the same idempotent re-ingest contract as the reference's date-bounded
    * refetch (`/root/reference/db.py:115-144`). A missing replica
    * bootstraps from the feed's first non-delete rows.
    */
  def cdcSink(feed: DataFrame, targetPath: String, keys: Seq[String],
              checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try TableStore.applyCdc(spark, targetPath, materialized, keys)
        finally materialized.unpersist()
      }
      .start()

  /** EXACTLY-ONCE [[cdcSink]]: `foreachBatch` replays a batch when a
    * crash lands between the apply and the checkpoint commit — safe only
    * for idempotent feeds. This sink routes through
    * [[TableStore.applyCdcExactlyOnce]], whose batch ledger (recorded
    * inside the same atomic swap as the data) skips already-applied batch
    * ids — so even a NON-idempotent future feed cannot double-apply.
    * ExactlyOnceCdcSpec replays the same batch id with altered content
    * and proves single application; q227 grades the end-to-end loop.
    */
  def cdcSinkExactlyOnce(feed: DataFrame, targetPath: String, keys: Seq[String],
                         checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try TableStore.applyCdcExactlyOnce(
          spark, targetPath, materialized, keys, batchId)
        finally materialized.unpersist()
        ()
      }
      .start()

  /** EXACTLY-ONCE CDC into a MERGE-ON-READ replica: per micro-batch, no
    * replica data file is rewritten — old rows of the batch's keys are
    * deletion-vector-masked and upserts append as new part files
    * ([[graft.operators.DeletionVectors.morApplyCdc]]); the batch ledger
    * lives INSIDE the vector sidecar so mask + ledger commit in one
    * atomic swap. Per-batch write amplification drops from
    * O(replica-file-footprint) (the q227 COW apply) to O(batch): the
    * shape a high-frequency 100 TB replication stream needs, with
    * [[graft.operators.DeletionVectors.compact]] as the periodic debt
    * collector. Reads go through `dvRead`.
    */
  def cdcSinkMorExactlyOnce(feed: DataFrame, targetPath: String, keyCol: String,
                            checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try graft.operators.DeletionVectors.morApplyCdc(
          spark, targetPath, materialized, keyCol, batchId)
        finally materialized.unpersist()
        ()
      }
      .start()

  /** [[cdcSinkExactlyOnce]] against a PARTITIONED replica: the batch
    * ledger rides the partition-stage protocol (marker moves to the table
    * root under the same roll-forward that commits the partition dirs).
    */
  def cdcSinkPartitionedExactlyOnce(feed: DataFrame, targetPath: String,
                                    keys: Seq[String], partitionCol: String,
                                    checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try TableStore.applyCdcPartitionedExactlyOnce(
          spark, targetPath, materialized, keys, partitionCol, batchId)
        finally materialized.unpersist()
        ()
      }
      .start()

  /** [[cdcSinkPartitionedExactlyOnce]] against a MULTI-LEVEL layout —
    * the (source, day) lakehouse replica: each micro-batch touches only
    * the LEAF dirs its deletes live in and its upserts land in, at any
    * partition depth, under the same root-marker ledger.
    */
  def cdcSinkPartitionedExactlyOnce(feed: DataFrame, targetPath: String,
                                    keys: Seq[String], partitionCols: Seq[String],
                                    checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try TableStore.applyCdcPartitionedExactlyOnce(
          spark, targetPath, materialized, keys, partitionCols, batchId,
          opCol = "op", checkUnique = true)
        finally materialized.unpersist()
        ()
      }
      .start()

  /** [[cdcSink]] against a PARTITIONED replica — the 100 TB steady state:
    * a continuously-running replication stream must touch only the
    * partitions each micro-batch's deletes live in and upserts land in
    * ([[TableStore.applyCdcPartitioned]]), never rewrite the table. Same
    * at-least-once idempotence argument as [[cdcSink]]; upsert rows must
    * carry the (immutable) partition column, deletes need keys only.
    */
  def cdcSinkPartitioned(feed: DataFrame, targetPath: String, keys: Seq[String],
                         partitionCol: String,
                         checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val materialized = batch.persist()
        try TableStore.applyCdcPartitioned(
          spark, targetPath, materialized, keys, partitionCol)
        finally materialized.unpersist()
      }
      .start()

  /** Input row for [[UserStatsProcessor]] — [[UserEventDec]] plus the
    * event type, so the processor exercises MapState (per-type counts)
    * alongside ValueState.
    */
  case class UserEventTyped(event_id: Long, user_id: Long, event_type: String,
                            value_dec: java.math.BigDecimal)

  case class UserTwsAgg(user_id: Long, n_events: Long,
                        total_value: java.math.BigDecimal,
                        n_types: Long, n_purchases: Long, max_event_id: Long)

  /** Per-user running stats on the `transformWithState` API (Spark 4's
    * arbitrary-stateful-processing v2, the mapGroupsWithState successor):
    * three typed ValueStates (count, exact decimal sum, max id) plus a
    * MapState keyed by event type — the composite-state shape the old API
    * forces into one monolithic case class. State lives in RocksDB
    * (transformWithState requires it); every piece is O(1) or
    * O(|event types|) per user. All updates are associative and exact
    * (BigDecimal sum, max, counter merges), so the emitted aggregates are
    * micro-batch-partitioning-invariant — which is what lets q195's
    * multi-batch replay be graded against a plain batch GROUP BY.
    */
  class UserStatsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, UserEventTyped, UserTwsAgg] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState, MapState}
    import org.apache.spark.sql.Encoders

    @transient private var nEvents: ValueState[Long] = _
    @transient private var total: ValueState[java.math.BigDecimal] = _
    @transient private var maxId: ValueState[Long] = _
    @transient private var typeCounts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val h = getHandle
      nEvents = h.getValueState("n_events", Encoders.scalaLong, TTLConfig.NONE)
      total = h.getValueState("total_value", Encoders.DECIMAL, TTLConfig.NONE)
      maxId = h.getValueState("max_event_id", Encoders.scalaLong, TTLConfig.NONE)
      typeCounts = h.getMapState("type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long, rows: Iterator[UserEventTyped],
                                 timers: TimerValues): Iterator[UserTwsAgg] = {
      var n = if (nEvents.exists()) nEvents.get() else 0L
      var tot = if (total.exists()) total.get() else java.math.BigDecimal.ZERO
      var mx = if (maxId.exists()) maxId.get() else Long.MinValue
      rows.foreach { r =>
        n += 1
        tot = tot.add(r.value_dec)
        if (r.event_id > mx) mx = r.event_id
        val prev = if (typeCounts.containsKey(r.event_type))
          typeCounts.getValue(r.event_type) else 0L
        typeCounts.updateValue(r.event_type, prev + 1)
      }
      nEvents.update(n); total.update(tot); maxId.update(mx)
      var nTypes = 0L
      var nPurch = 0L
      typeCounts.iterator().foreach { case (t, c) =>
        nTypes += 1
        if (t == "purchase") nPurch = c
      }
      Iterator.single(UserTwsAgg(uid, n, tot, nTypes, nPurch, mx))
    }
  }

  /** Wire [[UserStatsProcessor]] over a typed stream. */
  def userStatsTws(events: Dataset[UserEventTyped]): Dataset[UserTwsAgg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
  }

  case class TimerSession(user_id: Long, n_events: Long, first_ms: Long, last_ms: Long)

  /** Gap-sessionization driven by EVENT-TIME TIMERS on the
    * transformWithState API — the timer surface q195 doesn't touch.
    * Sessions that a later event proves closed (gap exceeded inside the
    * buffer) emit eagerly from [[handleInputRows]]; the FINAL session of
    * each key emits from [[handleExpiredTimer]] when the watermark passes
    * lastTs + gap — no per-user flush row needed, one global sentinel
    * advances the watermark for every key at once (the state-eviction
    * contract q145 proves for stream-stream joins, here for typed timer
    * state). Input events re-register a fresh timer and delete the stale
    * one, so a continuing session never closes early.
    */
  class SessionTimerProcessor(gapMs: Long) extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, TimerSession] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ExpiredTimerInfo, ListState, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var buf: ListState[Event] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState("open_session", Encoders.product[Event], TTLConfig.NONE)
      timerAt = getHandle.getValueState("timer_at", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def split(all: List[Event]): List[List[Event]] =
      all.foldLeft(List.empty[List[Event]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) if e.ts.getTime - cur.head.ts.getTime <= gapMs =>
          (e :: cur) :: done
        case (acc, e) => List(e) :: acc
      }.map(_.reverse).reverse

    private def summarize(uid: Long, s: List[Event]): TimerSession =
      TimerSession(uid, s.length.toLong, s.head.ts.getTime, s.last.ts.getTime)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[TimerSession] = {
      val existing = if (buf.exists()) buf.get().toList else Nil
      val all = (existing ++ rows).sortBy(e => (e.ts.getTime, e.event_id))
      if (all.isEmpty) Iterator.empty
      else {
        val ss = split(all)
        val open = ss.last
        buf.clear()
        buf.put(open.toArray)
        if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
        val t = open.last.ts.getTime + gapMs
        getHandle.registerTimer(t)
        timerAt.update(t)
        ss.init.map(summarize(uid, _)).iterator
      }
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[TimerSession] = {
      // watermark ≥ lastTs + gap: nothing can extend any buffered session
      val all = if (buf.exists()) buf.get().toList.sortBy(e => (e.ts.getTime, e.event_id)) else Nil
      buf.clear()
      timerAt.clear()
      split(all).map(summarize(uid, _)).iterator
    }
  }

  /** Wire [[SessionTimerProcessor]]: event-time mode requires the
    * watermark; 0 s delay because the replay fixtures are ts-ordered.
    */
  def sessionizeWithTimers(events: Dataset[Event], gapMs: Long): Dataset[TimerSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", "0 seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
