package graft.sources

import java.time.{Instant, LocalDate, ZoneOffset}
import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.{Normalize, ShopifyClient}

/** The Shopify REST API as a first-class Spark DataSource V2
  * (`spark.read.format("shopify")`), elevating the reference's ingest
  * loop (`shopify.py:112-163`) to the planner tier:
  *
  *   - **Server-side projection (P1)**: `SupportsPushDownRequiredColumns`
  *     maps the pruned top-level columns onto the REST `fields` parameter —
  *     exactly the reference's field lists, but derived from the query plan
  *     instead of hardcoded.
  *   - **Predicate pushdown (S4)**: `SupportsPushDownFilters` maps
  *     `created_at` range predicates onto `created_at_min`/`created_at_max`
  *     request parameters. Pushed filters stay residual (Spark re-applies
  *     them), so boundary semantics of the API can never produce wrong
  *     results — pushdown is a transfer-volume optimization.
  *   - **Aggregate pushdown**: `SupportsPushDownAggregates` maps a bare
  *     `COUNT(*)` onto the REST `<resource>/count.json` endpoint — the
  *     row-transfer-free count the API offers natively; grouped or
  *     non-count aggregates are declined and planned normally.
  *   - **Limit pushdown**: `SupportsPushDownLimit` (partial) — a pushed
  *     LIMIT caps the page size and stops the cursor loop, so
  *     `df.limit(5)` costs one 5-row request instead of paging the
  *     window; Spark still applies the global limit on top.
  *   - **TopN pushdown**: `SupportsPushDownTopN` (partial) — `ORDER BY
  *     created_at LIMIT n` adds the REST `order=created_at asc|desc`
  *     parameter so the API returns the window's first/last n directly;
  *     any other sort is declined.
  *   - **Parallel scan**: with a bounded `created_at` window the scan
  *     splits into `splits` disjoint time windows, one cursor-paged
  *     `InputPartition` each — the Spark-shaped answer to the API being
  *     serial per cursor chain. At 100 TB-scale ingest the windows map to
  *     the day-partitioned store layout (`TableStore.upsertPartitioned`).
  *
  * Per-order sub-resource fan-out (S2) intentionally stays in
  * `IngestPipeline`'s mapPartitions tier: its request set is driven by
  * the orders ROWS, which is a join, not a scan.
  */
object ShopifySource {

  val resourceSchemas: Map[String, StructType] = Map(
    "orders"    -> Normalize.orderPayload,
    "customers" -> Normalize.customerPayload,
    "products"  -> Normalize.productPayload,
  )

  /** Named-transport registry: the test seam. Executors resolve by name —
    * valid in local mode (one JVM); production omits `transport` and gets
    * [[ShopifyClient.UrlTransport]] built from apiKey/apiPass options on
    * each executor.
    */
  private val transports = TrieMap.empty[String, ShopifyClient.Transport]
  def registerTransport(name: String, t: ShopifyClient.Transport): Unit =
    transports(name) = t

  private[sources] def transportFor(opts: Map[String, String]): ShopifyClient.Transport =
    opts.get("transport") match {
      case Some(name) => transports.getOrElse(name,
        throw new IllegalArgumentException(s"unregistered transport '$name'"))
      case None => new ShopifyClient.UrlTransport(
        opts.getOrElse("apikey", ""), opts.getOrElse("apipass", ""))
    }

  /** Accept ISO instants or plain dates for window bounds. */
  private[sources] def parseInstant(s: String, endOfDay: Boolean): Instant =
    try Instant.parse(s)
    catch { case _: Exception =>
      val d = LocalDate.parse(s)
      (if (endOfDay) d.plusDays(1).atStartOfDay(ZoneOffset.UTC).minusNanos(1000000)
       else d.atStartOfDay(ZoneOffset.UTC)).toInstant
    }

  /** Options reach the scan through several java maps with inconsistent
    * case handling (inferSchema sees a CaseInsensitiveStringMap, getTable
    * gets raw properties) — normalize every key to lowercase once so a
    * mixed-case `.option("Resource", …)` can't validate the schema yet be
    * silently ignored by the reader.
    */
  private[sources] def normalizeOpts(m: java.util.Map[String, String]): Map[String, String] =
    m.asScala.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap

  /** Window planning shared by the row scan and the count scan: with a
    * bounded `created_at` window and `splits` > 1, split into disjoint
    * whole-second windows (see [[ShopifyScan.planInputPartitions]] notes).
    */
  private[sources] def planWindows(opts: Map[String, String],
                                   minBound: Option[String],
                                   maxBound: Option[String]): Array[InputPartition] = {
    val splits = opts.getOrElse("splits", "1").toInt
    val lo = minBound.map(parseInstant(_, endOfDay = false))
    val hi = maxBound.map(parseInstant(_, endOfDay = true))
    (lo, hi) match {
      case (Some(l), Some(h)) if splits > 1 =>
        val totalSec = math.max(h.getEpochSecond - l.getEpochSecond, 0L)
        val step = math.max(totalSec / splits, 1L)
        (0 until splits).map { i =>
          val wLo = l.plusSeconds(i * step)
          val wHi = if (i == splits - 1) h else l.plusSeconds((i + 1) * step - 1)
          ShopifyWindow(Some(wLo.toString), Some(wHi.toString)): InputPartition
        }.toArray
      case _ =>
        Array(ShopifyWindow(lo.map(_.toString), hi.map(_.toString)))
    }
  }
}

class ShopifySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shopify"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val resource = Option(options.get("resource")).getOrElse(
      throw new IllegalArgumentException("option 'resource' is required (orders|customers|products)"))
    ShopifySource.resourceSchemas.getOrElse(resource,
      throw new IllegalArgumentException(s"unknown resource '$resource'"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShopifyTable(schema, ShopifySource.normalizeOpts(properties))
}

final class ShopifyTable(tableSchema: StructType, properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"shopify.${properties.getOrElse("resource", "?")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShopifyScanBuilder(tableSchema,
      ShopifySource.normalizeOpts(options.asCaseSensitiveMap()))
}

final class ShopifyScanBuilder(fullSchema: StructType, opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var required: StructType = fullSchema
  private var minBound: Option[String] = opts.get("created_at_min")
  private var maxBound: Option[String] = opts.get("created_at_max")
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty pruning (count(*)) still needs one real field for a sane page
    required = if (requiredSchema.isEmpty)
      StructType(fullSchema.fields.filter(_.name == "id")) else requiredSchema

  private def render(v: Any): String = v match {
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: java.sql.Date      => d.toLocalDate.toString
    case other                 => other.toString
  }

  // INTERSECT with any option-configured bound (max of mins, min of maxes):
  // a query filter looser than the option must not widen the configured
  // window — options are never re-applied by Spark, only filters are
  private def tightenMin(v: String): Unit = minBound = Some(minBound match {
    case Some(cur) if ShopifySource.parseInstant(cur, endOfDay = false)
      .isAfter(ShopifySource.parseInstant(v, endOfDay = false)) => cur
    case _ => v
  })
  private def tightenMax(v: String): Unit = maxBound = Some(maxBound match {
    case Some(cur) if ShopifySource.parseInstant(cur, endOfDay = true)
      .isBefore(ShopifySource.parseInstant(v, endOfDay = true)) => cur
    case _ => v
  })

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case GreaterThanOrEqual("created_at", v) => tightenMin(render(v)); true
      case GreaterThan("created_at", v)        => tightenMin(render(v)); true
      case LessThanOrEqual("created_at", v)    => tightenMax(render(v)); true
      case LessThan("created_at", v)           => tightenMax(render(v)); true
      case _                                   => false
    }
    // everything stays residual: the API bounds are inclusive and coarse,
    // Spark's exact re-evaluation on top costs nothing and keeps pushdown
    // purely a transfer-volume optimization
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** COUNT(*) pushdown: a bare global `count(*)` maps onto the REST
    * `<resource>/count.json` endpoint — zero row transfer instead of
    * paging the full window. Partial pushdown (the default
    * `supportCompletePushDown = false`): each time-window partition
    * emits ONE count row and Spark sums them, so `splits` parallelism
    * carries over to counting. Grouped or non-count aggregates are
    * declined and planned normally.
    */
  private var countPushed = false
  override def pushAggregation(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countPushed = true
    ok
  }

  /** LIMIT pushdown (partial — Spark still applies the global limit):
    * each partition's cursor loop requests pages no larger than the limit
    * and stops emitting once it is reached, so `df.limit(5)` costs one
    * 5-row request instead of paging the window.
    */
  private var limit: Option[Int] = None
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  /** TopN pushdown (partial): `ORDER BY created_at [ASC|DESC] LIMIT n`
    * maps onto the REST `order=created_at asc|desc` parameter plus the
    * limit cap — the API returns the window's first/last n without
    * paging it. Only a single created_at sort is accepted (the API sorts
    * nothing else); Spark re-sorts and re-limits on top, so acceptance
    * is a transfer optimization, never a semantics change.
    */
  private var topNOrder: Option[String] = None
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    val ok = orders.length == 1 && (orders(0).expression() match {
      case ref: org.apache.spark.sql.connector.expressions.NamedReference =>
        ref.fieldNames().toSeq == Seq("created_at")
      case _ => false
    })
    if (ok) {
      val dir =
        if (orders(0).direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING) "asc"
        else "desc"
      topNOrder = Some(s"created_at $dir")
      limit = Some(l)
    }
    ok
  }

  override def build(): Scan =
    if (countPushed) new ShopifyCountScan(opts, minBound, maxBound)
    else new ShopifyScan(required, opts, minBound, maxBound, limit, topNOrder)
}

final case class ShopifyWindow(min: Option[String], max: Option[String])
    extends InputPartition

final class ShopifyScan(required: StructType, opts: Map[String, String],
                        minBound: Option[String], maxBound: Option[String],
                        limit: Option[Int] = None,
                        topNOrder: Option[String] = None)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Planner-visible statistics (`SupportsReportStatistics`): one
    * `count.json` request at plan time prices the scan, so join strategy
    * selection sees the REAL window cardinality instead of the
    * defaultSizeInBytes = Long.Max pessimism every stats-less DSv2 source
    * gets — a small ingest window then plans as the BROADCAST side of an
    * enrichment join instead of forcing a sort-merge shuffle
    * (ShopifySourceSpec pins the flip). Row width is a conservative
    * per-field estimate over the PRUNED schema, so projection pushdown
    * shrinks the reported size too. Cached per scan AND per window in the
    * companion (re-planning builds fresh Scan instances — without the
    * shared cache every re-plan re-fires the HTTP probe); failures report
    * empty stats — the planner then falls back to its defaults rather
    * than the query failing over a monitoring call — and are LOGGED, so
    * missing stats are diagnosable. The probe client gets NO retry budget
    * (retryLimit=1): this runs during query PLANNING, where an
    * unresponsive endpoint must cost one round-trip, not the transport's
    * full multi-minute backoff ladder. Opt out with `.option("stats",
    * "false")` for endpoints whose count.json is expensive.
    */
  @transient private lazy val reportedStats: Statistics = {
    val resource = opts.getOrElse("resource", "orders")
    val statsEnabled = opts.getOrElse("stats", "true").toBoolean
    val counted: Option[Long] =
      if (!statsEnabled) None
      else ShopifyScan.cachedCount((opts.getOrElse("baseurl", "") +
        opts.get("transport").map("#" + _).getOrElse(""), resource,
        minBound, maxBound), {
        try {
          val client = new ShopifyClient(
            ShopifySource.transportFor(opts), opts.getOrElse("baseurl", ""),
            maxRequestsPerSec = opts.getOrElse("maxrequestspersec", "0").toDouble,
            retryLimit = 1)
          Some(client.fetchCount(s"$resource/count.json",
            createdAtMin = minBound, createdAtMax = maxBound,
            filterOnStatus = resource == "orders"))
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] stats probe for $resource/count.json failed " +
                s"(planner falls back to defaults): ${e.getClass.getSimpleName}: " +
                s"${Option(e.getMessage).getOrElse("").take(200)}")
            None
        }
      })
    val rows = limit match {
      case Some(l) => counted.map(n => math.min(n, l.toLong))
      case None    => counted
    }
    val width = required.fields.map(_.dataType match {
      case org.apache.spark.sql.types.StringType => 40L
      case _: org.apache.spark.sql.types.StructType => 80L
      case _: org.apache.spark.sql.types.ArrayType => 120L
      case _ => 8L
    }).sum + 16L
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        rows.map(n => util.OptionalLong.of(n * width)).getOrElse(util.OptionalLong.empty())
      override def numRows(): util.OptionalLong =
        rows.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty())
    }
  }

  override def estimateStatistics(): Statistics = reportedStats
  override def description(): String = {
    val fields = required.fieldNames.mkString(",")
    s"ShopifyScan(resource=${opts.getOrElse("resource", "?")}, fields=[$fields], " +
      s"created_at_min=$minBound, created_at_max=$maxBound" +
      limit.map(l => s", PushedLimit=$l").getOrElse("") +
      topNOrder.map(o => s", PushedTopN=[$o]").getOrElse("") + ")"
  }

  // normalize BOTH paths through parseInstant so a date-only
  // created_at_max means end-of-day regardless of the splits setting.
  // Whole-second window boundaries: the API compares created_at at
  // second granularity, so a 1ms gap between adjacent inclusive
  // windows would let a boundary-second record satisfy both (residual
  // filters re-apply the ORIGINAL predicate — they cannot dedup).
  // wHi = next window start minus 1 SECOND keeps the truncated
  // seconds of adjacent windows disjoint.
  override def planInputPartitions(): Array[InputPartition] =
    ShopifySource.planWindows(opts, minBound, maxBound)

  override def createReaderFactory(): PartitionReaderFactory =
    new ShopifyReaderFactory(required, opts, limit, topNOrder)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShopifyMicroBatchStream(required, opts, minBound, maxBound)
}

object ShopifyScan {
  /** Successful stats-probe counts per (baseurl, resource, window), shared
    * across Scan instances so re-planning doesn't re-fire the HTTP probe.
    * Failures are NOT cached — the next plan retries (one cheap no-retry
    * round-trip) instead of pinning empty stats past endpoint recovery.
    * Entries expire after [[StatsTtlNanos]] (a long-lived session must not
    * pin a count from before the store grew past the broadcast threshold —
    * planner stats staleness becomes an executor-OOM risk, not just an
    * inefficiency), and the map is size-bounded (streaming sessions mint a
    * fresh window key per batch).
    */
  private val StatsTtlNanos = 10L * 60 * 1000 * 1000 * 1000 // 10 minutes
  private val StatsMaxEntries = 256
  private val statsCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, String, Option[String], Option[String]), (Long, Long)]

  private[sources] def cachedCount(
      key: (String, String, Option[String], Option[String]),
      probe: => Option[Long]): Option[Long] = {
    val now = System.nanoTime()
    statsCache.get(key).filter(now - _._2 < StatsTtlNanos).map(_._1).orElse {
      val r = probe
      r.foreach { n =>
        if (statsCache.size >= StatsMaxEntries)
          statsCache.clear() // rare, cheap: worst case is one re-probe per key
        statsCache.update(key, (n, now))
      }
      r
    }
  }
}

/** Stream offset: the `created_at` high-watermark (ISO instant). */
final case class ShopifyOffset(watermark: String) extends Offset {
  override def json(): String = s"""{"watermark":"$watermark"}"""
}

/** Micro-batch streaming over the REST API: each batch reads the
  * `created_at` window (prevWatermark, nowWatermark], so incremental
  * ingestion (§2.10's date-bounded refetch) becomes a Structured Streaming
  * source — offsets checkpoint/restart like any other stream, and the
  * downstream upsert sink absorbs the API's inclusive-bound boundary
  * duplicates idempotently.
  *
  * The batch end is wall-clock now minus `streamlagseconds` (late-arrival
  * slack, default 0); tests pin it with the `streamend` option for
  * determinism.
  */
final class ShopifyMicroBatchStream(required: StructType, opts: Map[String, String],
                                    minBound: Option[String], maxBound: Option[String])
    extends MicroBatchStream {

  // a configured created_at_max CAPS the stream: Spark never re-applies
  // reader options, so without this cap rows past the configured max would
  // leak into the stream (the batch path's tighten* logic defends the same
  // invariant)
  private val ceiling: Option[Instant] =
    maxBound.map(ShopifySource.parseInstant(_, endOfDay = true))

  private def nowWatermark: Instant = {
    val now = opts.get("streamend")
      .map(ShopifySource.parseInstant(_, endOfDay = false))
      .getOrElse {
        val lag = opts.getOrElse("streamlagseconds", "0").toLong
        Instant.now().minusSeconds(lag)
      }
    ceiling.filter(_.isBefore(now)).getOrElse(now)
  }

  // the floor sits 1ms BELOW the configured min so the first batch's
  // (floor, hi] window starts the API's inclusive min bound exactly AT the
  // configured instant — batch and stream agree on the floor record
  private def floor: Instant =
    minBound.map(ShopifySource.parseInstant(_, endOfDay = false).minusMillis(1))
      .getOrElse(Instant.EPOCH)

  override def initialOffset(): Offset = ShopifyOffset(floor.toString)

  override def latestOffset(): Offset = {
    // never move backwards (a pinned streamend below the initial offset);
    // compare as INSTANTS — ISO strings with different fractional-second
    // precision do not order lexicographically
    val now = nowWatermark
    ShopifyOffset((if (now.isAfter(floor)) now else floor).toString)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = "\"watermark\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(json)
    ShopifyOffset(m.map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"bad offset: $json")))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = Instant.parse(start.asInstanceOf[ShopifyOffset].watermark)
    val hi = Instant.parse(end.asInstanceOf[ShopifyOffset].watermark)
    if (!lo.isBefore(hi)) Array.empty
    else {
      // (lo, hi]: advance the inclusive API lower bound by 1ms past the
      // previous watermark; exact-boundary re-reads are upsert-idempotent
      Array(ShopifyWindow(Some(lo.plusMillis(1).toString), Some(hi.toString)))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ShopifyReaderFactory(required, opts)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** COUNT(*) scan: one `count.json` request per time-window partition,
  * one count row out. The partial-aggregate schema is a single non-null
  * BIGINT that Spark's final aggregation sums.
  */
final class ShopifyCountScan(opts: Map[String, String],
                             minBound: Option[String], maxBound: Option[String])
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType,
      nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"ShopifyCountScan(resource=${opts.getOrElse("resource", "?")}, " +
      s"PushedAggregation=[COUNT(*)], created_at_min=$minBound, created_at_max=$maxBound)"

  override def planInputPartitions(): Array[InputPartition] =
    ShopifySource.planWindows(opts, minBound, maxBound)

  override def createReaderFactory(): PartitionReaderFactory =
    new ShopifyCountReaderFactory(opts)
}

final class ShopifyCountReaderFactory(opts: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShopifyCountReader(opts, partition.asInstanceOf[ShopifyWindow])
}

/** Emits exactly one row: the window's `count.json` result. */
final class ShopifyCountReader(opts: Map[String, String], window: ShopifyWindow)
    extends PartitionReader[InternalRow] {

  private val resource = opts.getOrElse("resource", "orders")
  private var emitted = false
  private var current: InternalRow = _

  @transient private lazy val client = new ShopifyClient(
    ShopifySource.transportFor(opts),
    opts.getOrElse("baseurl", ""),
    maxRequestsPerSec = opts.getOrElse("maxrequestspersec", "0").toDouble)

  override def next(): Boolean = {
    if (emitted) return false
    val n = client.fetchCount(s"$resource/count.json",
      createdAtMin = window.min, createdAtMax = window.max,
      filterOnStatus = resource == "orders")
    current = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n))
    emitted = true
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

final class ShopifyReaderFactory(required: StructType, opts: Map[String, String],
                                 limit: Option[Int] = None,
                                 topNOrder: Option[String] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShopifyPartitionReader(required, opts, partition.asInstanceOf[ShopifyWindow],
      limit, topNOrder)
}

/** Cursor-paged reader for one time window: fetch page → parse with
  * JacksonParser into the PRUNED schema (unrequested fields are never even
  * deserialized) → emit rows → follow the Link cursor.
  */
final class ShopifyPartitionReader(required: StructType, opts: Map[String, String],
                                   window: ShopifyWindow,
                                   limit: Option[Int] = None,
                                   topNOrder: Option[String] = None)
    extends PartitionReader[InternalRow] {

  private val resource = opts.getOrElse("resource", "orders")
  private val endpoint = s"$resource.json"
  private val pageSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField(resource,
      org.apache.spark.sql.types.ArrayType(required))))
  private val parser = new JacksonParser(pageSchema,
    new JSONOptions(Map.empty[String, String], "UTC"),
    allowArrayAsStructs = true, Nil)

  @transient private lazy val client = new ShopifyClient(
    ShopifySource.transportFor(opts),
    opts.getOrElse("baseurl", ""),
    maxRequestsPerSec = opts.getOrElse("maxrequestspersec", "0").toDouble)

  private var cursor: Option[String] = None
  private var done = false
  private var emitted = 0
  private var iter: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  // pushed limit: request pages no larger than what is still needed, and
  // stop the cursor loop once the partition has emitted `limit` rows
  // (partial pushdown — Spark applies the global limit on top)
  private def pageSize: Int =
    math.min(limit.map(_ - emitted).getOrElse(250), 250)

  private def parsePage(body: String): Iterator[InternalRow] =
    parser.parse(body, CreateJacksonParser.string, UTF8String.fromString)
      .iterator.flatMap { page =>
        if (page.isNullAt(0)) Iterator.empty
        else {
          val arr = page.getArray(0)
          (0 until arr.numElements()).iterator.map { i =>
            arr.getStruct(i, required.length).copy(): InternalRow
          }
        }
      }

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    while (!iter.hasNext) {
      if (done) return false
      val (body, nxt) = client.fetchPage(
        endpoint,
        fields = required.fieldNames.toSeq,
        limit = pageSize,
        createdAtMin = window.min, createdAtMax = window.max,
        filterOnStatus = resource == "orders",
        order = topNOrder,
        pageInfo = cursor)
      iter = parsePage(body)
      cursor = nxt
      if (cursor.isEmpty) done = true
    }
    current = iter.next()
    emitted += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
