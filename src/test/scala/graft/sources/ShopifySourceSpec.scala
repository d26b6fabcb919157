package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import graft.{Fixtures, SparkSuite}
import graft.ingest.ShopifyClient
import org.apache.spark.sql.functions._

/** DSv2 source: schema, pagination, server-side projection (fields param),
  * created_at pushdown (created_at_min/max params), and disjoint
  * window-split parallel scans.
  */
class ShopifySourceSpec extends SparkSuite {
  import spark.implicits._

  /** Wraps the fixture transport, recording every (url, params) request
    * AND honoring created_at_min/max server-side for the orders fixture —
    * so window splits return disjoint row sets like the real API.
    */
  private final class RecordingTransport extends ShopifyClient.Transport {
    val requests = new ConcurrentLinkedQueue[(String, Map[String, String])]()
    private val inner = new ShopifyClient.FixtureTransport(Fixtures.transportFixtures)
    // fixture order ids by created_at, for server-side windowing
    private val orderDates = Seq(
      4000000001L -> "2021-05-02T09:00:00Z",
      4000000002L -> "2021-05-03T10:00:00Z",
      4000000003L -> "2021-05-04T12:00:00Z")

    /** Split the inner of a JSON array into top-level elements by brace
      * depth (regexes can't — order objects nest ids in line_items etc.).
      */
    private def topLevelElements(arrayBody: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; var start = 0; var inStr = false; var esc = false
      for (i <- arrayBody.indices) {
        val c = arrayBody(i)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"'       => inStr = true
          case '{' | '[' => depth += 1
          case '}' | ']' => depth -= 1
          case ',' if depth == 0 => out += arrayBody.substring(start, i); start = i + 1
          case _         =>
        }
      }
      if (start < arrayBody.length) out += arrayBody.substring(start)
      out.result().filter(_.nonEmpty)
    }

    def get(url: String, params: Map[String, String]): ShopifyClient.HttpResponse = {
      requests.add((url, params))
      // count endpoint: window-filtered count over the orders fixture,
      // like the real API's <resource>/count.json
      if (url.endsWith("customers/count.json"))
        return ShopifyClient.HttpResponse(200, "OK", Map.empty,
          """{"count":2}""") // the 2-page customers fixture holds 2 rows
      if (url.endsWith("orders/count.json")) {
        val n = orderDates.count { case (_, ts) =>
          params.get("created_at_min").forall(_ <= ts) &&
            params.get("created_at_max").forall(ts <= _)
        }
        return ShopifyClient.HttpResponse(200, "OK", Map.empty, s"""{"count":$n}""")
      }
      val resp = inner.get(url, params)
      if (url.endsWith("orders.json") && resp.status == 200) {
        val keep = orderDates.filter { case (_, ts) =>
          params.get("created_at_min").forall(_ <= ts) &&
            params.get("created_at_max").forall(ts <= _)
        }.map(_._1).toSet
        val elems = topLevelElements(
          resp.body.stripPrefix("{\"orders\":[").stripSuffix("]}"))
        val filtered = elems.filter { o =>
          keep.exists(id => o.startsWith(s"""{"id":$id,"""))
        }
        // honor the order param like the real API (TopN pushdown relies
        // on server-side ordering; a fake that ignores it would break the
        // partial-TopN contract the source declares)
        val ordered = params.get("order") match {
          case Some(o) if o.startsWith("created_at") =>
            def ts(e: String): String = orderDates.collectFirst {
              case (id, t) if e.startsWith(s"""{"id":$id,""") => t
            }.getOrElse("")
            val asc = filtered.sortBy(ts)
            if (o.endsWith("desc")) asc.reverse else asc
          case _ => filtered
        }
        resp.copy(body = ordered.mkString("{\"orders\":[", ",", "]}"))
      } else resp
    }
  }

  private def register(name: String): RecordingTransport = {
    val t = new RecordingTransport
    ShopifySource.registerTransport(name, t)
    t
  }

  private def read(name: String) = spark.read.format("shopify")
    .option("resource", "orders")
    .option("transport", name)
    .option("baseurl", Fixtures.base)

  test("reads orders with the declared payload schema, short name resolves") {
    register("t-basic")
    val df = read("t-basic").load()
    assert(df.schema == graft.ingest.Normalize.orderPayload)
    assert(df.count() == 3)
    assert(df.select("name").as[String].collect().sorted.toSeq ==
      Seq("#1042", "#1043", "#1044"))
  }

  test("pagination follows Link cursors (customers fixture has 2 pages)") {
    register("t-page")
    val df = spark.read.format("shopify")
      .option("resource", "customers")
      .option("transport", "t-page")
      .option("baseurl", Fixtures.base).load()
    assert(df.count() == 2)
  }

  test("column pruning reaches the REST fields parameter (P1 server-side projection)") {
    val t = register("t-prune")
    val got = read("t-prune").load().select("id", "name").as[(Long, String)].collect()
    assert(got.length == 3)
    val fieldsParams = t.requests.asScala.toSeq.flatMap(_._2.get("fields"))
    assert(fieldsParams.nonEmpty)
    assert(fieldsParams.forall(_ == "id,name"),
      s"server should only be asked for pruned columns, got: $fieldsParams")
  }

  test("created_at range predicates push down to created_at_min/max params") {
    val t = register("t-filter")
    val got = read("t-filter").load()
      .filter($"created_at" >= lit("2021-05-03T00:00:00Z").cast("timestamp"))
      .select("id").as[Long].collect()
    assert(got.sorted.toSeq == Seq(4000000002L, 4000000003L),
      "residual Spark filter must agree with the server-side window")
    val mins = t.requests.asScala.toSeq.flatMap(_._2.get("created_at_min"))
    assert(mins.nonEmpty && mins.forall(_.startsWith("2021-05-03T00:00:00")),
      s"created_at_min param missing or wrong: $mins")
  }

  test("bounded windows split into disjoint parallel partitions") {
    val t = register("t-split")
    val df = read("t-split")
      .option("created_at_min", "2021-05-01")
      .option("created_at_max", "2021-05-05")
      .option("splits", "2").load()
    assert(df.rdd.getNumPartitions == 2)
    // disjoint windows ⇒ no duplicates across partitions
    assert(df.select("id").as[Long].collect().sorted.toSeq ==
      Seq(4000000001L, 4000000002L, 4000000003L))
    val windows = t.requests.asScala.toSeq
      .filter(_._1.endsWith("orders.json"))
      .map(r => (r._2.get("created_at_min"), r._2.get("created_at_max")))
      .distinct
    assert(windows.size == 2, s"expected 2 distinct scan windows, got $windows")
    // adjacent windows are separated by a whole SECOND (the API compares
    // created_at at second granularity — a 1ms gap would let a
    // boundary-second record into both inclusive windows)
    val sorted = windows.sortBy(_._1)
    val firstHi = java.time.Instant.parse(sorted.head._2.get)
    val secondLo = java.time.Instant.parse(sorted(1)._1.get)
    assert(secondLo.minusSeconds(1) == firstHi,
      s"window boundary not second-aligned: $firstHi vs $secondLo")
  }

  test("count(*) pushes down to the count endpoint — no row transfer") {
    val t = register("t-count")
    assert(read("t-count").load().count() == 3L)
    val urls = t.requests.asScala.toSeq.map(_._1)
    assert(urls.exists(_.endsWith("orders/count.json")),
      s"expected a count.json request, got: $urls")
    assert(!urls.exists(_.endsWith("orders.json")),
      s"count(*) must not page rows, got: $urls")
  }

  test("count(*) respects the pushed created_at window and split parallelism") {
    val t = register("t-count-win")
    val df = read("t-count-win")
      .option("created_at_min", "2021-05-03")
      .option("created_at_max", "2021-05-05")
      .option("splits", "2").load()
    assert(df.count() == 2L) // orders on 05-03 and 05-04
    val countReqs = t.requests.asScala.toSeq.filter(_._1.endsWith("orders/count.json"))
    assert(countReqs.size == 2, s"expected one count request per window: $countReqs")
    assert(countReqs.forall(_._2.contains("created_at_min")))
    assert(!t.requests.asScala.exists(_._1.endsWith("orders.json")))
  }

  test("grouped aggregates decline pushdown and still answer correctly") {
    val t = register("t-count-group")
    val grouped = read("t-count-group").load()
      .groupBy($"financial_status").count()
      .as[(String, Long)].collect().toMap
    assert(grouped.values.sum == 3L)
    // the group-by needs real rows: the scan must have paged orders.json
    assert(t.requests.asScala.exists(_._1.endsWith("orders.json")))
  }

  test("limit(n) pushes down: capped page size, no second page") {
    val t = register("t-limit")
    val got = read("t-limit").load().limit(2).collect()
    assert(got.length == 2)
    val orderReqs = t.requests.asScala.toSeq.filter(_._1.endsWith("orders.json"))
    assert(orderReqs.nonEmpty)
    assert(orderReqs.forall(_._2.get("limit").contains("2")),
      s"pushed limit should cap the page size: ${orderReqs.map(_._2)}")
  }

  test("orderBy(created_at).limit(n) pushes TopN: order param + capped page") {
    val t = register("t-topn")
    val got = read("t-topn").load()
      .orderBy($"created_at".desc).limit(2)
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(4000000003L, 4000000002L)) // Spark re-sorts on top
    val orderReqs = t.requests.asScala.toSeq.filter(_._1.endsWith("orders.json"))
    assert(orderReqs.nonEmpty)
    assert(orderReqs.forall(_._2.get("order").contains("created_at desc")),
      s"order param missing: ${orderReqs.map(_._2)}")
    assert(orderReqs.forall(_._2.get("limit").contains("2")))
  }

  test("non-created_at sorts decline TopN pushdown") {
    val t = register("t-topn-decline")
    val got = read("t-topn-decline").load()
      .orderBy($"name").limit(2).select("name").as[String].collect()
    assert(got.toSeq == Seq("#1042", "#1043"))
    val orderReqs = t.requests.asScala.toSeq.filter(_._1.endsWith("orders.json"))
    assert(orderReqs.forall(!_._2.contains("order")),
      s"name sort must not push an order param: ${orderReqs.map(_._2)}")
  }

  test("reported statistics price the scan: planner sees real cardinality and broadcasts") {
    val t = register("t-stats")
    val src = read("t-stats").load()
    // the optimizer's V2 relation stats come from SupportsReportStatistics
    val stats = src.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(3)),
      s"expected rowCount=3 from count.json, got ${stats.rowCount}")
    assert(stats.sizeInBytes < 100000, s"sizeInBytes ${stats.sizeInBytes}")
    // pricing must come from the count endpoint, not a data fetch
    val reqs = t.requests.asScala.toSeq
    assert(reqs.exists(_._1.endsWith("orders/count.json")))
    assert(!reqs.exists(_._1.endsWith("orders.json")),
      "planning must not fetch order pages")
    // join strategy: the 3-row REST window becomes the broadcast side of
    // an enrichment join against a shuffle-sized local table — in the
    // INITIAL physical plan (no AQE runtime rescue needed)
    val big = spark.range(3000000).select($"id".as("oid"))
    val joined = src.join(big, $"id" === $"oid")
    val initial = joined.queryExecution.sparkPlan.toString
    assert(initial.contains("BroadcastHashJoin"),
      s"expected broadcast from reported stats:\n${initial.take(1200)}")
  }

  test("stats probe: no retry ladder, failure logged-and-swallowed, opt-out honored") {
    // a transport whose count endpoint always fails: planning must cost
    // exactly ONE count probe (retryLimit=1 — not the ingest transport's
    // multi-minute backoff budget) and still plan with default stats
    class FailingCount extends ShopifyClient.Transport {
      var countCalls = 0
      private val inner = new RecordingTransport
      def get(url: String, params: Map[String, String]): ShopifyClient.HttpResponse =
        if (url.endsWith("/count.json")) {
          countCalls += 1
          ShopifyClient.HttpResponse(503, "unavailable", Map.empty, "")
        } else inner.get(url, params)
    }
    val t = new FailingCount
    ShopifySource.registerTransport("t-stats-fail", t)
    val src = read("t-stats-fail").load()
    val stats = src.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.isEmpty, "failed probe must fall back to default stats")
    assert(t.countCalls == 1,
      s"planning-time probe must not retry: ${t.countCalls} calls")
    // rows still readable — a monitoring failure never fails the query.
    // (collect, not count(): count(*) legitimately pushes down to the
    // count endpoint, which this transport genuinely breaks)
    assert(src.collect().length == 3)
    assert(t.countCalls == 1, "row fetch must not re-probe stats")

    // stats=false: the probe never fires at all
    val t2 = new FailingCount
    ShopifySource.registerTransport("t-stats-off", t2)
    val off = spark.read.format("shopify")
      .option("resource", "orders").option("transport", "t-stats-off")
      .option("baseurl", Fixtures.base).option("stats", "false").load()
    off.queryExecution.optimizedPlan.stats
    assert(t2.countCalls == 0, "stats=false must suppress the probe")
  }

  test("stats probe: successful counts are cached across Scan instances (re-plans)") {
    val t = register("t-stats-cache")
    // two independent reads = two ScanBuilder/Scan instances; the second
    // plan must reuse the first's probed count instead of re-firing HTTP
    read("t-stats-cache").load().queryExecution.optimizedPlan.stats
    read("t-stats-cache").load().queryExecution.optimizedPlan.stats
    val probes = t.requests.asScala.count(_._1.endsWith("orders/count.json"))
    assert(probes == 1, s"expected one cached probe, saw $probes")
  }

  test("streaming honors a configured created_at_max (rows past it never leak)") {
    register("t-stream-max")
    val q = spark.readStream.format("shopify")
      .option("resource", "orders")
      .option("transport", "t-stream-max")
      .option("baseurl", Fixtures.base)
      .option("created_at_min", "2021-05-01")
      .option("created_at_max", "2021-05-03") // end-of-day; #1044 is May 4
      .option("streamend", "2021-05-10T00:00:00Z")
      .load()
      .writeStream.format("memory").queryName("shopify_stream_capped")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("shopify-stream-ckpt3").toString)
      .start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT id FROM shopify_stream_capped").as[Long].collect().sorted
    assert(ids.toSeq == Seq(4000000001L, 4000000002L),
      s"created_at_max must cap the stream watermark: ${ids.toSeq}")
  }

  test("a looser query filter cannot widen an option-configured window") {
    val t = register("t-tighten")
    // option floor = May 3; the filter asks from Jan 1 — the scan window
    // must stay at the TIGHTER May 3 bound (options are never re-applied
    // by Spark, so widening would leak configured-out rows)
    val got = read("t-tighten")
      .option("created_at_min", "2021-05-03")
      .load()
      .filter($"created_at" >= lit("2021-01-01T00:00:00Z").cast("timestamp"))
      .select("id").as[Long].collect()
    assert(got.sorted.toSeq == Seq(4000000002L, 4000000003L), got.toSeq.toString)
    val mins = t.requests.asScala.toSeq.flatMap(_._2.get("created_at_min"))
    assert(mins.nonEmpty && mins.forall(_.startsWith("2021-05-03")), mins.toString)
  }

  test("micro-batch stream drains the created_at window and honors the offset floor") {
    val t = register("t-stream")
    val q = spark.readStream.format("shopify")
      .option("resource", "orders")
      .option("transport", "t-stream")
      .option("baseurl", Fixtures.base)
      .option("created_at_min", "2021-05-01")
      .option("streamend", "2021-05-10T00:00:00Z")
      .load()
      .writeStream.format("memory").queryName("shopify_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("shopify-stream-ckpt").toString)
      .start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT id FROM shopify_stream").as[Long].collect().sorted
    assert(ids.toSeq == Seq(4000000001L, 4000000002L, 4000000003L))
    // the batch window started strictly after the configured floor
    val mins = t.requests.asScala.toSeq.flatMap(_._2.get("created_at_min"))
    assert(mins.nonEmpty && mins.forall(_ > "2021-05-01T00:00:00"), mins.toString)
  }

  test("stream restart resumes from the committed offset, never re-reading old windows") {
    val ckpt = java.nio.file.Files.createTempDirectory("shopify-stream-ckpt-resume").toString
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    def run(transportName: String, streamEnd: String): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("shopify")
        .option("resource", "orders")
        .option("transport", transportName)
        .option("baseurl", Fixtures.base)
        .option("created_at_min", "2021-05-01")
        .option("streamend", streamEnd)
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => got.add(r.getLong(0)))
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(60000)
      got.asScala.toSeq.sorted
    }
    // first run drains up to May 3; commits that watermark
    register("t-resume-1")
    assert(run("t-resume-1", "2021-05-03T12:00:00Z") == Seq(4000000001L, 4000000002L))
    // second run from the SAME checkpoint with a later end: only the new
    // window may be requested — its lower bound sits past the committed
    // watermark, so orders #1042/#1043 are never re-fetched
    val t2 = register("t-resume-2")
    val ids2 = run("t-resume-2", "2021-05-10T00:00:00Z")
    assert(ids2 == Seq(4000000003L), s"resumed batch must only see new data: $ids2")
    // only ROW-page requests are held to the watermark floor — the
    // plan-time statistics call (count.json) legitimately prices the
    // configured window and transfers no rows
    val mins2 = t2.requests.asScala.toSeq
      .filter(_._1.endsWith("orders.json"))
      .flatMap(_._2.get("created_at_min"))
    assert(mins2.nonEmpty && mins2.forall(_ > "2021-05-03T12:00:00"),
      s"resumed scan must start past the committed watermark: $mins2")
  }

  test("micro-batch stream with a pre-data watermark window reads nothing") {
    register("t-stream-empty")
    val q = spark.readStream.format("shopify")
      .option("resource", "orders")
      .option("transport", "t-stream-empty")
      .option("baseurl", Fixtures.base)
      .option("created_at_min", "2021-01-01")
      .option("streamend", "2021-02-01T00:00:00Z")
      .load()
      .writeStream.format("memory").queryName("shopify_stream_empty")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("shopify-stream-ckpt2").toString)
      .start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT * FROM shopify_stream_empty").count() == 0)
  }

  test("DSv2 rows feed the normalize→store pipeline identically to the page-body path") {
    import graft.ingest.Normalize
    register("t-e2e")
    // same projections, two entry points: typed DSv2 rows vs raw page bodies
    val viaDsv2 = Normalize.ordersFromDocs(
      Normalize.fromPayloadRows(read("t-e2e").load()))
    val viaPages = Normalize.orders(
      Seq(Fixtures.transportFixtures(s"${Fixtures.base}orders.json")).toDS())
    val a = viaDsv2.orderBy("id").collect().toSeq
    val b = viaPages.orderBy("id").collect().toSeq
    assert(a == b, "both ingest paths must produce identical normalized rows")
    // and the store upsert accepts the DSv2-fed frame end-to-end
    val dir = java.nio.file.Files.createTempDirectory("dsv2-store").toString
    val store = new graft.store.ShopifyStore(spark, dir)
    store.init()
    store.upsert("orders", viaDsv2)
    assert(store.read("orders").count() == 3)
    assert(store.readBounded("orders", Some("2021-05-03"), None).count() == 2)
  }

  test("plan description advertises pushed projection and window") {
    register("t-desc")
    val df = read("t-desc").load()
      .filter($"created_at" >= lit("2021-05-03T00:00:00Z").cast("timestamp"))
      .select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShopifyScan"), plan)
  }
}
