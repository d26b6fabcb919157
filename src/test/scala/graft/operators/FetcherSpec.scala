package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The crawl fetch executor ([[Fetcher]]): per-host plan order preserved
  * through the shuffle, hosts co-located (never fetched from two
  * partitions), WARC gzip-member-per-record output that round-trips the
  * q243 reader path, non-200 statuses faithful.
  */
class FetcherSpec extends SparkSuite {
  import spark.implicits._

  private def mkPlan = (0 until 60).map { i =>
    (s"h${i % 3}", f"/u$i%03d", (i / 3).toLong / 2L) // 3 hosts, rising rounds
  }.toDF("host", "url", "fetch_round")

  private val transport: Fetcher.Transport = url => {
    val status = if (url.endsWith("7")) 404 else 200
    (status, if (status == 200) "OK" else "Not Found",
      "text/plain", s"body:$url".getBytes("UTF-8"))
  }

  test("per-host plan order is strictly preserved across a multi-partition shuffle") {
    val out = Fetcher.execute(mkPlan, transport, numPartitions = 5).collect()
    assert(out.length == 60)
    out.groupBy(_.host).foreach { case (h, rs) =>
      val inSeq = rs.sortBy(_.seq_in_host)
      assert(inSeq.map(_.seq_in_host).toSeq == (0L until rs.length).toSeq,
        s"$h: seq must be dense from 0")
      val keys = inSeq.map(r => (r.fetch_round, r.url)).toSeq
      assert(keys == keys.sorted, s"$h: fetch order must follow (round, url)")
    }
  }

  test("each host is fetched from exactly ONE partition (politeness co-location)") {
    val fetched = Fetcher.execute(mkPlan, transport, numPartitions = 5)
    val hostParts = fetched.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map(r => (r.host, pid))
    }.distinct().collect().groupBy(_._1)
    assert(hostParts.nonEmpty && hostParts.values.forall(_.length == 1),
      s"a host must never span partitions: $hostParts")
  }

  test("WARC members round-trip the q243 reader path, statuses faithful") {
    val out = Fetcher.execute(mkPlan, transport, numPartitions = 3).collect()
    out.foreach { r =>
      val recs = Warc.parseWarcGz(r.warc)
      assert(recs.length == 1 && recs.head.warcType == "response",
        "one gzip member per response record")
      assert(recs.head.targetUri.contains(r.url))
      val http = Warc.parseHttpResponse(recs.head.payload)
      assert(http.status == r.status)
      assert(http.status == (if (r.url.endsWith("7")) 404 else 200))
      assert(new String(http.body, "UTF-8") == s"body:${r.url}")
    }
  }

  test("crawl-delay pacing: round N+1's first request waits >= delay after round N's last, per host") {
    FakePacer.reset()
    // 2 hosts x 3 rounds x 2 urls — serialized per host within one partition
    val plan = (for (h <- 0 until 2; r <- 0 until 3; u <- 0 until 2)
      yield (s"p$h", f"/r$r%d-u$u%d", r.toLong)).toDF("host", "url", "fetch_round")
    val out = Fetcher.execute(plan, transport, numPartitions = 1,
      crawlDelayMs = h => if (h == "p0") 1000L else 5000L,
      pacer = FakePacer).collect()
    out.groupBy(_.host).foreach { case (h, rs) =>
      val delay = if (h == "p0") 1000L else 5000L
      val byRound = rs.groupBy(_.fetch_round)
      for (r <- 0L to 1L) {
        val lastPrev = byRound(r).map(_.issued_at_ms).max
        val firstNext = byRound(r + 1).map(_.issued_at_ms).min
        assert(firstNext >= lastPrev + delay,
          s"$h round ${r + 1} first request at $firstNext must wait " +
            s">= $delay after round $r's last at $lastPrev")
      }
      // requests INSIDE one round stay back-to-back (no politeness gap)
      byRound.values.foreach { rr =>
        val ts = rr.map(_.issued_at_ms).sorted.toSeq
        ts.zip(ts.drop(1)).foreach { case (a, b) =>
          assert(b - a < 1000L, "same-round requests must not pace")
        }
      }
    }
  }
}

/** Deterministic clock for the pacing spec: `now()` advances 10ms per
  * sample (simulated request work), `sleepUntil` jumps the clock forward
  * — a Scala object, so executor-side deserialization in local mode
  * resolves back to this singleton and the clock stays shared.
  */
object FakePacer extends Fetcher.Pacer {
  private val t = new java.util.concurrent.atomic.AtomicLong(0L)
  def reset(): Unit = t.set(100000L)
  def now(): Long = t.addAndGet(10L)
  def sleepUntil(until: Long): Unit = {
    var c = t.get()
    while (c < until && !t.compareAndSet(c, until)) c = t.get()
  }
}
