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
}
