package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSuite {
  import spark.implicits._

  private def mkWarc(n: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      Warc.buildRecord("response", s"<urn:uuid:r$i>", Some(s"http://t.test/$i"),
        Warc.buildHttpResponse("text/plain", s"body number $i with words".getBytes("UTF-8")))
    }

  test("plain WARC roundtrips with full framing validation") {
    val bytes = mkWarc(5).reduce(_ ++ _)
    val recs = Warc.parseWarc(bytes)
    assert(recs.size == 5)
    recs.zipWithIndex.foreach { case (r, i) =>
      assert(r.warcType == "response" && r.targetUri.contains(s"http://t.test/$i"))
      val http = Warc.parseHttpResponse(r.payload)
      assert(http.status == 200)
      assert(new String(http.body, "UTF-8") == s"body number $i with words")
    }
  }

  test("gzip member-per-record roundtrips; JDK reads our members, we read JDK's") {
    val records = mkWarc(4)
    val gz = Warc.buildWarcGz(records)
    assert(Warc.parseWarcGz(gz).size == 4)
    // JDK GZIPInputStream transparently concatenates members — our stream
    // must read as the plain concatenation
    val jdk = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(gz))
    assert(jdk.readAllBytes().toSeq == records.reduce(_ ++ _).toSeq)
    // and our multi-member gunzip reads a JDK-written member stream
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(r); g.finish(); g.close()
    }
    assert(Warc.parseWarcGz(bos.toByteArray).size == 4)
  }

  test("malformed records fail loudly and typed") {
    val good = mkWarc(1).head
    intercept[Warc.WarcError](Warc.parseWarc(good.take(good.length - 3))) // truncated
    intercept[Warc.WarcError](Warc.parseWarc("HARC/1.1\r\n\r\n".getBytes)) // version
    intercept[Warc.WarcError](Warc.parseWarc(
      "WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes)) // no id
    // corrupt the separator after the payload
    val bad = good.clone(); bad(bad.length - 1) = 'X'.toByte
    intercept[Warc.WarcError](Warc.parseWarc(bad))
    // HTTP content-length mismatch
    intercept[Warc.WarcError](Warc.parseHttpResponse(
      "HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort".getBytes))
  }

  test("hostile Content-Length values are typed errors, never overflow past the bound") {
    def rec(len: String) =
      (s"WARC/1.1\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:x>\r\n" +
        s"Content-Length: $len\r\n\r\npayload\r\n\r\n").getBytes("UTF-8")
    // near-Int.MaxValue length must not wrap the bounds check negative
    intercept[Warc.WarcError](Warc.parseWarc(rec((Int.MaxValue - 2).toString)))
    intercept[Warc.WarcError](Warc.parseWarc(rec(Long.MaxValue.toString)))
    intercept[Warc.WarcError](Warc.parseWarc(rec("-7")))
    intercept[Warc.WarcError](Warc.parseWarc(rec("not-a-number")))
    intercept[Warc.WarcError](Warc.parseHttpResponse(
      "HTTP/1.1 200 OK\r\nContent-Length: ZZZ\r\n\r\nshort".getBytes))
  }

  test("htmlToText strips boilerplate, decodes entities, normalizes whitespace") {
    val cases = Seq(
      ("<p>hello world</p>", "hello world"),
      ("<script>var x = 1 < 2;</script>plain", "plain"),
      ("<STYLE>p { }</STYLE>kept", "kept"),
      ("<!-- gone -->a<!--x-->b", "a b"),
      ("a&nbsp;b &amp; c &lt;tag&gt;", "a b & c <tag>"),
      // double-encoded entity must decode exactly ONCE
      ("&amp;lt;", "&lt;"),
      ("<div>  spaced \t out  </div>", "spaced out"),
      ("<a href=\"x\">link</a> text", "link text"))
    val got = cases.map(_._1).toDF("h")
      .select(graft.functions.TextFunctions.htmlToText(col("h")).as("t"))
      .as[String].collect().toSeq
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"case $i: '${cases(i)._1}' -> '$g' want '$w'")
    }
  }

  test("gunzip rejects trailing bytes; gunzipMembers accepts exactly-framed streams") {
    val one = Deflate.gzip("hello".getBytes)
    intercept[Deflate.DeflateError](Deflate.gunzip(one ++ Array[Byte](0)))
    val two = one ++ Deflate.gzip("world".getBytes)
    assert(Deflate.gunzipMembers(two).map(new String(_, "UTF-8")) == Seq("hello", "world"))
    intercept[Deflate.DeflateError](Deflate.gunzipMembers(two.take(two.length - 2)))
  }
}
