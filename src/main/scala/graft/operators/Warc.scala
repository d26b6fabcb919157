package graft.operators

/** WARC (Web ARChive, ISO 28500) reader/writer subset — the container
  * every large-scale web corpus arrives in (Common Crawl publishes its
  * crawls as gzip-member-per-record WARCs), i.e. the FIRST byte format a
  * training-data pipeline touches. Built from the public spec:
  * version line + named headers + Content-Length-framed payload + CRLF
  * CRLF record separator; the gzip framing rides [[Deflate]]'s validating
  * multi-member gunzip (one member per record, the convention that keeps
  * records independently seekable in object storage).
  *
  * The parser VALIDATES: version token, mandatory headers (WARC-Type,
  * WARC-Record-ID, Content-Length), exact payload framing, the
  * two-CRLF terminator, and — through the gzip layer — CRC-32 + ISIZE
  * per record. Also included: a minimal HTTP/1.1 response splitter
  * (status line, headers, body) for `response` records, since the WARC
  * payload of a crawl response IS the raw HTTP message.
  */
object Warc {

  final class WarcError(msg: String) extends RuntimeException(msg)

  case class Record(warcType: String, recordId: String,
                    targetUri: Option[String], payload: Array[Byte])

  case class HttpResponse(status: Int, headers: Map[String, String], body: Array[Byte])

  private val Crlf = "\r\n"

  // ------------------------------------------------------------------ build

  def buildRecord(warcType: String, recordId: String, targetUri: Option[String],
                  payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: ").append(recordId).append(Crlf)
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(Crlf))
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes("UTF-8") ++ payload ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  def buildHttpResponse(contentType: String, body: Array[Byte]): Array[Byte] =
    buildHttpResponse(200, "OK", contentType, body)

  /** Status-aware variant — the fetch executor records non-200 responses
    * (robots said yes, the server said 404) as faithful WARC payloads.
    */
  def buildHttpResponse(status: Int, reason: String, contentType: String,
                        body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status $reason${Crlf}Content-Type: $contentType${Crlf}" +
      s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("UTF-8") ++ body

  /** Gzip-member-per-record stream (the Common Crawl convention). */
  def buildWarcGz(records: Seq[Array[Byte]]): Array[Byte] =
    records.map(Deflate.gzip).foldLeft(Array.emptyByteArray)(_ ++ _)

  // ------------------------------------------------------------------ parse

  /** Parse a plain (non-gzip) WARC byte stream into records. */
  def parseWarc(bytes: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var pos = 0
    while (pos < bytes.length) {
      pos = parseRecord(bytes, pos, out)
    }
    out.result()
  }

  /** Parse a gzip-member-per-record WARC (each member holds ≥1 record). */
  def parseWarcGz(bytes: Array[Byte]): Seq[Record] =
    Deflate.gunzipMembers(bytes).flatMap(parseWarc)

  private def parseRecord(bytes: Array[Byte], start: Int,
                          out: scala.collection.mutable.Builder[Record, Seq[Record]]): Int = {
    val headerEnd = indexOf(bytes, start, Crlf + Crlf)
    if (headerEnd < 0) throw new WarcError("unterminated record header")
    val header = new String(bytes, start, headerEnd - start, "UTF-8")
    val lines = header.split(Crlf)
    if (!lines.head.startsWith("WARC/1."))
      throw new WarcError(s"bad WARC version line '${lines.head}'")
    val fields = lines.tail.map { l =>
      val i = l.indexOf(':')
      if (i < 0) throw new WarcError(s"malformed header line '$l'")
      l.take(i).trim.toLowerCase -> l.drop(i + 1).trim
    }.toMap
    val warcType = fields.getOrElse("warc-type", throw new WarcError("missing WARC-Type"))
    val recordId = fields.getOrElse("warc-record-id", throw new WarcError("missing WARC-Record-ID"))
    // Long parse + Long-arithmetic bounds (the Png.decodePng:126 pattern):
    // a hostile length near Int.MaxValue must not overflow the sum negative
    // and sail past the check, and a non-numeric value is a WarcError, not
    // a NumberFormatException
    val lenRaw = fields.getOrElse("content-length", throw new WarcError("missing Content-Length"))
    val lenL =
      try lenRaw.toLong
      catch { case _: NumberFormatException =>
        throw new WarcError(s"unparseable Content-Length '$lenRaw'")
      }
    if (lenL < 0) throw new WarcError(s"negative Content-Length $lenL")
    val payloadStart = headerEnd + 4
    // the first clause also caps lenL at Int range, so the sum cannot
    // overflow Long either
    if (lenL > bytes.length || payloadStart.toLong + lenL + 4 > bytes.length)
      throw new WarcError("record payload truncated")
    val len = lenL.toInt
    val payload = java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len)
    val sep = new String(bytes, payloadStart + len, 4, "UTF-8")
    if (sep != Crlf + Crlf)
      throw new WarcError("missing record separator after payload")
    out += Record(warcType, recordId, fields.get("warc-target-uri"), payload)
    payloadStart + len + 4
  }

  /** Split a raw HTTP/1.1 response message (a `response` record payload). */
  def parseHttpResponse(bytes: Array[Byte]): HttpResponse = {
    val headerEnd = indexOf(bytes, 0, Crlf + Crlf)
    if (headerEnd < 0) throw new WarcError("unterminated HTTP header")
    val lines = new String(bytes, 0, headerEnd, "UTF-8").split(Crlf)
    val status = lines.head.split(" ") match {
      case parts if parts.length >= 2 && parts(0).startsWith("HTTP/1.") => parts(1).toInt
      case _ => throw new WarcError(s"bad HTTP status line '${lines.head}'")
    }
    val headers = lines.tail.map { l =>
      val i = l.indexOf(':')
      if (i < 0) throw new WarcError(s"malformed HTTP header '$l'")
      l.take(i).trim.toLowerCase -> l.drop(i + 1).trim
    }.toMap
    val body = java.util.Arrays.copyOfRange(bytes, headerEnd + 4, bytes.length)
    headers.get("content-length").foreach { cl =>
      val n = try cl.toLong catch { case _: NumberFormatException =>
        throw new WarcError(s"unparseable HTTP Content-Length '$cl'")
      }
      if (n != body.length)
        throw new WarcError(s"HTTP Content-Length $cl != body ${body.length}")
    }
    HttpResponse(status, headers, body)
  }

  private def indexOf(hay: Array[Byte], from: Int, needle: String): Int = {
    val n = needle.getBytes("UTF-8")
    var i = from
    while (i <= hay.length - n.length) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }
}
