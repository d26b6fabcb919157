package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{md5, octet_length}
import graft.queries.Tables.documents

/** Compressed-container metadata extraction — the q73/q75 decode-vs-formula
  * contract extended to the last two codec seams at the structural level:
  *
  *  - q189: MPEG-1 Layer III (MP3) frame walk — ID3v2 syncsafe skip, frame
  *    sync validation, VBR bitrate/samplerate table decode, padding-aware
  *    frame-length recurrence ([[graft.operators.Mp3]]).
  *  - q190: H.264 Annex-B NAL walk — start-code scan, emulation-prevention
  *    removal, Exp-Golomb SPS parse with crop-unit arithmetic
  *    ([[graft.operators.H264]]).
  *
  * Executors build a real stream per document from deterministic formulas,
  * parse it with the general parser, and the DuckDB oracle recomputes every
  * output field in closed form — a wrong table entry, missed padding bit,
  * or off-by-one Exp-Golomb prefix hash-mismatches. The per-item work is
  * payload-bounded and embarrassingly parallel: at 100 TB this is one
  * narrow mapPartitions-shaped pass with no shuffle before the final
  * presentation sort.
  *
  * Reference anchor: media payloads as opaque binaries + typed metadata
  * (SURVEY §2 multimodal rows); full audio/video sample decode remains the
  * documented MediaCodec stub.
  */
object MediaOps {

  /** q189: MP3 frame-header walk over generated VBR streams. */
  def mp3Walk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val info = graft.operators.Mp3.parseMp3(graft.operators.Mp3.buildMp3(id))
      (id, info.sampleRate, info.nFrames, info.tagBytes, info.audioBytes,
        info.kbpsSum, info.durationMs)
    }.toDF("media_id", "sample_rate", "n_frames", "tag_bytes", "audio_bytes",
      "kbps_sum", "duration_ms")
      .orderBy($"media_id")
  }

  val mp3WalkSql: String =
    """WITH f AS (
      |  SELECT doc_id, g.f,
      |    [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
      |      [CAST((doc_id+g.f)%14 AS INTEGER)+1] AS kbps,
      |    [44100,48000,32000][CAST(doc_id%3 AS INTEGER)+1] AS sr,
      |    CAST((doc_id+g.f)%2 AS BIGINT) AS pad
      |  FROM documents
      |  JOIN generate_series(0, 8) g(f) ON g.f < 3 + doc_id % 6),
      |s AS (
      |  SELECT doc_id, MAX(sr) AS sample_rate, COUNT(*) AS n_frames,
      |    SUM(144*kbps*1000 // sr + pad) AS audio_bytes,
      |    SUM(kbps) AS kbps_sum
      |  FROM f GROUP BY doc_id)
      |SELECT doc_id AS media_id,
      |  CAST(sample_rate AS INTEGER) AS sample_rate,
      |  CAST(n_frames AS INTEGER) AS n_frames,
      |  CAST(20 + doc_id % 64 * 3 AS INTEGER) AS tag_bytes,
      |  CAST(audio_bytes AS BIGINT) AS audio_bytes,
      |  CAST(kbps_sum AS BIGINT) AS kbps_sum,
      |  CAST(n_frames*1152*1000 AS DOUBLE) / sample_rate AS duration_ms
      |FROM s ORDER BY media_id""".stripMargin

  /** q190: H.264 Annex-B walk + SPS parse over generated streams. */
  def h264Walk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val info = graft.operators.H264.parseH264(graft.operators.H264.buildH264(id))
      (id, info.sps.profileIdc, info.sps.levelIdc, info.sps.width,
        info.sps.height, info.sps.log2MaxFrameNum, info.sps.maxNumRefFrames,
        info.nNals, info.nIdr)
    }.toDF("media_id", "profile_idc", "level_idc", "width", "height",
      "log2_max_frame_num", "max_ref_frames", "n_nals", "n_idr")
      .orderBy($"media_id")
  }

  val h264WalkSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(66 AS INTEGER) AS profile_idc,
      |  CAST(10 + doc_id % 5 * 10 AS INTEGER) AS level_idc,
      |  CAST(16 * (2 + doc_id % 8)
      |    - CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 2 * (doc_id % 3) END
      |    AS INTEGER) AS width,
      |  CAST(16 * (2 + doc_id % 6)
      |    - CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 2 * (doc_id % 2) END
      |    AS INTEGER) AS height,
      |  CAST(4 + doc_id % 5 AS INTEGER) AS log2_max_frame_num,
      |  CAST(1 + doc_id % 3 AS INTEGER) AS max_ref_frames,
      |  CAST(3 + doc_id % 4 AS INTEGER) AS n_nals,
      |  CAST(1 + doc_id % 4 AS INTEGER) AS n_idr
      |FROM documents ORDER BY media_id""".stripMargin

  /** q201: GIF decode — the LOSSLESS compressed-codec tier beside q73's
    * (lossy, constant-block-constructed) JPEG: executors build a real
    * GIF87a per document and decode it through the full variable-width
    * LZW path (clear-code resets, cScSc case, width growth at every
    * 2^k boundary — GifSpec round-trips all of them), so decoded pixels
    * equal the generator formula EXACTLY with no special construction,
    * and the oracle recomputes dimensions and pixel mean in closed form.
    */
  def gifDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val w = 8 + (id % 16).toInt * 4
      val h = 8 + (id % 12).toInt * 4
      val img = graft.operators.Gif.parseGif(graft.operators.Gif.buildGif(id, w, h))
      var s = 0L
      img.pixels.foreach(p => s += (p & 0xFF))
      (id, img.width, img.height, s.toDouble / (img.width * img.height))
    }.toDF("media_id", "parsed_width", "parsed_height", "pixel_mean")
      .orderBy($"media_id")
  }

  val gifDecodeSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(8 + doc_id % 16 * 4 AS INTEGER) AS parsed_width,
      |  CAST(8 + doc_id % 12 * 4 AS INTEGER) AS parsed_height,
      |  CAST(CAST(SUM((doc_id*31 + g.i*7) % 256) AS BIGINT) AS DOUBLE)
      |    / ((8 + doc_id % 16 * 4) * (8 + doc_id % 12 * 4)) AS pixel_mean
      |FROM documents
      |JOIN generate_series(0, 3600) g(i)
      |  ON g.i < (8 + doc_id % 16 * 4) * (8 + doc_id % 12 * 4)
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  /** q230: FLAC decode — the compressed-AUDIO tier completing the lossless
    * codec matrix (GIF q201 for images, FLAC here for audio), and the
    * achievable replacement for the round-10-declined MP3 sample decode:
    * every FLAC construct is derivable from its public spec with no
    * tabulated constants, so the decoder can be validated against the
    * generator formula the way q201 is (MP3's Huffman tables cannot —
    * RESPONSES.md item 6). Executors build a real multi-frame FLAC stream
    * per document (sawtooth-plus-noise PCM: fixed/LPC predictors engage,
    * Rice parameters stay small) and decode it through the full path —
    * frame sync, CRC-8, CRC-16, Rice residuals, predictor reconstruction,
    * and the STREAMINFO MD5 over the decoded PCM — so ANY bit-level
    * encode/decode defect surfaces either as a typed failure or as a
    * sample-stat mismatch against the closed-form oracle. Per-item work is
    * payload-bounded and embarrassingly parallel: one narrow map pass, no
    * shuffle before the presentation sort — the same 100 TB posture as
    * q201 (SCALE_PROBE.md).
    */
  def flacDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val n = 600 + (id % 7).toInt * 256
      val sr = Array(8000, 16000, 44100)((id % 3).toInt)
      val pcm = Array.tabulate(n) { i =>
        (((id % 7 + 1) * i) % 2048).toInt - 1024 + ((id * 31 + i * 17) % 64).toInt
      }
      val dec = graft.operators.Flac.decodeFlac(
        graft.operators.Flac.encodeFlac(pcm, sr, bitsPerSample = 16, blockSize = 256))
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      dec.samples.foreach { s => sum += s; if (s < mn) mn = s; if (s > mx) mx = s }
      (id, dec.sampleRate, dec.nFrames, dec.samples.length, sum, mn, mx)
    }.toDF("media_id", "sample_rate", "n_frames", "n_samples",
      "sample_sum", "sample_min", "sample_max")
      .orderBy($"media_id")
  }

  val flacDecodeSql: String =
    """SELECT doc_id AS media_id,
      |  [8000,16000,44100][CAST(doc_id % 3 AS INTEGER) + 1] AS sample_rate,
      |  CAST((600 + doc_id % 7 * 256 + 255) // 256 AS INTEGER) AS n_frames,
      |  CAST(600 + doc_id % 7 * 256 AS INTEGER) AS n_samples,
      |  CAST(SUM(((doc_id % 7 + 1) * g.i) % 2048 - 1024
      |           + (doc_id * 31 + g.i * 17) % 64) AS BIGINT) AS sample_sum,
      |  CAST(MIN(((doc_id % 7 + 1) * g.i) % 2048 - 1024
      |           + (doc_id * 31 + g.i * 17) % 64) AS INTEGER) AS sample_min,
      |  CAST(MAX(((doc_id % 7 + 1) * g.i) % 2048 - 1024
      |           + (doc_id * 31 + g.i * 17) % 64) AS INTEGER) AS sample_max
      |FROM documents
      |JOIN generate_series(0, 2135) g(i) ON g.i < 600 + doc_id % 7 * 256
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  /** q232: audio features over the DECODED FLAC stream — the pipeline
    * composition a training-data filter actually runs (codec → feature
    * extract → quality gate), and a strictly STRONGER codec grade than
    * q230: zero-crossing count is order-sensitive (any permutation or
    * off-by-one in the reconstructed samples passes q230's sum/min/max
    * but flips crossings), and the energy sum is sensitive to every
    * individual sample value. Features: strict sign-change crossings
    * (x[i-1]·x[i] < 0 — the cross-engine-unambiguous definition), total
    * energy Σx², peak |x|. Same generator as q230, so the oracle re-derives
    * everything in closed form with one LAG window.
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val n = 600 + (id % 7).toInt * 256
      val sr = Array(8000, 16000, 44100)((id % 3).toInt)
      val pcm = Array.tabulate(n) { i =>
        (((id % 7 + 1) * i) % 2048).toInt - 1024 + ((id * 31 + i * 17) % 64).toInt
      }
      val x = graft.operators.Flac.decodeFlac(
        graft.operators.Flac.encodeFlac(pcm, sr, bitsPerSample = 16, blockSize = 256)).samples
      var zc = 0L; var energy = 0L; var peak = 0
      var i = 0
      while (i < x.length) {
        if (i > 0 && x(i - 1).toLong * x(i) < 0) zc += 1
        energy += x(i).toLong * x(i)
        val a = math.abs(x(i)); if (a > peak) peak = a
        i += 1
      }
      (id, zc, energy, peak)
    }.toDF("media_id", "zero_crossings", "energy", "peak")
      .orderBy($"media_id")
  }

  val audioFeaturesSql: String =
    """WITH s AS (
      |  SELECT doc_id, g.i,
      |    ((doc_id % 7 + 1) * g.i) % 2048 - 1024
      |      + (doc_id * 31 + g.i * 17) % 64 AS x
      |  FROM documents
      |  JOIN generate_series(0, 2135) g(i) ON g.i < 600 + doc_id % 7 * 256),
      |w AS (
      |  SELECT doc_id, x,
      |    LAG(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
      |  FROM s)
      |SELECT doc_id AS media_id,
      |  CAST(SUM(CASE WHEN px * x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
      |  CAST(SUM(x * x) AS BIGINT) AS energy,
      |  CAST(MAX(ABS(x)) AS INTEGER) AS peak
      |FROM w GROUP BY doc_id ORDER BY media_id""".stripMargin

  // temp root for the file-backed media queries (q234), deleted on JVM exit
  private lazy val mediaRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_media")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
  }

  /** q234: opaque-blob ingestion through Spark's REAL binary source — the
    * other half of the multimodal story. q230/q232 build payloads inside
    * the query; at 100 TB the payloads arrive as FILES, and the idiomatic
    * scan is `format("binaryFile")` (path/length/content columns, glob
    * pushdown via pathGlobFilter). This grades that whole path: blob
    * STAGING is distributed (each executor partition writes its own .flac
    * files — the shape of a real media landing zone), the scan glob-
    * filters, the `length` column is cross-checked against the content
    * it describes, the doc identity is recovered from the PATH (the only
    * metadata a blob store gives for free), and the decoded PCM stats
    * must match the closed-form oracle — a torn file, truncated write,
    * or mis-associated path hash-mismatches. One narrow scan, per-file
    * work payload-bounded, no shuffle before the presentation sort.
    */
  def binaryIngest(spark: SparkSession, dir: String): DataFrame = mediaRoot.synchronized {
    import spark.implicits._
    val run = mediaRoot.resolve("runBinaryIngest")
    deleteRecursive(run)
    java.nio.file.Files.createDirectories(run)
    val outDir = run.toString
    // distributed staging: every tenth document lands as its own file
    documents(spark, dir).select($"doc_id").as[Long].filter(_ % 10 == 0)
      .foreachPartition { (it: Iterator[Long]) =>
        it.foreach { id =>
          val n = 600 + (id % 7).toInt * 256
          val sr = Array(8000, 16000, 44100)((id % 3).toInt)
          val pcm = Array.tabulate(n) { i =>
            (((id % 7 + 1) * i) % 2048).toInt - 1024 + ((id * 31 + i * 17) % 64).toInt
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, f"doc_$id%09d.flac"),
            graft.operators.Flac.encodeFlac(pcm, sr, bitsPerSample = 16, blockSize = 256))
        }
      }
    val idRe = raw"doc_(\d+)\.flac".r
    spark.read.format("binaryFile").option("pathGlobFilter", "*.flac").load(outDir)
      .select($"path", $"length", $"content")
      .as[(String, Long, Array[Byte])]
      .map { case (path, len, content) =>
        require(content.length.toLong == len,
          s"binaryFile length column ($len) disagrees with content (${content.length})")
        val id = idRe.findFirstMatchIn(path)
          .getOrElse(throw new IllegalArgumentException(s"unparseable blob path $path"))
          .group(1).toLong
        val dec = graft.operators.Flac.decodeFlac(content)
        var sum = 0L
        dec.samples.foreach(sum += _)
        (id, dec.samples.length, sum)
      }.toDF("media_id", "n_samples", "sample_sum")
      .orderBy($"media_id")
  }

  val binaryIngestSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(600 + doc_id % 7 * 256 AS INTEGER) AS n_samples,
      |  CAST(SUM(((doc_id % 7 + 1) * g.i) % 2048 - 1024
      |           + (doc_id * 31 + g.i * 17) % 64) AS BIGINT) AS sample_sum
      |FROM documents
      |JOIN generate_series(0, 2135) g(i) ON g.i < 600 + doc_id % 7 * 256
      |WHERE doc_id % 10 = 0
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  /** q237: DEFLATE/gzip roundtrip over the REAL corpus text — the
    * ubiquitous-codec seam (every web-crawl pipeline's first byte is
    * gzip), closed in the q230 contract style with a STRONGER reference:
    * [[graft.operators.Deflate]] is from-spec (RFC 1951/1952; canonical
    * Huffman, CRC-32 from its polynomial) and DeflateSpec cross-validates
    * it BOTH directions against the JDK's zlib — a genuinely independent
    * implementation. Here each document's UTF-8 bytes go through our
    * gzip → our validating gunzip (CRC-32 + ISIZE checked), and the
    * DECODED text's md5/byte-length are graded against the oracle's view
    * of the ORIGINAL text — any corruption anywhere in LZ77, Huffman,
    * bit packing, or the wrapper either throws typed or hash-mismatches.
    * Per-document compressibility (the LLM-corpus boilerplate signal a
    * deterministic from-spec encoder makes stable across JVMs, unlike
    * `java.util.zip.Deflater` whose output may differ between zlib
    * builds) is asserted in DeflateSpec; it is not oracle-expressible, so
    * it stays out of the graded columns. One narrow map pass, no shuffle
    * before the presentation sort — the q201/q230 100 TB posture.
    */
  def gzipRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val dec = graft.operators.Deflate.gunzip(graft.operators.Deflate.gzip(raw))
        (id, new String(dec, "UTF-8"))
      }.toDF("doc_id", "decoded")
      .select($"doc_id",
        octet_length($"decoded").cast("long").as("n_bytes"),
        md5($"decoded".cast("binary")).as("md5_hex"))
      .orderBy($"doc_id")
  }

  val gzipRoundtripSql: String =
    """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS md5_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q238: PNG decode — the lossless-IMAGE-with-entropy-coding tier
    * (GIF/LZW is dictionary coding; PNG stacks filters + DEFLATE), built
    * on the q237 zlib layer and cross-validated against `javax.imageio`
    * in PngSpec. Executors build a deterministic RGB image per document,
    * encode with heuristic per-scanline filters, and decode through the
    * full validating path (signature, per-chunk CRC-32, Adler-32,
    * unfiltering); CHANNEL-wise sums are graded so a channel swap or any
    * filter-reconstruction defect hash-mismatches even where a global sum
    * would cancel. Payload-bounded map work, no shuffle — the q201/q230
    * posture.
    */
  def pngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val w = 8 + (id % 13).toInt * 4
      val h = 8 + (id % 9).toInt * 4
      val img = graft.operators.Png.decodePng(
        graft.operators.Png.encodePng(graft.operators.Png.buildImage(id, w, h)))
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < img.pixels.length) {
        (i % 3: @annotation.switch) match {
          case 0 => r += img.pixels(i) & 0xFF
          case 1 => g += img.pixels(i) & 0xFF
          case 2 => b += img.pixels(i) & 0xFF
        }
        i += 1
      }
      (id, img.width, img.height, r, g, b)
    }.toDF("media_id", "parsed_width", "parsed_height", "r_sum", "g_sum", "b_sum")
      .orderBy($"media_id")
  }

  val pngDecodeSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(8 + doc_id % 13 * 4 AS INTEGER) AS parsed_width,
      |  CAST(8 + doc_id % 9 * 4 AS INTEGER) AS parsed_height,
      |  CAST(SUM(CASE WHEN g.i % 3 = 0 THEN (doc_id*37 + g.i*11) % 256 END) AS BIGINT) AS r_sum,
      |  CAST(SUM(CASE WHEN g.i % 3 = 1 THEN (doc_id*37 + g.i*11) % 256 END) AS BIGINT) AS g_sum,
      |  CAST(SUM(CASE WHEN g.i % 3 = 2 THEN (doc_id*37 + g.i*11) % 256 END) AS BIGINT) AS b_sum
      |FROM documents
      |JOIN generate_series(0, 6720) g(i)
      |  ON g.i < 3 * (8 + doc_id % 13 * 4) * (8 + doc_id % 9 * 4)
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  /** q243: WARC → HTTP → HTML → text, the crawl-ingest front door — every
    * web corpus starts as gzip-member-per-record WARC (the Common Crawl
    * convention). Executors wrap each document's REAL text in synthetic
    * HTML boilerplate (script/style/comment/entity noise that must NOT
    * survive extraction), frame it as an HTTP/1.1 response inside a
    * validating WARC record, gzip member-per-record via [[graft.operators
    * .Deflate]], then parse ALL layers back (gzip CRC-32/ISIZE per
    * member, WARC version/headers/Content-Length framing, HTTP splitter)
    * and strip the HTML with the codegen'd
    * [[graft.functions.TextFunctions.htmlToText]] regexp chain. The
    * decoded text's md5/byte-length are graded against the oracle's view
    * of the ORIGINAL text: any defect in any layer — compression, WARC
    * framing, HTTP split, tag/entity/whitespace handling — mismatches.
    * Payload-bounded map work, no shuffle; the q237 posture.
    */
  def warcExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    documents(spark, dir).select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val html =
          s"""<html><head><title></title><script type="text/javascript">var x = $id; if (x < 2 && x > 0) { x = x << 1; }</script><style>p { color: red; }</style></head><body><!-- synthetic crawl $id --><p>""" +
            text + "</p><div>&nbsp;</div></body></html>"
        val warc = graft.operators.Warc.buildWarcGz(Seq(
          graft.operators.Warc.buildRecord("warcinfo", s"<urn:uuid:$id-info>", None,
            "software: graft-crawler\r\n".getBytes("UTF-8")),
          graft.operators.Warc.buildRecord("response", s"<urn:uuid:$id-resp>",
            Some(s"http://synthetic.test/doc/$id"),
            graft.operators.Warc.buildHttpResponse("text/html",
              html.getBytes("UTF-8")))))
        val recs = graft.operators.Warc.parseWarcGz(warc)
        val resp = recs.filter(_.warcType == "response")
        require(resp.size == 1, s"doc $id: expected 1 response record")
        val http = graft.operators.Warc.parseHttpResponse(resp.head.payload)
        (id, recs.size, http.status, new String(http.body, "UTF-8"))
      }.toDF("doc_id", "n_records", "resp_status", "html")
      .select(col("doc_id"), col("n_records"), col("resp_status"),
        graft.functions.TextFunctions.htmlToText(col("html")).as("extracted"))
      .select(col("doc_id"), col("n_records"), col("resp_status"),
        octet_length(col("extracted")).cast("long").as("n_bytes"),
        md5(col("extracted").cast("binary")).as("md5_hex"))
      .orderBy(col("doc_id"))
  }

  val warcExtractSql: String =
    """SELECT doc_id, CAST(2 AS INTEGER) AS n_records,
      |  CAST(200 AS INTEGER) AS resp_status,
      |  octet_length(text::BLOB) AS n_bytes, md5(text) AS md5_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q245: link-density main-content extraction
    * ([[graft.operators.ContentExtract]]) — the boilerplate-REMOVAL step
    * q243's tag stripping cannot do: the synthetic page wraps the
    * document's REAL text in a nav bar, a related-links rail, a footer
    * (all mostly anchor text — tag stripping alone would KEEP their
    * words), and a too-short junk block; only the prose block survives
    * the (minChars, maxDensity) gate. The md5 grade against the original
    * text fails if any boilerplate word leaks through or any prose word
    * is lost — i.e. it grades the density logic itself, not just tag
    * removal. Payload-bounded map work, the q243 posture.
    */
  def contentExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    documents(spark, dir).select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val html =
          s"""<div class="nav"><a href="/">home page link</a> <a href="/about">about us link text</a> <a href="/contact">contact page</a></div>""" +
            s"""<p>$text</p>""" +
            """<div>tiny</div>""" +
            s"""<aside><a href="/r/$id">related article number one</a> <a href="/r/${id + 1}">related article number two</a></aside>""" +
            """<footer><a href="/terms">terms of use</a> <a href="/privacy">privacy policy</a> copyright line</footer>"""
        val main = graft.operators.ContentExtract.mainText(html)
        val kept = graft.operators.ContentExtract.keptBlocks(html)
        (id, kept, main)
      }.toDF("doc_id", "blocks_kept", "extracted")
      .select(col("doc_id"), col("blocks_kept"),
        octet_length(col("extracted")).cast("long").as("n_bytes"),
        md5(col("extracted").cast("binary")).as("md5_hex"))
      .orderBy(col("doc_id"))
  }

  val contentExtractSql: String =
    """SELECT doc_id, CAST(1 AS INTEGER) AS blocks_kept,
      |  octet_length(text::BLOB) AS n_bytes, md5(text) AS md5_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q248: LZ4 block roundtrip over the REAL corpus text — the
    * byte-oriented LZ77 codec beside q237's bit-oriented DEFLATE, and the
    * format Spark itself defaults to for shuffle compression. Built from
    * the public block-format spec ([[graft.operators.Lz4]]); Lz4Spec
    * cross-validates BOTH directions against the `lz4-java` library on
    * Spark's own classpath (incl. its high-compression encoder). Same
    * grade contract as q237: decoded md5/byte-length vs the oracle's
    * original — any sequence/offset/length defect mismatches or throws
    * typed. Payload-linear map work, no shuffle.
    */
  def lz4Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    documents(spark, dir).select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val dec = graft.operators.Lz4.decompress(graft.operators.Lz4.compress(raw))
        (id, new String(dec, "UTF-8"))
      }.toDF("doc_id", "decoded")
      .select(col("doc_id"),
        octet_length(col("decoded")).cast("long").as("n_bytes"),
        md5(col("decoded").cast("binary")).as("md5_hex"))
      .orderBy(col("doc_id"))
  }

  val lz4RoundtripSql: String =
    """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS md5_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_lz4_roundtrip" -> lz4Roundtrip,
    "q245_content_extract" -> contentExtract,
    "q243_warc_extract" -> warcExtract,
    "q238_png_decode" -> pngDecode,
    "q237_gzip_roundtrip" -> gzipRoundtrip,
    "q189_mp3_walk"  -> mp3Walk,
    "q190_h264_walk" -> h264Walk,
    "q201_gif_decode" -> gifDecode,
    "q230_flac_decode" -> flacDecode,
    "q232_audio_features" -> audioFeatures,
    "q234_binary_ingest" -> binaryIngest,
  )

  val oracles: Map[String, String] = Map(
    "q248_lz4_roundtrip" -> lz4RoundtripSql,
    "q245_content_extract" -> contentExtractSql,
    "q243_warc_extract" -> warcExtractSql,
    "q238_png_decode" -> pngDecodeSql,
    "q237_gzip_roundtrip" -> gzipRoundtripSql,
    "q189_mp3_walk"  -> mp3WalkSql,
    "q190_h264_walk" -> h264WalkSql,
    "q201_gif_decode" -> gifDecodeSql,
    "q230_flac_decode" -> flacDecodeSql,
    "q232_audio_features" -> audioFeaturesSql,
    "q234_binary_ingest" -> binaryIngestSql,
  )
}
