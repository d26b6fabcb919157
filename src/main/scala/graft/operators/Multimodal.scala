package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus partition-parallel feature extraction.
  *
  * Decode is REAL for every modality on the [[realMedia]] path: P6 PPM
  * images, PCM16 WAV audio, and Y4M (YUV4MPEG2) video are parsed inside
  * executors with no codec dependency ([[MediaFormats]]), and the
  * COMPRESSED image path is real too — [[Jpeg]] implements baseline
  * grayscale JPEG end-to-end (huffman entropy coding, dequant, IDCT),
  * oracle-graded by q73. Only the remaining compressed A/V codecs
  * (MP3/H.264 — absent from this container) stay behind the documented
  * [[MediaCodec.decode]] identity stub; swapping a real codec in changes
  * zero plan shape.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the multimodal schema). */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Extracted features per media row. */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           byte_mean: Double, byte_entropy: Double, frames_sampled: Int)

  /** The codec seam. `decode` is the single stub: deterministic fake that
    * "decodes" a payload into raw bytes (identity). Swap for a real codec
    * (JPEG/PNG/PCM) in production — the seam is the only change point.
    */
  object MediaCodec {
    /** STUB: real impl would decode JPEG/PNG/audio frames. Deterministic
      * identity keeps the pipeline testable offline.
      */
    def decode(modality: String, payload: Array[Byte]): Array[Byte] = payload

    /** STUB: frame sampling — real impl samples video frames at a stride;
      * the fake derives a deterministic count from payload size.
      */
    def sampleFrames(modality: String, payload: Array[Byte], stride: Int): Int =
      if (modality == "video") math.max(1, payload.length / math.max(1, stride)) else 1
  }

  /** Synthesize a media table from the documents corpus: payload = UTF-8
    * bytes (deterministic), modality round-robins image/audio/video, with
    * plausible metadata. This is the fixture generator for offline tests.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
      (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).as("sample_rate"),
    ).as[MediaRow]
  }

  /** Partition-parallel feature extraction — the Scala analogue of a
    * pandas-batch UDF (`mapInPandas`): rows are processed in fixed-size
    * batches per partition (the Arrow-batch shape — a real codec would
    * amortize model/decoder setup per batch), no driver collection, the
    * decode stub invoked inside executors.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup seam (codec/model init would live here)
        batch.iterator.map { r =>
        val decoded = MediaCodec.decode(r.modality, r.payload)
        val n = decoded.length.toLong
        val mean = if (n == 0) 0.0 else decoded.map(b => (b & 0xff).toDouble).sum / n
        val hist = new Array[Long](256)
        decoded.foreach(b => hist(b & 0xff) += 1)
        val entropy = if (n == 0) 0.0 else hist.filter(_ > 0).map { c =>
          val p = c.toDouble / n
          -p * math.log(p) / math.log(2)
        }.sum
        MediaFeatures(r.media_id, r.modality, n, mean, entropy,
          MediaCodec.sampleFrames(r.modality, decoded, 1024))
        }
      }
    }
  }

  /** Resize plumbing stub for the SYNTHETIC media table (opaque payloads):
    * carries the metadata transform (dims change, payload untouched) so
    * downstream schema logic is exercised. The REAL resize over PPM
    * payloads is [[resizeImages]].
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => if (r.modality == "image") r.copy(width = w, height = h) else r)
  }

  /** REAL image resize over the [[realMedia]] table: PPM payloads are
    * decoded, nearest-neighbor-resampled ([[MediaFormats.resizePpm]]),
    * and re-encoded; non-image rows pass through untouched. Fully
    * integer sampling, so q79's oracle recomputes the resampled plane
    * in closed form.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality == "image") {
        val dst = MediaFormats.resizePpm(MediaFormats.parsePpm(r.payload), w, h)
        r.copy(payload = MediaFormats.encodePpm(dst), width = w, height = h)
      } else r
    }
  }

  /** REAL-format media table: image payloads are valid binary PPMs, audio
    * payloads valid PCM16 WAVs, video payloads valid Y4M streams (all
    * built + parsed by [[MediaFormats]] with no codec dependency).
    * Dims/rates/frame counts derive from doc_id so the decode output is
    * oracle-computable.
    */
  def realMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, _) =>
      val modality = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = ((id % 16) * 4 + 16).toInt
      val h = ((id % 9) * 4 + 16).toInt
      val nSamples = (400 + id % 100).toInt
      val payload = modality match {
        case "image" => MediaFormats.buildPpm(id, w, h)
        case "audio" => MediaFormats.buildWav(id, 16000, nSamples)
        case _       => MediaFormats.buildY4m(id, w, h, nFrames = (2 + id % 4).toInt,
                          fpsNum = (24 + id % 2).toInt, fpsDen = 1)
      }
      MediaRow(id, modality, payload,
        if (modality == "image") w else 0,
        if (modality == "image") h else 0,
        if (modality == "audio") 16000 else 0)
    }
  }

  /** Decoded per-row features (the REAL decode path): dimensions, sample
    * counts and signal means come from PARSING the binary payload inside
    * executors, never from the metadata columns. Exact integer sums with
    * one final division keep the means cross-engine deterministic.
    */
  case class DecodedFeatures(media_id: Long, modality: String,
                             parsed_width: Int, parsed_height: Int,
                             n_samples: Int, duration_ms: Double,
                             signal_mean: Double)

  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          r.modality match {
            case "image" =>
              val p = MediaFormats.parsePpm(r.payload)
              var s = 0L; var i = 0
              while (i < p.pixels.length) { s += (p.pixels(i) & 0xff); i += 1 }
              DecodedFeatures(r.media_id, r.modality, p.width, p.height, 0, 0.0,
                s.toDouble / p.pixels.length)
            case "audio" =>
              val wv = MediaFormats.parseWav(r.payload)
              var s = 0L; var i = 0
              while (i < wv.samples.length) { s += wv.samples(i); i += 1 }
              DecodedFeatures(r.media_id, r.modality, 0, 0, wv.samples.length,
                wv.samples.length * 1000.0 / wv.sampleRate,
                s.toDouble / wv.samples.length)
            case _ => // video: parse the Y4M container, frames as "samples"
              val v = MediaFormats.parseY4m(r.payload)
              DecodedFeatures(r.media_id, r.modality, v.width, v.height,
                v.frames.length,
                v.frames.length * 1000.0 * v.fpsDen / v.fpsNum,
                v.lumaMean)
          }
        }
      }
    }
  }
}
