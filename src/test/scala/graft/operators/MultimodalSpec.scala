package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf)).cache()

  test("media schema: binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(sch("modality").dataType == org.apache.spark.sql.types.StringType)
    assert(media.select("modality").distinct().count() == 3)
  }

  test("feature extraction runs partition-parallel and is deterministic") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media.repartition(5)).orderBy("media_id").collect()
    assert(f1.toSeq == f2.toSeq)
    // batch size is a pure chunking knob — results identical
    val f3 = Multimodal.extractFeatures(media, batchSize = 7).orderBy("media_id").collect()
    assert(f1.toSeq == f3.toSeq)
    assert(f1.forall(_.n_bytes > 0))
    // entropy of ASCII text payloads: bounded by log2(alphabet)
    assert(f1.forall(f => f.byte_entropy >= 0 && f.byte_entropy <= 8))
  }

  test("byte stats match a driver-side reference for one row") {
    val row = media.filter($"media_id" === 0).head()
    val feats = Multimodal.extractFeatures(media.filter($"media_id" === 0)).head()
    val bytes = row.payload
    val mean = bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    assert(math.abs(feats.byte_mean - mean) < 1e-12)
    assert(feats.n_bytes == bytes.length)
  }

  test("video rows sample multiple frames, others one") {
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.filter(_.modality != "video").forall(_.frames_sampled == 1))
    assert(f.filter(_.modality == "video").forall(_.frames_sampled >= 1))
  }

  test("resize touches only image metadata, payload untouched") {
    val out = Multimodal.resize(media, 64, 64).collect()
    val in = media.collect().map(r => r.media_id -> r).toMap
    out.foreach { r =>
      if (r.modality == "image") { assert(r.width == 64 && r.height == 64) }
      else assert(r.width == in(r.media_id).width)
      assert(java.util.Arrays.equals(r.payload, in(r.media_id).payload))
    }
  }
}
