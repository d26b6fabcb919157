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

  test("resizePpm: nearest-neighbor grid, exact on integer upsample/downsample") {
    // 2x2 source upsampled 2x: each source pixel becomes a 2x2 block
    val src = MediaFormats.Ppm(2, 2, Array.tabulate(12)(i => (i * 10).toByte))
    val up = MediaFormats.resizePpm(src, 4, 4)
    assert(up.width == 4 && up.height == 4 && up.pixels.length == 48)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      assert(up.pixels((y * 4 + x) * 3 + c) == src.pixels(((y / 2) * 2 + x / 2) * 3 + c))
    // downsample back recovers the even-grid source pixels (NN picks (0,0) of each block)
    val down = MediaFormats.resizePpm(up, 2, 2)
    assert(down.pixels.sameElements(src.pixels))
  }

  test("resizeImages resamples PPM payloads for real (parseable, thumbnail dims)") {
    val rm = Multimodal.realMedia(spark, Tables.documents(spark, sf))
    val out = Multimodal.resizeImages(rm, 16, 16).collect()
    out.filter(_.modality == "image").take(5).foreach { r =>
      val p = MediaFormats.parsePpm(r.payload)
      assert(p.width == 16 && p.height == 16 && r.width == 16 && r.height == 16)
      // spot-check the NN mapping against the generator formula
      val sw = ((r.media_id % 16) * 4 + 16).toInt
      val sh = ((r.media_id % 9) * 4 + 16).toInt
      for (i <- Seq(0, 100, 767)) {
        val y = i / 48; val x = (i % 48) / 3; val c = i % 3
        val srcIdx = ((y * sh / 16) * sw + (x * sw / 16)) * 3 + c
        assert((p.pixels(i) & 0xFF) == MediaFormats.pixelByte(r.media_id, srcIdx))
      }
    }
    out.filter(_.modality != "image").take(3).foreach { r =>
      assert(r.width != 16 || r.height != 16 || r.payload.nonEmpty) // untouched rows survive
    }
  }

  test("PPM and WAV round-trip: build → parse recovers dims/rate/signal") {
    val ppm = MediaFormats.buildPpm(42L, 20, 12)
    val img = MediaFormats.parsePpm(ppm)
    assert(img.width == 20 && img.height == 12 && img.pixels.length == 20 * 12 * 3)
    (0 until 10).foreach(i =>
      assert((img.pixels(i) & 0xff) == MediaFormats.pixelByte(42L, i)))
    val wav = MediaFormats.buildWav(7L, 16000, 123)
    val aud = MediaFormats.parseWav(wav)
    assert(aud.sampleRate == 16000 && aud.samples.length == 123)
    (0 until 10).foreach(i =>
      assert(aud.samples(i) == MediaFormats.pcmSample(7L, i)))
  }

  test("decodeFeatures parses REAL payloads in executors (dims from bytes)") {
    val rm = Multimodal.realMedia(spark, Tables.documents(spark, sf))
    val feats = Multimodal.decodeFeatures(rm).collect()
    assert(feats.nonEmpty)
    feats.filter(_.modality == "image").take(20).foreach { f =>
      assert(f.parsed_width == (f.media_id % 16) * 4 + 16)
      assert(f.parsed_height == (f.media_id % 9) * 4 + 16)
    }
    feats.filter(_.modality == "audio").take(20).foreach { f =>
      assert(f.n_samples == 400 + f.media_id % 100)
      assert(math.abs(f.duration_ms - f.n_samples * 1000.0 / 16000) < 1e-9)
    }
    // video: dims, frame count and fps all come from parsing the Y4M bytes
    val vids = feats.filter(_.modality == "video")
    assert(vids.nonEmpty)
    vids.take(20).foreach { f =>
      assert(f.parsed_width == (f.media_id % 16) * 4 + 16)
      assert(f.parsed_height == (f.media_id % 9) * 4 + 16)
      assert(f.n_samples == 2 + f.media_id % 4)
      val fps = 24 + f.media_id % 2
      assert(math.abs(f.duration_ms - f.n_samples * 1000.0 / fps) < 1e-9)
      assert(f.signal_mean > 0)
    }
  }

  test("Y4M round-trip: build → parse recovers dims/fps/frames/luma") {
    val y4m = MediaFormats.buildY4m(11L, 20, 12, nFrames = 3, fpsNum = 25, fpsDen = 1)
    val v = MediaFormats.parseY4m(y4m)
    assert(v.width == 20 && v.height == 12)
    assert(v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.frames.length == 3)
    val frameSize = 20 * 12 * 3 / 2
    v.frames.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.length == frameSize)
      (0 until 10).foreach { i =>
        assert((fr(i) & 0xff) == MediaFormats.pixelByte(11L, f.toLong * frameSize + i))
      }
    }
    // luma mean = exact mean of the first w*h bytes of each frame
    val expected = {
      var s = 0L
      (0 until 3).foreach { f =>
        (0 until 20 * 12).foreach(i => s += MediaFormats.pixelByte(11L, f.toLong * frameSize + i))
      }
      s.toDouble / (3 * 20 * 12)
    }
    assert(math.abs(v.lumaMean - expected) < 1e-12)
    // odd dims are rejected (C420 chroma subsampling needs even planes)
    intercept[IllegalArgumentException](MediaFormats.buildY4m(1L, 7, 8, 1, 25, 1))
  }

  test("property: Y4M round-trip over random ids/dims/frames/rates") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      id <- Gen.chooseNum(0L, 1000000L)
      w  <- Gen.chooseNum(1, 64).map(_ * 2) // even
      h  <- Gen.chooseNum(1, 36).map(_ * 2)
      nf <- Gen.chooseNum(1, 6)
      num <- Gen.oneOf(24, 25, 30, 30000)
      den <- Gen.oneOf(1, 1001)
    } yield (id, w, h, nf, num, den)
    (0 until 25).foreach { i =>
      val (id, w, h, nf, num, den) =
        gen.apply(Gen.Parameters.default, Seed(9000L + i)).get
      val v = MediaFormats.parseY4m(MediaFormats.buildY4m(id, w, h, nf, num, den))
      assert(v.width == w && v.height == h, s"dims case $i")
      assert(v.fpsNum == num && v.fpsDen == den, s"fps case $i")
      assert(v.frames.length == nf && v.frames.forall(_.length == w * h * 3 / 2),
        s"frames case $i")
      // every byte of every plane round-trips (pixelByte over global index)
      val fsz = w * h * 3 / 2
      v.frames.zipWithIndex.foreach { case (fr, f) =>
        var j = 0
        while (j < fsz) {
          assert((fr(j) & 0xff) == MediaFormats.pixelByte(id, f.toLong * fsz + j),
            s"byte $j frame $f case $i")
          j += 1
        }
      }
    }
  }
}
