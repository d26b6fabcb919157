package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the MP3 frame walk that q189 grades: formula agreement across ids,
  * ID3v2 syncsafe handling, and typed rejection of malformed streams
  * (truncation, bad sync, reserved table indices, mid-stream samplerate
  * changes) — never a hang or over-read.
  */
class Mp3Spec extends AnyFunSuite {
  import Mp3._

  test("walk agrees with the generator formulas across ids") {
    for (id <- 0L until 400L) {
      val bytes = buildMp3(id)
      val info = parseMp3(bytes)
      assert(info.tagBytes == 10 + tagBodyLen(id))
      assert(info.nFrames == frameCount(id))
      assert(info.sampleRate == SampleRateHz(srIndex(id)))
      val expAudio = (0 until frameCount(id)).map(frameLen(id, _).toLong).sum
      assert(info.audioBytes == expAudio)
      assert(info.tagBytes + info.audioBytes == bytes.length,
        "walk must consume the exact stream extent")
      val expKbps = (0 until frameCount(id)).map(f => BitrateKbps(bitrateIndex(id, f)).toLong).sum
      assert(info.kbpsSum == expKbps)
      assert(info.durationMs ==
        (frameCount(id).toLong * SamplesPerFrame * 1000L).toDouble / info.sampleRate)
    }
  }

  test("stream without an ID3 tag parses with tagBytes 0") {
    val full = buildMp3(7L)
    val noTag = full.drop(10 + tagBodyLen(7L))
    val info = parseMp3(noTag)
    assert(info.tagBytes == 0 && info.nFrames == frameCount(7L))
  }

  test("every truncation of a valid stream fails typed, never hangs") {
    val bytes = buildMp3(11L)
    for (cut <- 1 until bytes.length) {
      val t = bytes.take(cut)
      // truncating exactly at a frame boundary inside the walk yields a
      // shorter VALID stream only if at least one whole frame survives
      val boundaryFrames = {
        var acc = 10 + tagBodyLen(11L)
        var n = 0
        while (acc < cut && n < frameCount(11L)) { acc += frameLen(11L, n); n += 1 }
        acc == cut && n >= 1
      }
      if (boundaryFrames) assert(parseMp3(t).nFrames >= 1)
      else intercept[IllegalArgumentException](parseMp3(t))
    }
  }

  test("corrupted sync, reserved indices, and bad syncsafe reject typed") {
    val bytes = buildMp3(3L)
    val tag = 10 + tagBodyLen(3L)
    val badSync = bytes.clone;      badSync(tag) = 0x7F.toByte
    intercept[IllegalArgumentException](parseMp3(badSync))
    val freeBitrate = bytes.clone;  freeBitrate(tag + 2) = (freeBitrate(tag + 2) & 0x0F).toByte
    intercept[IllegalArgumentException](parseMp3(freeBitrate))
    val badBitrate = bytes.clone;   badBitrate(tag + 2) = (badBitrate(tag + 2) | 0xF0).toByte
    intercept[IllegalArgumentException](parseMp3(badBitrate))
    val badSr = bytes.clone;        badSr(tag + 2) = (badSr(tag + 2) | 0x0C).toByte
    intercept[IllegalArgumentException](parseMp3(badSr))
    val mpeg2 = bytes.clone;        mpeg2(tag + 1) = (mpeg2(tag + 1) & ~0x08).toByte
    intercept[IllegalArgumentException](parseMp3(mpeg2))
    val layer1 = bytes.clone;       layer1(tag + 1) = (layer1(tag + 1) | 0x06).toByte
    intercept[IllegalArgumentException](parseMp3(layer1))
    val badSafe = bytes.clone;      badSafe(6) = 0x80.toByte
    intercept[IllegalArgumentException](parseMp3(badSafe))
    intercept[IllegalArgumentException](parseMp3(Array[Byte]('I', 'D', '3')))
    intercept[IllegalArgumentException](parseMp3(Array.fill[Byte](64)(0x55)))
  }

  test("samplerate change mid-stream rejects") {
    // two single-frame streams with different samplerate indices, spliced
    val a = parseMp3OneFrame(0L)
    val b = parseMp3OneFrame(1L) // srIndex differs (0 vs 1)
    intercept[IllegalArgumentException](parseMp3(a ++ b))
  }

  private def parseMp3OneFrame(id: Long): Array[Byte] = {
    val full = buildMp3(id).drop(10 + tagBodyLen(id))
    full.take(frameLen(id, 0))
  }
}
