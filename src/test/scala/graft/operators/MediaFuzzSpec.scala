package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Adversarial fuzz for the executor-side media parsers (round-6 verdict
  * task 6): parsePpm/parseWav/parseY4m run on untrusted bytes, so every
  * truncated or corrupted payload must either parse or raise a TYPED
  * IllegalArgumentException — never BufferUnderflow/NumberFormat/
  * MatchError, never an allocation driven by a declared (unvalidated)
  * header dimension, never a hang. Uses raw ScalaCheck generators with
  * fixed seeds (scalatestplus isn't in the offline dependency set),
  * mirroring PropertySpec.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 40): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  /** A parse attempt may succeed or fail with IllegalArgumentException;
    * anything else (underflow, NFE, MatchError, OOM) fails the test.
    */
  private def parsesOrRejects[A](what: String)(body: => A): Unit =
    try { body; () } catch {
      case _: IllegalArgumentException => ()
      case e: Throwable => fail(s"$what raised untyped ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private val ppmGen = for {
    id <- Gen.choose(1L, 1000000L)
    w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
  } yield (id, MediaFormats.buildPpm(id, w, h), w, h)

  private val wavGen = for {
    id <- Gen.choose(1L, 1000000L)
    rate <- Gen.oneOf(8000, 16000, 44100)
    n <- Gen.choose(0, 400)
  } yield (id, MediaFormats.buildWav(id, rate, n), rate, n)

  private val y4mGen = for {
    id <- Gen.choose(1L, 1000000L)
    w <- Gen.choose(1, 12).map(_ * 2); h <- Gen.choose(1, 12).map(_ * 2)
    f <- Gen.choose(0, 5)
  } yield (id, MediaFormats.buildY4m(id, w, h, f, 30, 1), w, h, f)

  test("round-trip: parse inverts build for all three formats") {
    samples(ppmGen).foreach { case (_, bytes, w, h) =>
      val p = MediaFormats.parsePpm(bytes)
      assert(p.width == w && p.height == h && p.pixels.length == w * h * 3)
    }
    samples(wavGen).foreach { case (_, bytes, rate, n) =>
      val p = MediaFormats.parseWav(bytes)
      assert(p.sampleRate == rate && p.samples.length == n)
    }
    samples(y4mGen).foreach { case (_, bytes, w, h, f) =>
      val p = MediaFormats.parseY4m(bytes)
      assert(p.width == w && p.height == h && p.frames.length == f)
      p.frames.foreach(fr => assert(fr.length == w * h * 3 / 2))
    }
  }

  test("every truncation of a valid payload parses or rejects typed") {
    val cut = for {
      payload <- Gen.oneOf(ppmGen.map(_._2), wavGen.map(_._2), y4mGen.map(_._2))
      at <- Gen.choose(0, payload.length)
    } yield payload.take(at)
    samples(cut, 120).foreach { bytes =>
      parsesOrRejects("parsePpm")(MediaFormats.parsePpm(bytes))
      parsesOrRejects("parseWav")(MediaFormats.parseWav(bytes))
      parsesOrRejects("parseY4m")(MediaFormats.parseY4m(bytes))
    }
  }

  test("single-byte corruption parses or rejects typed") {
    val corrupt = for {
      payload <- Gen.oneOf(ppmGen.map(_._2), wavGen.map(_._2), y4mGen.map(_._2))
      at <- Gen.choose(0, payload.length - 1)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield { val c = payload.clone(); c(at) = b; c }
    samples(corrupt, 120).foreach { bytes =>
      parsesOrRejects("parsePpm")(MediaFormats.parsePpm(bytes))
      parsesOrRejects("parseWav")(MediaFormats.parseWav(bytes))
      parsesOrRejects("parseY4m")(MediaFormats.parseY4m(bytes))
    }
  }

  test("huge declared dimensions reject before allocating") {
    // a 50000x50000 PPM header over a 12-byte body would previously
    // allocate 7.5 GB in copyOfRange; must now reject on the bound check
    val hugePpm = "P6\n50000 50000\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(1.toByte)
    intercept[IllegalArgumentException](MediaFormats.parsePpm(hugePpm))
    // dims that overflow w*h*3 into a small/negative Int must still reject
    val overflowPpm = "P6\n46341 46341 \n255\n".getBytes("US-ASCII") ++ Array.fill(64)(1.toByte)
    intercept[IllegalArgumentException](MediaFormats.parsePpm(overflowPpm))
    val hugeY4m = "YUV4MPEG2 W40000 H40000 F30:1 Ip A1:1 C420jpeg\nFRAME\n"
      .getBytes("US-ASCII") ++ Array.fill(12)(1.toByte)
    intercept[IllegalArgumentException](MediaFormats.parseY4m(hugeY4m))
    // a WAV data chunk declaring ~2 GB over a 4-byte body must not allocate
    val buf = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(48).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(Int.MaxValue - 7)
      .putInt(0)
    intercept[IllegalArgumentException](MediaFormats.parseWav(buf.array()))
    // negative declared chunk length must reject, not seek backwards
    val neg = buf.array().clone()
    val negBuf = java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    negBuf.putInt(40, -44) // overwrite the data length field (offset 40)
    intercept[IllegalArgumentException](MediaFormats.parseWav(neg))
  }

  test("garbage headers reject typed (no NumberFormat/MatchError leaks)") {
    intercept[IllegalArgumentException](
      MediaFormats.parseY4m("YUV4MPEG2 Wx Hy F30 Ip\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      MediaFormats.parseY4m("YUV4MPEG2 W4 H4 F30 Ip\n".getBytes("US-ASCII"))) // fps missing colon
    intercept[IllegalArgumentException](
      MediaFormats.parseY4m("YUV4MPEG2 W99999999 H99999999 F30:1\nFRAME\n".getBytes("US-ASCII")))
    // …but a zero-frame stream with huge declared dims is a valid stream
    assert(MediaFormats.parseY4m(
      "YUV4MPEG2 W99999998 H99999998 F30:1\n".getBytes("US-ASCII")).frames.isEmpty)
    intercept[IllegalArgumentException](MediaFormats.parsePpm("P7\n1 1\n255\nxxx".getBytes))
    intercept[IllegalArgumentException](MediaFormats.parseWav("RIFX....".getBytes))
  }
}
