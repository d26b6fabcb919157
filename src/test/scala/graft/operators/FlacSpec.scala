package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec contract ([[Flac]]): bit-exact lossless round trips through
  * every subframe type the encoder can choose (constant, verbatim, fixed
  * 0–4, LPC), wasted-bits detection, the Rice escape, multi-frame streams
  * with UTF-8-coded frame numbers, and typed failures on corruption
  * (magic, CRC-8, CRC-16, MD5, truncation) — the q201 GIF contract
  * applied to compressed audio.
  */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(samples: Array[Int], sr: Int = 16000, bps: Int = 16,
                        block: Int = 4096): Flac.FlacStream = {
    val bytes = Flac.encodeFlac(samples, sr, bps, block)
    val dec = Flac.decodeFlac(bytes)
    assert(dec.sampleRate == sr)
    assert(dec.bitsPerSample == bps)
    assert(dec.samples.toSeq == samples.toSeq, "PCM must round-trip bit-exactly")
    dec
  }

  test("constant block → CONSTANT subframe, exact round trip") {
    val (bytes, stats) = Flac.encodeFlacWithStats(Array.fill(500)(1234), 8000)
    assert(stats.subframeTypes == Seq("constant"))
    assert(Flac.decodeFlac(bytes).samples.forall(_ == 1234))
    roundTrip(Array.fill(300)(0)) // all-zero block too
    roundTrip(Array.fill(300)(-32768)) // most negative 16-bit value
  }

  test("linear ramp → a fixed predictor wins; exact round trip") {
    val ramp = Array.tabulate(2000)(i => i * 3 - 700)
    val (bytes, stats) = Flac.encodeFlacWithStats(ramp, 16000)
    assert(stats.subframeTypes.forall(_.startsWith("fixed")),
      s"expected fixed predictors, got ${stats.subframeTypes}")
    assert(Flac.decodeFlac(bytes).samples.toSeq == ramp.toSeq)
    // the compressed stream must actually compress a predictable signal
    assert(bytes.length < ramp.length * 2 / 4,
      s"ramp compressed to ${bytes.length} of ${ramp.length * 2} PCM bytes")
  }

  test("each fixed order 0-4 round-trips (polynomial signals)") {
    // order-k polynomials have zero order-k residuals — shaped to each
    for (k <- 0 to 4) {
      val sig = Array.tabulate(600) { i =>
        val x = i % 40 // bounded so higher powers stay in 16 bits
        k match {
          case 0 => 7
          case 1 => 5 * x - 90
          case 2 => x * x - 800
          case 3 => x * x * x / 4 - 2000
          case 4 => x * x * x * x / 100 - 9000
        }
      }
      roundTrip(sig)
    }
  }

  test("sinusoid → LPC wins over fixed; exact round trip") {
    // period-6 sinusoid: x(i) = 2cos(60°)x(i-1) - x(i-2) = x(i-1) - x(i-2),
    // which fixed order 2 (coefficients 2,-1) predicts badly and a 2-tap
    // LPC predicts almost exactly
    val sine = Array.tabulate(3000)(i => (2000 * math.sin(math.Pi * i / 3)).toInt)
    val (bytes, stats) = Flac.encodeFlacWithStats(sine, 16000)
    assert(stats.subframeTypes.exists(_.startsWith("lpc")),
      s"expected an LPC subframe, got ${stats.subframeTypes}")
    assert(Flac.decodeFlac(bytes).samples.toSeq == sine.toSeq)
  }

  test("incompressible extremes → VERBATIM; exact round trip") {
    // full-range LCG noise: every predictor's residuals cost >= 16 bits
    var s = 12345
    val noise = Array.tabulate(800) { _ =>
      s = (s * 1103515245 + 12345) & 0x7FFFFFFF
      (s % 65536) - 32768
    }
    val (bytes, stats) = Flac.encodeFlacWithStats(noise, 44100)
    assert(stats.subframeTypes.contains("verbatim"),
      s"expected verbatim for white noise, got ${stats.subframeTypes}")
    assert(Flac.decodeFlac(bytes).samples.toSeq == noise.toSeq)
  }

  test("wasted bits: samples sharing k low zero bits are shifted out and restored") {
    val ramp8 = Array.tabulate(1000)(i => (i * 3 - 500) * 8) // 3 wasted bits
    val plain = Flac.encodeFlac(Array.tabulate(1000)(i => i * 3 - 500), 16000)
    val shifted = Flac.encodeFlac(ramp8, 16000)
    assert(Flac.decodeFlac(shifted).samples.toSeq == ramp8.toSeq)
    // the wasted-bits path must not cost more than the unshifted signal
    assert(shifted.length <= plain.length + 16,
      s"wasted-bits stream ${shifted.length} vs unshifted ${plain.length}")
  }

  test("Rice escape: outlier-free wide residuals pick the raw encoding and round-trip") {
    val res = Array.tabulate(64)(i => if (i % 2 == 0) 30000L else -30000L)
    val (_, param, _) = Flac.riceCostForTest(res)
    assert(param == 15, s"expected the escape parameter, got $param")
    assert(Flac.riceRoundTrip(res, res.length, 0).toSeq == res.toSeq)
    // geometric-ish residuals (mostly tiny, rare spikes) stay on ordinary
    // Rice — the distribution Rice is optimal for — and still round-trip
    val small = Array.tabulate(64)(i => if (i % 16 == 0) 9L else (i % 3 - 1).toLong)
    assert(Flac.riceCostForTest(small)._2 < 15)
    assert(Flac.riceRoundTrip(small, small.length, 0).toSeq == small.toSeq)
  }

  test("multi-frame stream with 2-byte UTF-8 frame numbers (>=128 frames)") {
    val sig = Array.tabulate(16 * 140)(i => (i % 200) - 100)
    val dec = roundTrip(sig, block = 16)
    assert(dec.nFrames == 140)
  }

  test("8-bit and 24-bit sample widths round-trip") {
    roundTrip(Array.tabulate(500)(i => (i % 200) - 100), bps = 8)
    roundTrip(Array.tabulate(500)(i => (i * 911) % 8000000 - 4000000), bps = 24)
  }

  test("corruption is a typed failure: magic, header CRC-8, frame CRC-16, MD5, truncation") {
    val good = Flac.encodeFlac(Array.tabulate(700)(i => i % 256 - 128), 8000)
    def corrupt(at: Int): Array[Byte] = {
      val b = good.clone(); b(at) = (b(at) ^ 0x01).toByte; b
    }
    intercept[IllegalArgumentException](Flac.decodeFlac(corrupt(0))) // magic
    // locate the first frame: right after fLaC(4) + header(4) + STREAMINFO(34)
    val frameStart = 4 + 4 + 34
    assert((good(frameStart) & 0xFF) == 0xFF, "frame sync must start here")
    // flip a bit inside the frame header → CRC-8 mismatch (or sync break)
    intercept[IllegalArgumentException](Flac.decodeFlac(corrupt(frameStart + 2)))
    // flip a bit late in the stream → frame CRC-16 mismatch
    intercept[IllegalArgumentException](Flac.decodeFlac(corrupt(good.length - 3)))
    // truncation
    intercept[IllegalArgumentException](Flac.decodeFlac(good.take(good.length - 4)))
    intercept[IllegalArgumentException](Flac.decodeFlac(good.take(20)))
    // MD5 mismatch: rewrite the stored MD5 (bytes 4+4+18 .. +16)
    val badMd5 = good.clone(); badMd5(4 + 4 + 18) = (badMd5(4 + 4 + 18) ^ 0xFF).toByte
    intercept[IllegalArgumentException](Flac.decodeFlac(badMd5))
  }

  test("property: arbitrary PCM round-trips bit-exactly across widths and block sizes") {
    // raw ScalaCheck generators with fixed seeds (scalatestplus isn't in
    // the offline dependency set) — the PropertySpec convention
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      bps <- Gen.oneOf(8, 12, 16, 24)
      n <- Gen.choose(1, 3000)
      block <- Gen.oneOf(16, 64, 192, 577, 4096)
      shape <- Gen.oneOf("noise", "ramp", "sine", "steps", "shifted")
      seed <- Gen.choose(1, 1 << 30)
    } yield (bps, n, block, shape, seed)
    (0 until 40).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1234L + i)))
      .foreach { case (bps, n, block, shape, seed) =>
        val lim = (1 << (bps - 1)) - 1
        var s = seed
        def rnd(): Int = { s = (s * 1103515245 + 12345) & 0x7FFFFFFF; s }
        val pcm = Array.tabulate(n) { i =>
          val v = shape match {
            case "noise" => rnd() % (lim + 1) * (if (rnd() % 2 == 0) 1 else -1)
            case "ramp" => (i * 7 - n) % (lim + 1)
            case "sine" => (lim * 0.7 * math.sin(0.21 * i)).toInt
            case "steps" => (i / 50) % 5 * (lim / 8) - lim / 4
            case "shifted" => ((i * 3 - 500) % (lim / 8 + 1)) * 8
          }
          math.max(-lim - 1, math.min(lim, v))
        }
        val dec = Flac.decodeFlac(Flac.encodeFlac(pcm, 16000, bps, block))
        assert(dec.samples.toSeq == pcm.toSeq,
          s"round-trip mismatch: bps=$bps n=$n block=$block shape=$shape seed=$seed")
        assert(dec.nFrames == (n + block - 1) / block)
      }
  }

  test("levinson-durbin recovers a 2-tap resonator's coefficients") {
    val sine = Array.tabulate(4000)(i => (8000 * math.sin(0.3 * i)).toInt)
    val c = Flac.levinsonDurbin(sine, 2)
    // x(i) ≈ 2cos(0.3)x(i-1) − x(i-2)
    assert(math.abs(c(0) - 2 * math.cos(0.3)) < 0.01, s"c0=${c(0)}")
    assert(math.abs(c(1) + 1.0) < 0.01, s"c1=${c(1)}")
  }
}
