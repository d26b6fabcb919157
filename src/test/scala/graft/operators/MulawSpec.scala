package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the G.711 μ-law codec algebra that q75 grades: known code points,
  * the encode∘decode identity on the code space, bounded quantization
  * error on the full PCM16 domain, and the WAV container round trip.
  */
class MulawSpec extends AnyFunSuite {
  import MediaFormats._

  test("known μ-law code points") {
    assert(mulawDecode(0xFF) == 0)      // positive zero code
    assert(mulawDecode(0x7F) == 0)      // negative zero code
    assert(mulawDecode(0x80) == 32124)  // largest positive magnitude
    assert(mulawDecode(0x00) == -32124) // largest negative magnitude
    assert(mulawEncode(0) == 0xFF)
    assert(mulawEncode(-1) == 0x7F)
    assert(mulawEncode(32767) == 0x80)  // clips to the top segment
    assert(mulawEncode(-32768) == 0x00)
  }

  test("encode inverts decode on every code (0x7F aliases to 0xFF)") {
    for (b <- 0 until 256) {
      val round = mulawEncode(mulawDecode(b))
      if (b == 0x7F) assert(round == 0xFF) // both zero codes decode to 0; encode picks +0
      else assert(round == b, f"code 0x$b%02x round-tripped to 0x$round%02x")
    }
  }

  test("decode(encode(x)) is within one quantization step across PCM16") {
    var x = -32768
    while (x <= 32767) {
      val y = mulawDecode(mulawEncode(x))
      // largest segment step is 2^(7+3)=1024; clipping at ±32635 adds ≤643
      assert(math.abs(y - x) < 1024, s"x=$x decoded to $y")
      x += 1
    }
  }

  test("μ-law WAV container round trip expands the generator stream") {
    val id = 4242L
    val n = 137
    val wav = parseWav(buildMulawWav(id, 8000, n))
    assert(wav.sampleRate == 8000 && wav.samples.length == n)
    for (i <- 0 until n)
      assert(wav.samples(i) == mulawDecode(mulawByte(id, i)).toShort)
  }

  test("PCM16 WAV path is unchanged by the two-format parser") {
    val id = 7L
    val wav = parseWav(buildWav(id, 16000, 64))
    assert(wav.sampleRate == 16000 && wav.samples.length == 64)
    for (i <- 0 until 64) assert(wav.samples(i) == pcmSample(id, i).toShort)
  }
}
