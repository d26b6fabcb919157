package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the H.264 Annex-B walk that q190 grades: SPS fields vs the
  * generator formulas, the emulation-prevention escape/unescape algebra on
  * arbitrary byte strings, Exp-Golomb round trips, and typed rejection of
  * malformed streams.
  */
class H264Spec extends AnyFunSuite {
  import H264._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  test("walk agrees with the generator formulas across ids") {
    for (id <- 0L until 400L) {
      val info = parseH264(buildH264(id))
      assert(info.sps.profileIdc == 66)
      assert(info.sps.levelIdc == levelIdc(id))
      assert(info.sps.width == expectedWidth(id))
      assert(info.sps.height == expectedHeight(id))
      assert(info.sps.log2MaxFrameNum == 4 + log2MaxFrameNumMinus4(id))
      assert(info.sps.maxNumRefFrames == maxNumRefFrames(id))
      assert(info.nNals == 2 + idrCount(id))
      assert(info.nIdr == idrCount(id))
    }
  }

  test("emulation prevention: escape then unescape is the identity") {
    samples(Gen.listOf(Gen.chooseNum(0, 255)), 300).foreach { l =>
      val rbsp = l.map(_.toByte).toArray
      assert(nalToRbsp(rbspToNal(rbsp)).sameElements(rbsp))
    }
    // zero-heavy strings are the hard case — force them explicitly
    samples(Gen.listOf(Gen.oneOf(0, 0, 0, 1, 2, 3, 255)), 300).foreach { l =>
      val rbsp = l.map(_.toByte).toArray
      assert(nalToRbsp(rbspToNal(rbsp)).sameElements(rbsp))
    }
  }

  test("escaped payload never contains a start-code prefix") {
    val hostile = Array[Byte](0, 0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0, 1)
    val esc = rbspToNal(hostile)
    for (i <- 0 until esc.length - 2)
      assert(!(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xFF) <= 2),
        s"unescaped 00 00 0x at $i")
    assert(nalToRbsp(esc).sameElements(hostile))
  }

  test("Exp-Golomb ue/se round-trip") {
    val w = new BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 127, 128, 4095)
    val ses = Seq(0, 1, -1, 2, -2, 63, -64)
    ues.foreach(w.ue); ses.foreach(w.se); w.trailing()
    val r = new BitReader(w.bytes)
    ues.foreach(v => assert(r.ue() == v))
    ses.foreach(v => assert(r.se() == v))
  }

  test("malformed streams reject typed, never hang") {
    val good = buildH264(9L)
    intercept[IllegalArgumentException](parseH264(Array.fill[Byte](32)(0x44)))
    intercept[IllegalArgumentException](parseH264(Array[Byte](0x44) ++ good)) // junk before first start code
    val forbidden = good.clone; forbidden(4) = (forbidden(4) | 0x80).toByte
    intercept[IllegalArgumentException](parseH264(forbidden))
    // drop the SPS NAL entirely (stream starts at the PPS start code)
    val ppsAt = {
      var i = 5
      while (!(good(i) == 0 && good(i + 1) == 0 && good(i + 2) == 1)) i += 1
      i
    }
    intercept[IllegalArgumentException](parseH264(good.drop(ppsAt)))
    // truncate inside the SPS payload
    intercept[IllegalArgumentException](parseH264(good.take(7)))
    // a bare unescaped 00 00 02 inside a NAL payload is malformed
    intercept[IllegalArgumentException](
      nalToRbsp(Array[Byte](5, 0, 0, 2, 9)))
  }

  test("high-profile and poc-type-1 SPS reject as unsupported") {
    def spsWith(profile: Int, poc: Int): Array[Byte] = {
      val w = new BitWriter
      w.u(profile, 8); w.u(0, 8); w.u(30, 8)
      w.ue(0); w.ue(0); w.ue(poc)
      if (poc == 0) w.ue(0)
      w.ue(1); w.u(0, 1); w.ue(3); w.ue(3)
      w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
      w.trailing(); w.bytes
    }
    intercept[IllegalArgumentException](parseSps(spsWith(100, 2)))
    intercept[IllegalArgumentException](parseSps(spsWith(66, 1)))
    assert(parseSps(spsWith(66, 0)).width == 64) // poc type 0 path supported
  }
}
