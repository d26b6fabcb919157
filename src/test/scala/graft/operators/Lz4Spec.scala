package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Lz4Spec extends AnyFunSuite {

  private val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  private val payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one byte" -> Array[Byte](7),
    "short" -> "hello lz4".getBytes("UTF-8"),
    "prose" -> ("the quick brown fox jumps over the lazy dog. " * 50).getBytes("UTF-8"),
    "high repetition" -> ("abcabcabc" * 700).getBytes("UTF-8"),
    "all zero" -> new Array[Byte](8192),
    "incompressible" -> {
      var s = 0x9E3779B97F4A7C15L
      Array.fill[Byte](4096) { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0xFF).toByte }
    },
    "run past window" -> ("x" * 70000 + "y" + "x" * 70000).getBytes("UTF-8"))

  test("roundtrip: our compress → our decompress, every payload shape") {
    payloads.foreach { case (name, p) =>
      assert(Lz4.decompress(Lz4.compress(p)).toSeq == p.toSeq, name)
    }
  }

  test("lz4-java decodes our blocks (independent reference on Spark's classpath)") {
    val dec = factory.safeDecompressor()
    payloads.foreach { case (name, p) =>
      val got = dec.decompress(Lz4.compress(p), p.length)
      assert(got.toSeq == p.toSeq, name)
    }
  }

  test("we decode lz4-java's blocks, fast and high-compression codecs") {
    payloads.foreach { case (name, p) =>
      val fast = factory.fastCompressor().compress(p)
      assert(Lz4.decompress(fast).toSeq == p.toSeq, s"$name fast")
      val hc = factory.highCompressor().compress(p)
      assert(Lz4.decompress(hc).toSeq == p.toSeq, s"$name hc")
    }
  }

  test("property: arbitrary bytes roundtrip ours→ours, ours→lz4java, lz4java→ours") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 5000)
      alpha <- Gen.oneOf(3, 16, 256)
      bytes <- Gen.listOfN(n, Gen.choose(0, alpha - 1).map(_.toByte))
    } yield bytes.toArray
    (0 until 60).flatMap(i => gen.apply(Gen.Parameters.default, Seed(909L + i)))
      .foreach { p =>
        assert(Lz4.decompress(Lz4.compress(p)).toSeq == p.toSeq, s"ours n=${p.length}")
        assert(factory.safeDecompressor().decompress(Lz4.compress(p), p.length).toSeq == p.toSeq,
          s"ours→lib n=${p.length}")
        assert(Lz4.decompress(factory.fastCompressor().compress(p)).toSeq == p.toSeq,
          s"lib→ours n=${p.length}")
      }
  }

  test("compression engages on repetitive input") {
    val rep = ("template row | " * 500).getBytes("UTF-8")
    assert(Lz4.compress(rep).length < rep.length / 4)
  }

  test("malformed blocks fail loudly and typed") {
    intercept[Lz4.Lz4Error](Lz4.decompress(Array.emptyByteArray))
    // zero offset
    intercept[Lz4.Lz4Error](Lz4.decompress(Array[Byte](0x10, 'a', 0, 0, 0)))
    // offset past output start
    intercept[Lz4.Lz4Error](Lz4.decompress(Array[Byte](0x10, 'a', 9, 0)))
    // truncated literals / offset
    val good = Lz4.compress("hello hello hello hello hello!".getBytes("UTF-8"))
    intercept[Lz4.Lz4Error](Lz4.decompress(good.take(good.length - 2)))
    intercept[Lz4.Lz4Error](Lz4.decompress(Array[Byte](0x40, 'a')))
  }
}
