package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class DeflateSpec extends AnyFunSuite {

  private def jdkDeflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, true) // raw, no zlib header
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def jdkInflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    // Inflater javadoc: with nowrap, "an extra dummy byte should be
    // provided as input" after the final compressed block
    inf.setInput(data :+ 0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new RuntimeException("jdk inflate stalled")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private val payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one byte" -> Array[Byte](42),
    "ascii prose" -> ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8"),
    "high repetition" -> ("abcabcabc" * 500).getBytes("UTF-8"),
    "all zero" -> new Array[Byte](10000),
    "incompressible" -> {
      var s = 0x2545F4914F6CDD1DL
      Array.fill[Byte](4096) { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0xFF).toByte }
    },
    "utf8 text" -> "Hellø wörld — æøå ü 你好世界 ".concat("é" * 300).getBytes("UTF-8"),
    "run past window" -> ("x" * 40000 + "y" + "x" * 40000).getBytes("UTF-8"))

  test("roundtrip: our deflate → our inflate, every payload shape") {
    payloads.foreach { case (name, p) =>
      assert(Deflate.inflate(Deflate.deflate(p)).toSeq == p.toSeq, name)
    }
  }

  test("our deflate stream decodes in the JDK inflater (independent reference)") {
    payloads.foreach { case (name, p) =>
      assert(jdkInflate(Deflate.deflate(p)).toSeq == p.toSeq, name)
    }
  }

  test("our inflate decodes JDK deflater output at every level (dynamic/fixed/stored blocks)") {
    for ((name, p) <- payloads; level <- Seq(0, 1, 6, 9)) {
      assert(Deflate.inflate(jdkDeflate(p, level)).toSeq == p.toSeq, s"$name level $level")
    }
  }

  test("property: arbitrary bytes roundtrip ours→ours, ours→JDK, JDK→ours") {
    // raw ScalaCheck generators with fixed seeds (scalatestplus isn't in
    // the offline dependency set) — the PropertySpec convention
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 3000)
      // mixed alphabet: small alphabets exercise LZ77, full range exercises literals
      alpha <- Gen.oneOf(4, 16, 256)
      bytes <- Gen.listOfN(n, Gen.choose(0, alpha - 1).map(_.toByte))
    } yield bytes.toArray
    (0 until 60).flatMap(i => gen.apply(Gen.Parameters.default, Seed(4242L + i)))
      .foreach { p =>
        assert(Deflate.inflate(Deflate.deflate(p)).toSeq == p.toSeq, s"ours→ours n=${p.length}")
        assert(jdkInflate(Deflate.deflate(p)).toSeq == p.toSeq, s"ours→JDK n=${p.length}")
        assert(Deflate.inflate(jdkDeflate(p, 6)).toSeq == p.toSeq, s"JDK→ours n=${p.length}")
      }
  }

  test("compression engages: repetitive text compresses well, random does not expand past stored") {
    val rep = ("boilerplate template row 00 | " * 200).getBytes("UTF-8")
    assert(Deflate.deflate(rep).length < rep.length / 4)
    val rnd = payloads.find(_._1 == "incompressible").get._2
    // stored fallback bounds expansion to 5 bytes per 65535-block
    assert(Deflate.deflate(rnd).length <= rnd.length + 5 * ((rnd.length / 65535) + 1))
  }

  test("gzip roundtrips ours→ours and cross-validates with the JDK both ways") {
    payloads.foreach { case (name, p) =>
      assert(Deflate.gunzip(Deflate.gzip(p)).toSeq == p.toSeq, name)
      // JDK reads ours
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(Deflate.gzip(p)))
      assert(in.readAllBytes().toSeq == p.toSeq, s"$name via JDK gunzip")
      // ours reads JDK's
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(p); gz.close()
      assert(Deflate.gunzip(bos.toByteArray).toSeq == p.toSeq, s"$name via JDK gzip")
    }
  }

  test("zlib roundtrips ours→ours and cross-validates with the JDK both ways") {
    payloads.foreach { case (name, p) =>
      assert(Deflate.zlibDecompress(Deflate.zlibCompress(p)).toSeq == p.toSeq, name)
      val inf = new java.util.zip.Inflater() // zlib-wrapped
      inf.setInput(Deflate.zlibCompress(p))
      val buf = new Array[Byte](p.length + 64)
      val n = inf.inflate(buf)
      assert(inf.finished() && buf.take(n).toSeq == p.toSeq, s"$name via JDK zlib")
      val d = new java.util.zip.Deflater()
      d.setInput(p); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val b2 = new Array[Byte](4096)
      while (!d.finished()) out.write(b2, 0, d.deflate(b2))
      assert(Deflate.zlibDecompress(out.toByteArray).toSeq == p.toSeq, s"$name via JDK zlib compress")
    }
  }

  test("crc32 and adler32 match the JDK implementations") {
    payloads.foreach { case (name, p) =>
      val c = new java.util.zip.CRC32(); c.update(p)
      assert(Deflate.crc32(p, 0, p.length) == c.getValue, s"$name crc32")
      val a = new java.util.zip.Adler32(); a.update(p)
      assert(Deflate.adler32(p, 0, p.length) == a.getValue, s"$name adler32")
    }
  }

  test("corruption fails loudly and typed") {
    val good = Deflate.gzip("hello deflate world, hello again".getBytes("UTF-8"))
    def corrupt(i: Int): Array[Byte] = { val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte; c }
    intercept[Deflate.DeflateError](Deflate.gunzip(corrupt(0)))            // magic
    intercept[Deflate.DeflateError](Deflate.gunzip(corrupt(good.length - 2))) // ISIZE
    intercept[Deflate.DeflateError](Deflate.gunzip(corrupt(good.length - 6))) // CRC
    intercept[Deflate.DeflateError](Deflate.gunzip(good.take(good.length - 3))) // truncated
    // stream-body corruption must never return silently-wrong bytes
    val bodyHit = corrupt(14)
    val r = try Some(Deflate.gunzip(bodyHit)) catch { case _: Deflate.DeflateError => None }
    assert(r.isEmpty || r.get.toSeq != "hello deflate world, hello again".getBytes("UTF-8").toSeq)
  }
}
