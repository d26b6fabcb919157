package graft.operators

/** Dependency-free GIF87a (CompuServe) codec — a third REAL compressed
  * format beside baseline JPEG (q73) and G.711 μ-law (q75), this one
  * LOSSLESS: the pixel stream round-trips bit-exactly through a genuine
  * LZW implementation, so the decode path is graded against the raw
  * generator formula with no "constant block" construction needed.
  *
  * Decoder: full GIF87a structure — header/version check, logical screen
  * descriptor, global color table, image descriptor, and variable-width
  * LSB-first LZW decompression with clear-code dictionary resets, the
  * deferred code-width growth at 2^width, and the cScSc case (code ==
  * next free entry ⇒ prev + prev.head). Sub-block framing is validated;
  * truncation, bad signatures, out-of-range codes, and dictionary
  * overflows raise typed IllegalArgumentException.
  *
  * Encoder: the test/oracle fixture generator — grayscale global color
  * table (i,i,i), one full-size image descriptor, standard LZW with
  * dictionary reset at 4096 entries. Encoding quasi-random bytes expands
  * (LZW finds no runs) — which is exactly the point: every code width
  * 9..12 and the reset path get exercised (GifSpec forces the reset with
  * a 4800-pixel image).
  */
object Gif {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  final case class GifImage(width: Int, height: Int, pixels: Array[Byte])

  // ---- LZW (8-bit min code size: clear=256, eoi=257, first free=258) ----

  /** LSB-first bit packer over GIF data sub-blocks. */
  private final class SubBlockWriter(out: java.io.ByteArrayOutputStream) {
    private val block = new Array[Byte](255)
    private var blockLen = 0
    private var acc = 0L
    private var nBits = 0
    def writeCode(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        block(blockLen) = (acc & 0xFF).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Unit = {
      if (nBits > 0) {
        block(blockLen) = (acc & 0xFF).toByte
        blockLen += 1
      }
      if (blockLen > 0) flushBlock()
      out.write(0) // block terminator
    }
    private def flushBlock(): Unit = {
      out.write(blockLen)
      out.write(block, 0, blockLen)
      blockLen = 0
    }
  }

  /** LZW-compress `data` into GIF sub-blocks (min code size 8). */
  def lzwEncode(data: Array[Byte], out: java.io.ByteArrayOutputStream): Unit = {
    val Clear = 256; val Eoi = 257
    out.write(8) // LZW minimum code size
    val w = new SubBlockWriter(out)
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = 258
    var width = 9
    w.writeCode(Clear, width)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (prev < 0) prev = b
      else {
        val key = Integer.valueOf((prev << 8) | b)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          w.writeCode(prev, width)
          if (nextCode <= 4095) {
            dict.put(key, Integer.valueOf(nextCode))
            // GIF width grows when nextCode EXCEEDS the current range
            if (nextCode == (1 << width) - 1 && width < 12) width += 1
            nextCode += 1
          } else {
            w.writeCode(Clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = 258
            width = 9
          }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) w.writeCode(prev, width)
    w.writeCode(Eoi, width)
    w.finish()
  }

  /** LSB-first bit reader over GIF data sub-blocks. */
  private final class SubBlockReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    private var blockLeft = 0
    private var terminated = false
    def readCode(width: Int): Int = {
      while (nBits < width) {
        if (blockLeft == 0) {
          if (terminated) fail("LZW stream ends before EOI")
          if (pos >= bytes.length) fail("truncated LZW sub-block header")
          blockLeft = bytes(pos) & 0xFF; pos += 1
          if (blockLeft == 0) { terminated = true; fail("LZW stream ends before EOI") }
        }
        if (pos >= bytes.length) fail("truncated LZW sub-block body")
        acc |= (bytes(pos) & 0xFFL) << nBits
        pos += 1; blockLeft -= 1; nBits += 8
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nBits -= width
      code
    }
    /** Advance past the remaining sub-blocks to the terminator. */
    def skipToTerminator(): Int = {
      pos += blockLeft; blockLeft = 0
      if (!terminated) {
        var len = if (pos < bytes.length) bytes(pos) & 0xFF else fail("missing block terminator")
        pos += 1
        while (len != 0) {
          pos += len
          if (pos >= bytes.length) fail("truncated sub-block chain")
          len = bytes(pos) & 0xFF; pos += 1
        }
      }
      pos
    }
  }

  /** LZW-decompress `n` pixels starting at `pos` (the min-code-size byte).
    * Returns (pixels, position after the block terminator).
    */
  def lzwDecode(bytes: Array[Byte], pos0: Int, n: Int): (Array[Byte], Int) = {
    if (pos0 >= bytes.length) fail("missing LZW min code size")
    if ((bytes(pos0) & 0xFF) != 8) fail(s"unsupported LZW min code size ${bytes(pos0)}")
    val Clear = 256; val Eoi = 257
    val r = new SubBlockReader(bytes, pos0 + 1)
    val out = new Array[Byte](n)
    var outLen = 0
    // dictionary as (prefix pointer, last byte) arrays
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    val buf = new Array[Byte](4096)
    var nextCode = 258
    var width = 9
    var prev = -1
    def emit(code: Int): Byte = {
      var c = code
      var k = 0
      while (c >= 256) { buf(k) = last(c); k += 1; c = prefix(c) }
      val first = c.toByte
      if (outLen + k + 1 > n) fail("LZW output exceeds pixel count")
      out(outLen) = first; outLen += 1
      while (k > 0) { k -= 1; out(outLen) = buf(k); outLen += 1 }
      first
    }
    def emitPrevPlus(p: Int): Byte = { // cScSc: prev string + its first byte
      var c = p
      var k = 0
      while (c >= 256) { buf(k) = last(c); k += 1; c = prefix(c) }
      val first = c.toByte
      if (outLen + k + 2 > n) fail("LZW output exceeds pixel count")
      out(outLen) = first; outLen += 1
      while (k > 0) { k -= 1; out(outLen) = buf(k); outLen += 1 }
      out(outLen) = first; outLen += 1
      first
    }
    var done = false
    while (!done) {
      val code = r.readCode(width)
      if (code == Clear) { nextCode = 258; width = 9; prev = -1 }
      else if (code == Eoi) done = true
      else if (prev < 0) {
        if (code >= 256) fail(s"first code after clear must be a literal, got $code")
        emit(code); prev = code
      } else {
        if (code > nextCode) fail(s"LZW code $code beyond dictionary ($nextCode)")
        val first: Byte =
          if (code == nextCode) {
            if (nextCode > 4095) fail("dictionary overflow")
            emitPrevPlus(prev)
          } else emit(code)
        if (nextCode <= 4095) {
          prefix(nextCode) = prev; last(nextCode) = first
          nextCode += 1
          // decoder grows ONE ADD EARLIER than the encoder (its adds lag
          // one code behind): free hits 2^w−1 here ⇔ the encoder's free
          // hit 2^w before the code we will read next
          if (nextCode == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    if (outLen != n) fail(s"LZW decoded $outLen of $n pixels")
    (out, r.skipToTerminator())
  }

  // ---- container ----

  /** Build a real GIF87a: grayscale 256-entry global color table, one
    * image, LZW-compressed [[MediaFormats.pixelByte]] pixels.
    */
  def buildGif(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    u16(w); u16(h)
    out.write(0xF7) // global color table, 8 bits/pixel, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no local color table, not interlaced
    val px = new Array[Byte](w * h)
    var j = 0
    while (j < px.length) { px(j) = MediaFormats.pixelByte(id, j).toByte; j += 1 }
    lzwEncode(px, out)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Parse a GIF87a/89a stream: validate signature and structure, decode
    * the first image's pixel data through the full LZW path.
    */
  def parseGif(bytes: Array[Byte]): GifImage = {
    def u(i: Int): Int =
      if (i < bytes.length) bytes(i) & 0xFF else fail(s"truncated GIF at $i")
    def u16(i: Int): Int = u(i) | (u(i + 1) << 8)
    val sig = new String(bytes.slice(0, 6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") fail(s"bad GIF signature '$sig'")
    val flags = u(10)
    var pos = 13
    if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 7) + 1)) // global color table
    // walk blocks to the first image descriptor (skip GIF89a extensions)
    while (u(pos) != 0x2C) {
      if (u(pos) == 0x3B) fail("trailer before any image")
      if (u(pos) != 0x21) fail(f"unknown block 0x${u(pos)}%02x at $pos")
      pos += 2 // extension introducer + label
      var len = u(pos); pos += 1
      while (len != 0) { pos += len; len = u(pos); pos += 1 }
    }
    val w = u16(pos + 5); val h = u16(pos + 7)
    if (w <= 0 || h <= 0) fail(s"bad image dimensions ${w}x$h")
    val localFlags = u(pos + 9)
    pos += 10
    if ((localFlags & 0x80) != 0) pos += 3 * (1 << ((localFlags & 7) + 1))
    if ((localFlags & 0x40) != 0) fail("interlaced images not supported")
    val (px, after) = lzwDecode(bytes, pos, w * h)
    if (u(after) != 0x3B && u(after) != 0x21 && u(after) != 0x2C)
      fail(f"unexpected block 0x${u(after)}%02x after image")
    GifImage(w, h, px)
  }
}
