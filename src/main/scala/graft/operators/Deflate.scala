package graft.operators

/** Dependency-free DEFLATE / gzip / zlib codec from the public specs —
  * RFC 1951 (DEFLATE), RFC 1952 (gzip), RFC 1950 (zlib) — in the q201/q230
  * independent-reference contract: everything here is DERIVED from the
  * spec's rules (canonical Huffman construction, the length/distance
  * base+extra doubling pattern, CRC-32/Adler-32 from their generator
  * polynomials); nothing is a tabulated constant that can't be re-derived
  * from the RFC text. Cross-validated BOTH directions against the JDK's
  * zlib (`java.util.zip`) in DeflateSpec — a genuinely independent
  * implementation, which is a stronger reference than FLAC's
  * self-verification could get offline.
  *
  * Decoder: fully validating inflate — stored (LEN/NLEN), fixed AND
  * dynamic Huffman blocks (everything a standard compressor emits),
  * oversubscribed/incomplete code detection, distance-past-start and
  * truncation checks. Encoder: LZ77 (32 KiB window, hash-chain matcher,
  * lazy one-step deferral) into fixed-Huffman blocks with a stored-block
  * fallback when expansion would exceed it — a valid stream for ANY
  * inflater, with real compression from the LZ77 layer.
  *
  * Pipeline motivation (beyond closing the ubiquitous-codec seam):
  * per-document gzip compressibility is a standard LLM-corpus quality
  * signal (boilerplate and template spam compress far better than prose),
  * and a from-spec encoder makes the signal deterministic across JVMs —
  * `java.util.zip.Deflater` output may legally differ between zlib
  * builds.
  */
object Deflate {

  final class DeflateError(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- bit IO

  /** LSB-first bit reader over a byte array (RFC 1951 §3.1.1: data
    * elements are packed starting from the least-significant bit).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf: Int = 0
    private var bitCnt: Int = 0

    def bits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= data.length) throw new DeflateError("truncated stream")
        bitBuf |= (data(pos) & 0xFF) << bitCnt
        pos += 1
        bitCnt += 8
      }
      val v = bitBuf & ((1 << n) - 1)
      bitBuf >>>= n
      bitCnt -= n
      v
    }

    /** One Huffman code bit (codes are packed MSB-of-code first). */
    def bit(): Int = bits(1)

    def alignByte(): Unit = { bitBuf = 0; bitCnt = 0 }

    def readByte(): Int = {
      if (pos >= data.length) throw new DeflateError("truncated stored block")
      val b = data(pos) & 0xFF; pos += 1; b
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var bitBuf: Int = 0
    private var bitCnt: Int = 0

    /** `n` bits of `v`, LSB first. */
    def writeBits(v: Int, n: Int): Unit = {
      bitBuf |= (v & ((1 << n) - 1)) << bitCnt
      bitCnt += n
      while (bitCnt >= 8) {
        out.write(bitBuf & 0xFF)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }

    /** A Huffman code: `len` bits written most-significant-of-code first. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >>> i) & 1, 1); i -= 1 }
    }

    def alignByte(): Unit = if (bitCnt > 0) { out.write(bitBuf & 0xFF); bitBuf = 0; bitCnt = 0 }

    def writeByte(b: Int): Unit = { require(bitCnt == 0); out.write(b & 0xFF) }

    def result(): Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ------------------------------------------- canonical Huffman (§3.2.2)

  /** Decode table built from code lengths by the RFC's canonical
    * construction; validates the code is neither oversubscribed nor
    * incomplete (a single-symbol code is permitted incomplete per the
    * dynamic-block convention used by zlib for the distance alphabet).
    */
  private final class HuffmanTable(lengths: Array[Int]) {
    private val MaxBits = 15
    private val count = new Array[Int](MaxBits + 1)
    lengths.foreach { l =>
      if (l < 0 || l > MaxBits) throw new DeflateError(s"invalid code length $l")
      count(l) += 1
    }
    count(0) = 0
    // Kraft check: oversubscription is always fatal; incompleteness is
    // tolerated only for degenerate 0/1-symbol codes (zlib convention).
    private val nSyms = count.sum
    locally {
      var left = 1
      var l = 1
      while (l <= MaxBits) {
        left <<= 1
        left -= count(l)
        if (left < 0) throw new DeflateError("oversubscribed Huffman code")
        l += 1
      }
      if (left > 0 && nSyms > 1) throw new DeflateError("incomplete Huffman code")
    }
    private val firstCode = new Array[Int](MaxBits + 1)
    private val firstIdx = new Array[Int](MaxBits + 1)
    locally {
      var code = 0; var idx = 0; var l = 1
      while (l <= MaxBits) {
        code = (code + count(l - 1)) << 1
        firstCode(l) = code
        firstIdx(l) = idx
        idx += count(l)
        l += 1
      }
    }
    private val symbols = new Array[Int](nSyms)
    locally {
      val next = firstIdx.clone()
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) { symbols(next(l)) = s; next(l) += 1 }
        s += 1
      }
    }

    def decode(br: BitReader): Int = {
      var code = 0; var l = 1
      while (l <= MaxBits) {
        code = (code << 1) | br.bit()
        val idx = code - firstCode(l)
        if (idx >= 0 && idx < count(l)) return symbols(firstIdx(l) + idx)
        l += 1
      }
      throw new DeflateError("invalid Huffman code")
    }
  }

  /** Canonical encode table (code per symbol) from code lengths. */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val MaxBits = lengths.max
    val count = new Array[Int](MaxBits + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val nextCode = new Array[Int](MaxBits + 1)
    var code = 0
    var l = 1
    while (l <= MaxBits) {
      code = (code + (if (l - 1 >= 1) count(l - 1) else 0)) << 1
      nextCode(l) = code
      l += 1
    }
    val codes = new Array[Int](lengths.length)
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = nextCode(lengths(s)); nextCode(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  // -------------------- length/distance tables from the doubling pattern
  // (§3.2.5: extra bits grow by one every 4 length codes past 264 / every
  // 2 distance codes past 3; bases accumulate — nothing to tabulate)

  private val LenExtra: Array[Int] =
    Array.tabulate(29)(i => if (i == 28) 0 else math.max(0, (i >> 2) - 1))
  private val LenBase: Array[Int] = {
    val b = new Array[Int](29)
    b(0) = 3
    for (i <- 1 until 28) b(i) = b(i - 1) + (1 << LenExtra(i - 1))
    b(28) = 258 // code 285: the max length, zero extra bits
    b
  }
  private val DistExtra: Array[Int] =
    Array.tabulate(30)(i => math.max(0, (i >> 1) - 1))
  private val DistBase: Array[Int] = {
    val b = new Array[Int](30)
    b(0) = 1
    for (i <- 1 until 30) b(i) = b(i - 1) + (1 << DistExtra(i - 1))
    b
  }

  /** Fixed litlen code lengths (§3.2.6's four ranges). */
  private def fixedLitLenLengths: Array[Int] =
    Array.tabulate(288) { s =>
      if (s <= 143) 8 else if (s <= 255) 9 else if (s <= 279) 7 else 8
    }

  // order in which code-length-code lengths are transmitted (§3.2.7 —
  // part of the wire format definition, like FLAC's sync word)
  private val ClOrder =
    Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  // ---------------------------------------------------------------- inflate

  /** Decompress a raw DEFLATE stream. Validating: every malformed shape
    * throws [[DeflateError]] rather than producing garbage.
    */
  def inflate(data: Array[Byte]): Array[Byte] = inflateFrom(data, 0)._1

  private def inflateFrom(data: Array[Byte], start: Int): (Array[Byte], Int) = {
    val br = new BitReader(data, start)
    val out = new java.io.ByteArrayOutputStream()
    // sliding window for back-references: we keep the whole output (fine
    // at document scale; a true streaming decoder would ring-buffer 32 KiB)
    var window = new Array[Byte](1 << 16)
    var wLen = 0
    def emit(b: Byte): Unit = {
      out.write(b)
      if (wLen == window.length) window = java.util.Arrays.copyOf(window, window.length * 2)
      window(wLen) = b
      wLen += 1
    }
    var fin = false
    while (!fin) {
      fin = br.bits(1) == 1
      br.bits(2) match {
        case 0 => // stored
          br.alignByte()
          val len = br.readByte() | (br.readByte() << 8)
          val nlen = br.readByte() | (br.readByte() << 8)
          if ((len ^ 0xFFFF) != nlen) throw new DeflateError("stored LEN/NLEN mismatch")
          var i = 0
          while (i < len) { emit(br.readByte().toByte); i += 1 }
        case t @ (1 | 2) =>
          val (lit, dist) =
            if (t == 1)
              // 32 five-bit distance codes (§3.2.6) — 30/31 are invalid if
              // they ever decode, checked at use
              (new HuffmanTable(fixedLitLenLengths), new HuffmanTable(Array.fill(32)(5)))
            else readDynamicTables(br)
          var done = false
          while (!done) {
            val sym = lit.decode(br)
            if (sym < 256) emit(sym.toByte)
            else if (sym == 256) done = true
            else {
              if (sym > 285) throw new DeflateError(s"invalid litlen symbol $sym")
              val li = sym - 257
              val len = LenBase(li) + br.bits(LenExtra(li))
              val dsym = dist.decode(br)
              if (dsym > 29) throw new DeflateError(s"invalid distance symbol $dsym")
              val d = DistBase(dsym) + br.bits(DistExtra(dsym))
              if (d > wLen) throw new DeflateError("distance past output start")
              var i = 0
              while (i < len) { emit(window(wLen - d)); i += 1 }
            }
          }
        case _ => throw new DeflateError("invalid block type 11")
      }
    }
    (out.toByteArray, br.pos)
  }

  /** Dynamic-block table read (§3.2.7): HLIT/HDIST/HCLEN, the code-length
    * code, then the two alphabets with 16/17/18 repeat semantics.
    */
  private def readDynamicTables(br: BitReader): (HuffmanTable, HuffmanTable) = {
    val hlit = br.bits(5) + 257
    val hdist = br.bits(5) + 1
    val hclen = br.bits(4) + 4
    if (hlit > 286 || hdist > 30) throw new DeflateError("dynamic header out of range")
    val clLens = new Array[Int](19)
    var i = 0
    while (i < hclen) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
    val clTable = new HuffmanTable(clLens)
    val lens = new Array[Int](hlit + hdist)
    var n = 0
    while (n < lens.length) {
      clTable.decode(br) match {
        case s if s < 16 => lens(n) = s; n += 1
        case 16 =>
          if (n == 0) throw new DeflateError("repeat with no previous length")
          val r = 3 + br.bits(2)
          if (n + r > lens.length) throw new DeflateError("repeat overflows alphabet")
          val prev = lens(n - 1)
          var j = 0
          while (j < r) { lens(n) = prev; n += 1; j += 1 }
        case 17 =>
          val r = 3 + br.bits(3)
          if (n + r > lens.length) throw new DeflateError("zero-run overflows alphabet")
          n += r
        case 18 =>
          val r = 11 + br.bits(7)
          if (n + r > lens.length) throw new DeflateError("zero-run overflows alphabet")
          n += r
        case other => throw new DeflateError(s"invalid code-length symbol $other")
      }
    }
    if (lens(256) == 0) throw new DeflateError("dynamic block has no end-of-block code")
    (new HuffmanTable(lens.take(hlit)), new HuffmanTable(lens.drop(hlit)))
  }

  // ---------------------------------------------------------------- deflate

  private val WindowSize = 1 << 15
  private val MinMatch = 3
  private val MaxMatch = 258
  private val HashBits = 15
  private val MaxChain = 128

  /** Compress into a raw DEFLATE stream: LZ77 over a 32 KiB window into
    * ONE fixed-Huffman final block, unless the stored encoding is smaller
    * (incompressible input), in which case stored blocks are emitted.
    * Deterministic: the matcher has no tunables that vary by environment.
    */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val fixed = deflateFixed(data)
    val storedSize = 5 * math.max(1, (data.length + 65534) / 65535) + data.length
    if (fixed.length <= storedSize) fixed else deflateStored(data)
  }

  private def deflateStored(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    var off = 0
    do {
      val n = math.min(65535, data.length - off)
      val fin = off + n >= data.length
      bw.writeBits(if (fin) 1 else 0, 1)
      bw.writeBits(0, 2)
      bw.alignByte()
      bw.writeByte(n & 0xFF); bw.writeByte(n >>> 8)
      bw.writeByte(~n & 0xFF); bw.writeByte((~n >>> 8) & 0xFF)
      var i = 0
      while (i < n) { bw.writeByte(data(off + i)); i += 1 }
      off += n
    } while (off < data.length)
    bw.result()
  }

  private def deflateFixed(data: Array[Byte]): Array[Byte] = {
    val litLens = fixedLitLenLengths
    val litCodes = canonicalCodes(litLens)
    val bw = new BitWriter
    bw.writeBits(1, 1) // BFINAL
    bw.writeBits(1, 2) // fixed Huffman

    def writeLit(s: Int): Unit = bw.writeCode(litCodes(s), litLens(s))
    def writeMatch(len: Int, d: Int): Unit = {
      // length code: generated bases are ascending; code 285 wins for 258
      var li = 27
      while (li > 0 && LenBase(li) > len) li -= 1
      if (len == 258) li = 28
      writeLit(257 + li)
      bw.writeBits(len - LenBase(li), LenExtra(li))
      var di = 29
      while (di > 0 && DistBase(di) > d) di -= 1
      bw.writeCode(di, 5) // fixed distance codes: 5-bit canonical = identity
      bw.writeBits(d - DistBase(di), DistExtra(di))
    }

    // hash-chain LZ77 with one-step lazy matching
    val head = Array.fill(1 << HashBits)(-1)
    val prev = new Array[Int](math.max(1, data.length))
    def hash(i: Int): Int =
      (((data(i) & 0xFF) << 10) ^ ((data(i + 1) & 0xFF) << 5) ^ (data(i + 2) & 0xFF)) & ((1 << HashBits) - 1)
    def insert(i: Int): Unit =
      if (i + MinMatch <= data.length) { val h = hash(i); prev(i) = head(h); head(h) = i }
    def findMatch(i: Int): (Int, Int) = { // (len, dist), len < MinMatch if none
      if (i + MinMatch > data.length) return (0, 0)
      var cand = head(hash(i))
      var bestLen = 0; var bestDist = 0; var chain = 0
      val maxLen = math.min(MaxMatch, data.length - i)
      while (cand >= 0 && chain < MaxChain && i - cand <= WindowSize) {
        var l = 0
        while (l < maxLen && data(cand + l) == data(i + l)) l += 1
        if (l > bestLen) { bestLen = l; bestDist = i - cand; if (l >= maxLen) chain = MaxChain }
        cand = prev(cand)
        chain += 1
      }
      (bestLen, bestDist)
    }

    var i = 0
    while (i < data.length) {
      val (len, d) = findMatch(i)
      if (len >= MinMatch) {
        // lazy: if the NEXT position matches longer, emit a literal instead
        val (nlen, _) = if (i + 1 < data.length) { insert(i); findMatch(i + 1) } else (0, 0)
        if (nlen > len) {
          writeLit(data(i) & 0xFF)
          i += 1 // position i already inserted above
        } else {
          writeMatch(len, d)
          // head(hash) already holds i when lazy probed; insert the rest
          val end = i + len
          if (i + 1 < data.length && head(hash(i)) != i) insert(i)
          var j = i + 1
          while (j < end && j + MinMatch <= data.length) { insert(j); j += 1 }
          i = end
        }
      } else {
        writeLit(data(i) & 0xFF)
        insert(i)
        i += 1
      }
    }
    writeLit(256)
    bw.result()
  }

  // -------------------------------------------------------- CRC32 / Adler32

  /** CRC-32 (reflected, poly x³²+x²⁶+x²³+x²²+x¹⁶+x¹²+x¹¹+x¹⁰+x⁸+x⁷+x⁵+x⁴+x²+x+1,
    * i.e. reflected form 0xEDB88320) — table computed from the polynomial.
    */
  private val Crc32Table: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) { c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1; k += 1 }
    c
  }

  def crc32(data: Array[Byte], from: Int, until: Int): Long = {
    var c = 0xFFFFFFFF
    var i = from
    while (i < until) { c = Crc32Table((c ^ data(i)) & 0xFF) ^ (c >>> 8); i += 1 }
    (c ^ 0xFFFFFFFF).toLong & 0xFFFFFFFFL
  }

  def adler32(data: Array[Byte], from: Int, until: Int): Long = {
    val Mod = 65521
    var s1 = 1L; var s2 = 0L
    var i = from
    while (i < until) {
      s1 = (s1 + (data(i) & 0xFF)) % Mod
      s2 = (s2 + s1) % Mod
      i += 1
    }
    (s2 << 16) | s1
  }

  // ------------------------------------------------------------------ gzip

  /** RFC 1952 wrapper: fixed 10-byte header (no name/extra, MTIME 0,
    * OS 255 "unknown"), deflate body, CRC-32 + ISIZE trailer.
    */
  def gzip(data: Array[Byte]): Array[Byte] = {
    val body = deflate(data)
    val out = java.nio.ByteBuffer.allocate(10 + body.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x1F.toByte).put(0x8B.toByte).put(8.toByte).put(0.toByte)
    out.putInt(0).put(0.toByte).put(0xFF.toByte)
    out.put(body)
    out.putInt(crc32(data, 0, data.length).toInt)
    out.putInt(data.length)
    out.array()
  }

  /** All members of a multi-member gzip stream (concatenated gzip files —
    * the framing WARC web archives use: one member per record so any
    * record is independently seekable). Each member is fully validated.
    */
  def gunzipMembers(data: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < data.length) {
      val (body, end) = gunzipFrom(data, pos)
      out += body
      pos = end
    }
    out.result()
  }

  /** Validating gunzip: header fields, optional FEXTRA/FNAME/FCOMMENT/FHCRC
    * skipping (other writers set them), CRC-32 and ISIZE both checked.
    * Trailing bytes after the first member are an error here — use
    * [[gunzipMembers]] for concatenated streams.
    */
  def gunzip(data: Array[Byte]): Array[Byte] = {
    val (body, end) = gunzipFrom(data, 0)
    if (end != data.length)
      throw new DeflateError(s"${data.length - end} trailing bytes after gzip member")
    body
  }

  /** One gzip member starting at `start`; returns (payload, end offset). */
  private def gunzipFrom(data: Array[Byte], start: Int): (Array[Byte], Int) = {
    if (data.length - start < 18) throw new DeflateError("gzip stream too short")
    if ((data(start) & 0xFF) != 0x1F || (data(start + 1) & 0xFF) != 0x8B)
      throw new DeflateError("bad gzip magic")
    if (data(start + 2) != 8)
      throw new DeflateError(s"unsupported gzip method ${data(start + 2)}")
    val flg = data(start + 3) & 0xFF
    if ((flg & 0xE0) != 0) throw new DeflateError("reserved gzip FLG bits set")
    var p = start + 10
    def need(n: Int, what: String): Unit =
      if (p + n > data.length) throw new DeflateError(s"gzip $what truncated")
    if ((flg & 4) != 0) { // FEXTRA
      need(2, "FEXTRA length")
      val xlen = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8)
      p += 2; need(xlen, "FEXTRA"); p += xlen
    }
    if ((flg & 8) != 0) { // FNAME (NUL-terminated)
      while (p < data.length && data(p) != 0) p += 1
      need(1, "FNAME"); p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (p < data.length && data(p) != 0) p += 1
      need(1, "FCOMMENT"); p += 1
    }
    if ((flg & 2) != 0) { need(2, "FHCRC"); p += 2 }
    val (body, end) = inflateFrom(data, p)
    if (end + 8 > data.length) throw new DeflateError("gzip trailer truncated")
    val bb = java.nio.ByteBuffer.wrap(data, end, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val crc = bb.getInt.toLong & 0xFFFFFFFFL
    val isize = bb.getInt.toLong & 0xFFFFFFFFL
    if (crc != crc32(body, 0, body.length)) throw new DeflateError("gzip CRC-32 mismatch")
    if (isize != (body.length.toLong & 0xFFFFFFFFL)) throw new DeflateError("gzip ISIZE mismatch")
    (body, end + 8)
  }

  // ------------------------------------------------------------------ zlib

  /** RFC 1950 wrapper (the PNG container format): CMF/FLG with the
    * check-bits rule (CMF·256+FLG ≡ 0 mod 31), Adler-32 trailer.
    */
  def zlibCompress(data: Array[Byte]): Array[Byte] = {
    val body = deflate(data)
    val cmf = 0x78 // CM=8, CINFO=7 (32 KiB window)
    val flg = { val base = cmf * 256; (31 - base % 31) % 31 } // FLEVEL=0, FDICT=0
    val out = java.nio.ByteBuffer.allocate(2 + body.length + 4)
    out.put(cmf.toByte).put(flg.toByte).put(body)
    out.putInt(adler32(data, 0, data.length).toInt)
    out.array()
  }

  def zlibDecompress(data: Array[Byte]): Array[Byte] = {
    if (data.length < 6) throw new DeflateError("zlib stream too short")
    val cmf = data(0) & 0xFF
    val flg = data(1) & 0xFF
    if ((cmf & 0x0F) != 8) throw new DeflateError(s"unsupported zlib method ${cmf & 0x0F}")
    if ((cmf * 256 + flg) % 31 != 0) throw new DeflateError("zlib header check failed")
    if ((flg & 0x20) != 0) throw new DeflateError("preset dictionary unsupported")
    val (body, end) = inflateFrom(data, 2)
    if (end + 4 > data.length) throw new DeflateError("zlib trailer truncated")
    val a = java.nio.ByteBuffer.wrap(data, end, 4).getInt.toLong & 0xFFFFFFFFL
    if (a != adler32(body, 0, body.length)) throw new DeflateError("zlib Adler-32 mismatch")
    body
  }
}
