package graft.operators

/** LZ4 block-format codec from the public specification (the lz4.github.io
  * block format document) — the byte-oriented LZ77 family member beside
  * [[Deflate]]'s bit-oriented Huffman coding: sequences of
  * (token, literals, 2-byte LE offset, extended match length), minimum
  * match 4, window 64 KiB. LZ4 is the codec Spark itself defaults to for
  * shuffle/RDD compression, so the seam matters operationally; the
  * implementation is cross-validated BOTH directions against the
  * `lz4-java` library on Spark's own classpath (an independent
  * implementation) in Lz4Spec — the q237 contract.
  *
  * Decoder is fully validating: token/offset/length bounds, zero offset,
  * offset past output start, truncation, and the end-of-block rules
  * (a block must end in literals) all throw typed [[Lz4.Lz4Error]].
  * Encoder is greedy hash-table matching honoring the spec's encoder
  * constraints (last 5 bytes literal, no match starting within the last
  * 12 bytes), so any conformant decoder accepts its output.
  */
object Lz4 {

  final class Lz4Error(msg: String) extends RuntimeException(msg)

  private val MinMatch = 4
  private val MaxOffset = 65535
  private val HashLog = 16

  /** Decompress a raw LZ4 block (decompressed size unknown in the block
    * format — the caller frames it, as every container does).
    */
  def decompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var window = new Array[Byte](1 << 16)
    var wLen = 0
    def emit(b: Byte): Unit = {
      out.write(b)
      if (wLen == window.length) window = java.util.Arrays.copyOf(window, window.length * 2)
      window(wLen) = b
      wLen += 1
    }
    var pos = 0
    def byteAt(what: String): Int = {
      if (pos >= data.length) throw new Lz4Error(s"truncated $what")
      val b = data(pos) & 0xFF; pos += 1; b
    }
    def extLen(base: Int, what: String): Int = {
      var len = base
      if (base == 15) {
        var b = 0
        do { b = byteAt(what); len += b } while (b == 255)
      }
      len
    }
    if (data.isEmpty) throw new Lz4Error("empty block")
    var done = false
    while (!done) {
      val token = byteAt("token")
      val litLen = extLen(token >>> 4, "literal length")
      var i = 0
      while (i < litLen) {
        if (pos >= data.length) throw new Lz4Error("truncated literals")
        emit(data(pos)); pos += 1; i += 1
      }
      if (pos == data.length) {
        done = true // block ends in literals — the only legal ending
      } else {
        if (pos + 2 > data.length) throw new Lz4Error("truncated offset")
        val offset = (data(pos) & 0xFF) | ((data(pos + 1) & 0xFF) << 8)
        pos += 2
        if (offset == 0) throw new Lz4Error("zero match offset")
        if (offset > wLen) throw new Lz4Error("match offset past output start")
        val matchLen = extLen(token & 0xF, "match length") + MinMatch
        var j = 0
        while (j < matchLen) { emit(window(wLen - offset)); j += 1 }
      }
    }
    out.toByteArray
  }

  /** Compress into a raw LZ4 block. */
  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    def writeLen(base: Int): Unit = { // continuation bytes past 15
      var rest = base - 15
      while (rest >= 255) { out.write(255); rest -= 255 }
      out.write(rest)
    }
    def writeSequence(litFrom: Int, litUntil: Int, matchLen: Int, offset: Int): Unit = {
      val litLen = litUntil - litFrom
      val litNib = math.min(15, litLen)
      val matNib = if (matchLen == 0) 0 else math.min(15, matchLen - MinMatch)
      out.write((litNib << 4) | matNib)
      if (litNib == 15) writeLen(litLen)
      out.write(data, litFrom, litLen)
      if (matchLen > 0) {
        out.write(offset & 0xFF); out.write((offset >>> 8) & 0xFF)
        if (matNib == 15) writeLen(matchLen - MinMatch)
      }
    }
    // spec encoder rules: the block ends in literals (≥5 of them for
    // non-tiny blocks) and no match starts within the last 12 bytes
    val matchLimit = data.length - 12
    // size the hash table to the input: a fixed 64K-entry table costs
    // 256 KiB of allocation PER CALL, which dominates on the KB-scale
    // documents a corpus map pass feeds through this
    val hashLog = math.min(HashLog,
      math.max(8, 32 - Integer.numberOfLeadingZeros(math.max(1, data.length))))
    val head = Array.fill(1 << hashLog)(-1)
    def hash(i: Int): Int = {
      val v = (data(i) & 0xFF) | ((data(i + 1) & 0xFF) << 8) |
        ((data(i + 2) & 0xFF) << 16) | ((data(i + 3) & 0xFF) << 24)
      (v * -1640531535) >>> (32 - hashLog) // Knuth multiplicative, spec-suggested shape
    }
    var anchor = 0
    var i = 0
    while (i < matchLimit) {
      val h = hash(i)
      val cand = head(h)
      head(h) = i
      if (cand >= 0 && i - cand <= MaxOffset &&
          data(cand) == data(i) && data(cand + 1) == data(i + 1) &&
          data(cand + 2) == data(i + 2) && data(cand + 3) == data(i + 3)) {
        // extend; a match may run up to the last-5-literals boundary
        val end = data.length - 5
        var l = MinMatch
        while (i + l < end && data(cand + l) == data(i + l)) l += 1
        writeSequence(anchor, i, l, i - cand)
        anchor = i + l
        i += l
      } else i += 1
    }
    writeSequence(anchor, data.length, 0, 0) // trailing literals, no match
    out.toByteArray
  }
}
