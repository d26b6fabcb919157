package graft.operators

/** Dependency-free FLAC (RFC 9639) codec — the fourth REAL compressed
  * format beside GIF/LZW (q201), baseline JPEG (q73) and G.711 μ-law
  * (q75), and the one that closes the COMPRESSED-AUDIO seam properly:
  * unlike MP3 (whose Layer III Huffman/scalefactor tables are published
  * *data* unavailable offline — the round-10 declined item), every FLAC
  * construct is fully derivable from its public specification with no
  * tabulated constants: Rice/residual coding, the five fixed polynomial
  * predictors, quantized-LPC prediction (Levinson–Durbin is textbook),
  * UTF-8-style frame numbering, CRC-8 (poly 0x07) and CRC-16 (poly
  * 0x8005) from their generator polynomials, and an MD5 of the unencoded
  * PCM that makes the decode self-verifying end to end.
  *
  * Subset: mono, 4..24 bps, fixed blocking. Subframes: CONSTANT,
  * VERBATIM, FIXED orders 0–4, and LPC (orders 1–8, Levinson–Durbin +
  * coefficient quantization) — the encoder cost-compares all of them per
  * block and emits the cheapest, so FlacSpec can force each path with a
  * shaped signal. Residuals are Rice-coded (method 0, 4-bit parameters,
  * escape-to-raw supported both ways); wasted-bits detection/encoding is
  * real (a block of samples sharing k low zero bits shifts them out, per
  * spec §9.2.5). The decoder validates structure the way the GIF/JPEG
  * tiers do: magic, STREAMINFO, frame sync, header CRC-8, frame CRC-16,
  * sample-count reconciliation, and the STREAMINFO MD5 against the
  * decoded PCM — truncation or a flipped bit anywhere raises a typed
  * IllegalArgumentException.
  *
  * Reference anchor: media payloads as opaque binaries + typed metadata
  * (SURVEY §2 multimodal rows); graded end to end by q230 under the q201
  * decode-vs-formula contract.
  */
object Flac {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  final case class FlacStream(sampleRate: Int, bitsPerSample: Int,
                              nFrames: Int, samples: Array[Int])

  /** Encoder decision record per block, for spec assertions: which
    * subframe type won the cost comparison. Types: "constant",
    * "verbatim", "fixed0".."fixed4", "lpc1".."lpc8".
    */
  final case class EncodeStats(subframeTypes: Seq[String])

  // ---- bit I/O (FLAC packs MSB-first, unlike GIF's LSB-first LZW) ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def writeBits(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 57, s"writeBits width $bits")
      if (bits == 0) return
      acc = (acc << bits) | (v & ((1L << bits) - 1))
      n += bits
      while (n >= 8) {
        out.write(((acc >>> (n - 8)) & 0xFF).toInt)
        n -= 8
      }
    }
    /** Unary per spec: q '0' bits terminated by a '1'. */
    def writeUnary(q: Int): Unit = {
      var left = q
      while (left >= 32) { writeBits(0L, 32); left -= 32 }
      writeBits(1L, left + 1)
    }
    def alignByte(): Unit = if (n > 0) writeBits(0L, 8 - n)
    def byteAligned: Boolean = n == 0
    /** Bytes emitted so far — only meaningful when byte-aligned (used to
      * CRC the frame incrementally).
      */
    def bytesSoFar: Array[Byte] = { require(n == 0, "not byte-aligned"); out.toByteArray }
    def size: Int = out.size()
  }

  private final class BitReader(bytes: Array[Byte], var bytePos: Int) {
    private var bitPos = 0 // 0..7, MSB-first within bytePos
    def readBits(bits: Int): Long = {
      var left = bits
      var v = 0L
      while (left > 0) {
        if (bytePos >= bytes.length) fail("truncated FLAC stream (bit read past end)")
        val avail = 8 - bitPos
        val take = math.min(avail, left)
        val cur = bytes(bytePos) & 0xFF
        val chunk = (cur >>> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        left -= take
      }
      v
    }
    def readSigned(bits: Int): Int = {
      val v = readBits(bits)
      ((v << (64 - bits)).toLong >> (64 - bits)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0L) {
        q += 1
        if (q > (1 << 24)) fail("runaway unary code (corrupt Rice stream)")
      }
      q
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def byteAligned: Boolean = bitPos == 0
  }

  // ---- CRCs from their generator polynomials (RFC 9639 §9.1.1/§9.3) ----

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC. */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the whole-frame CRC. */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- UTF-8-style coded numbers (frame index; RFC 9639 §9.1.5) ----

  private def writeUtf8Coded(w: BitWriter, v: Long): Unit = {
    require(v >= 0, s"utf8-coded number must be >= 0, got $v")
    if (v < 0x80) { w.writeBits(v, 8); return }
    val n =
      if (v < 0x800) 2 else if (v < 0x10000) 3 else if (v < 0x200000) 4
      else if (v < 0x4000000) 5 else if (v < 0x80000000L) 6 else 7
    val prefixes = Array(0, 0, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0xFE)
    val firstPayload = 7 - n // payload bits carried by the first byte
    w.writeBits(prefixes(n) | ((v >>> ((n - 1) * 6)) & ((1L << firstPayload) - 1)), 8)
    var i = n - 2
    while (i >= 0) { w.writeBits(0x80L | ((v >>> (i * 6)) & 0x3F), 8); i -= 1 }
  }

  private def readUtf8Coded(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var n = 0
    var mask = 0x40
    while ((first & mask) != 0 && n < 7) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) fail(f"bad UTF-8-coded number lead byte 0x$first%02x")
    var v = (first & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val c = r.readBits(8).toInt
      if ((c & 0xC0) != 0x80) fail(f"bad UTF-8-coded continuation byte 0x$c%02x")
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  // ---- predictors ----

  /** Fixed-predictor residuals of `order` over x (order 0..4): the
    * polynomial predictors from the spec, e.g. order 2:
    * e(i) = x(i) − 2x(i−1) + x(i−2).
    */
  private def fixedResiduals(x: Array[Int], order: Int): Array[Long] = {
    val n = x.length - order
    val e = new Array[Long](math.max(n, 0))
    var i = order
    while (i < x.length) {
      val v: Long = order match {
        case 0 => x(i)
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case 4 => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) - 4L * x(i - 3) + x(i - 4)
      }
      e(i - order) = v
      i += 1
    }
    e
  }

  /** Levinson–Durbin LPC coefficients from the block's autocorrelation —
    * the textbook recursion, no tabulated data. Returns Nil when the
    * signal is degenerate (zero energy).
    */
  private[operators] def levinsonDurbin(x: Array[Int], order: Int): Array[Double] = {
    val n = x.length
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0
      var i = lag
      while (i < n) { s += x(i).toDouble * x(i - lag); i += 1 }
      ac(lag) = s
      lag += 1
    }
    if (ac(0) == 0.0) return Array.empty
    val lpc = new Array[Double](order)
    var err = ac(0)
    var k = 0
    while (k < order) {
      var acc = ac(k + 1)
      var j = 0
      while (j < k) { acc -= lpc(j) * ac(k - j); j += 1 }
      val refl = acc / err
      lpc(k) = refl
      var i = 0
      while (i < k / 2) {
        val t = lpc(i)
        lpc(i) = t - refl * lpc(k - 1 - i)
        lpc(k - 1 - i) = lpc(k - 1 - i) - refl * t
        i += 1
      }
      if (k % 2 == 1) lpc(k / 2) -= refl * lpc(k / 2)
      err *= 1.0 - refl * refl
      if (err <= 0) return lpc.take(k + 1) // perfectly predictable already
      k += 1
    }
    lpc
  }

  /** Quantize LPC coefficients to `precision` bits with a common shift
    * (spec: predictor = (Σ qcoef·x) >> shift, arithmetic shift).
    */
  private def quantizeLpc(coefs: Array[Double], precision: Int): (Array[Int], Int) = {
    val cmax = coefs.map(math.abs).max
    if (cmax <= 0) return (coefs.map(_ => 0), 0)
    // choose shift so the largest coefficient fills the precision
    var shift = precision - 1 - (math.getExponent(cmax) + 1)
    if (shift > 15) shift = 15
    if (shift < 0) shift = 0
    val lim = (1 << (precision - 1)) - 1
    val q = coefs.map { c =>
      math.max(-lim - 1, math.min(lim, math.round(c * (1L << shift)).toInt))
    }
    (q, shift)
  }

  private def lpcResiduals(x: Array[Int], qcoef: Array[Int], shift: Int): Array[Long] = {
    val order = qcoef.length
    val e = new Array[Long](math.max(x.length - order, 0))
    var i = order
    while (i < x.length) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += qcoef(j).toLong * x(i - 1 - j); j += 1 }
      e(i - order) = x(i).toLong - (pred >> shift)
      i += 1
    }
    e
  }

  // ---- Rice residual coding (method 0, one partition) ----

  private def zigzag(e: Long): Long = if (e < 0) -2L * e - 1 else 2L * e

  private def bitsNeededSigned(e: Long): Int = {
    // two's-complement width for the escape (raw) encoding
    var b = 1
    while (b < 32 && (e < -(1L << (b - 1)) || e >= (1L << (b - 1)))) b += 1
    b
  }

  /** (cost in bits, best 4-bit Rice parameter or 15=escape, escape width).
    * The parameter search is NARROWED around the closed-form estimate
    * k₀ ≈ log₂(mean zigzag) (the Rice-optimality result for geometric
    * residuals): scanning k₀±2 instead of all 15 values finds the same
    * optimum for any unimodal cost curve — which the Rice cost in k is —
    * at a third of the encoder's dominant scan work. The escape-to-raw
    * comparison is exact and unchanged.
    */
  private def riceCost(res: Array[Long]): (Long, Int, Int) = {
    var uSum = 0L
    var rawBits = 1
    var i = 0
    while (i < res.length) {
      uSum += zigzag(res(i))
      val b = bitsNeededSigned(res(i)); if (b > rawBits) rawBits = b
      i += 1
    }
    val mean = if (res.isEmpty) 0L else uSum / res.length
    val k0 = if (mean <= 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(mean)
    val lo = math.max(0, k0 - 2)
    val hi = math.min(14, k0 + 2)
    var bestK = lo
    var bestCost = Long.MaxValue
    var k = lo
    while (k <= hi) {
      var c = 0L
      i = 0
      while (i < res.length) { c += (zigzag(res(i)) >>> k) + 1 + k; i += 1 }
      if (c < bestCost) { bestCost = c; bestK = k }
      k += 1
    }
    val rawCost = 5L + rawBits.toLong * res.length
    if (rawCost < bestCost) (rawCost + 6, 15, rawBits) else (bestCost + 6, bestK, rawBits)
  }

  private def writeResiduals(w: BitWriter, res: Array[Long], param: Int,
                             escapeBits: Int): Unit = {
    w.writeBits(0L, 2) // coding method 0: 4-bit Rice parameters
    w.writeBits(0L, 4) // partition order 0: one partition
    w.writeBits(param.toLong, 4)
    if (param == 15) {
      w.writeBits(escapeBits.toLong, 5)
      var i = 0
      while (i < res.length) { w.writeBits(res(i), escapeBits); i += 1 }
    } else {
      var i = 0
      while (i < res.length) {
        val u = zigzag(res(i))
        w.writeUnary((u >>> param).toInt)
        w.writeBits(u, param)
        i += 1
      }
    }
  }

  private def readResiduals(r: BitReader, n: Int, predictorOrder: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    if (method != 0) fail(s"unsupported residual coding method $method")
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    if (n % parts != 0) fail(s"partition order $partOrder does not divide block size $n")
    val res = new Array[Long](n - predictorOrder)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (n >> partOrder) - (if (p == 0) predictorOrder else 0)
      val param = r.readBits(4).toInt
      if (param == 15) {
        val bits = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          res(idx) = if (bits == 0) 0L else r.readSigned(bits).toLong
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | r.readBits(param)
          res(idx) = if ((u & 1L) != 0) -(u >>> 1) - 1 else u >>> 1
          idx += 1; i += 1
        }
      }
      p += 1
    }
    res
  }

  /** Test seams (FlacSpec): the Rice parameter chooser and an isolated
    * residual round trip — the escape path is hard to force through a
    * whole-stream encode (wide-but-uniform residuals usually lose to
    * VERBATIM at the subframe level), so it is pinned here directly.
    */
  private[operators] def riceCostForTest(res: Array[Long]): (Long, Int, Int) = riceCost(res)

  private[operators] def riceRoundTrip(res: Array[Long], n: Int, order: Int): Array[Long] = {
    val w = new BitWriter
    val (_, param, escBits) = riceCost(res)
    writeResiduals(w, res, param, escBits)
    w.alignByte()
    readResiduals(new BitReader(w.bytesSoFar, 0), n, order)
  }

  // ---- encoder ----

  /** Encode mono PCM as a real FLAC stream. Each block cost-compares
    * CONSTANT / VERBATIM / FIXED 0–4 / LPC (Levinson–Durbin, orders
    * [[LpcOrders]], 12-bit coefficients) and emits the cheapest; wasted
    * bits are detected and shifted out per spec.
    */
  def encodeFlac(samples: Array[Int], sampleRate: Int, bitsPerSample: Int = 16,
                 blockSize: Int = 4096): Array[Byte] =
    encodeFlacWithStats(samples, sampleRate, bitsPerSample, blockSize)._1

  private val LpcOrders = Seq(2, 4, 8)
  private val LpcPrecision = 12

  def encodeFlacWithStats(samples: Array[Int], sampleRate: Int,
                          bitsPerSample: Int = 16,
                          blockSize: Int = 4096): (Array[Byte], EncodeStats) = {
    require(samples.nonEmpty, "empty sample stream")
    require(bitsPerSample >= 4 && bitsPerSample <= 24, s"bps $bitsPerSample")
    require(blockSize >= 16 && blockSize <= 65535, s"block size $blockSize")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sample rate $sampleRate")
    val lo = -(1 << (bitsPerSample - 1)); val hi = (1 << (bitsPerSample - 1)) - 1
    samples.foreach(s => require(s >= lo && s <= hi, s"sample $s outside $bitsPerSample-bit range"))

    val md5 = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { s => // spec: MD5 of the little-endian unencoded PCM
      var i = 0
      while (i < (bitsPerSample + 7) / 8) { md5.update(((s >> (8 * i)) & 0xFF).toByte); i += 1 }
    }

    val types = scala.collection.mutable.ArrayBuffer.empty[String]
    val frames = new java.io.ByteArrayOutputStream()
    var frameIdx = 0L
    var off = 0
    var minFrame = Int.MaxValue; var maxFrame = 0
    var minBlock = Int.MaxValue; var maxBlock = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val block = java.util.Arrays.copyOfRange(samples, off, off + n)
      val frame = encodeFrame(block, frameIdx, bitsPerSample, types)
      frames.write(frame)
      minFrame = math.min(minFrame, frame.length); maxFrame = math.max(maxFrame, frame.length)
      minBlock = math.min(minBlock, n); maxBlock = math.max(maxBlock, n)
      frameIdx += 1
      off += n
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val w = new BitWriter
    w.writeBits(1L, 1) // last metadata block
    w.writeBits(0L, 7) // type STREAMINFO
    w.writeBits(34L, 24)
    w.writeBits(minBlock.toLong, 16)
    w.writeBits(maxBlock.toLong, 16)
    w.writeBits(minFrame.toLong, 24)
    w.writeBits(maxFrame.toLong, 24)
    w.writeBits(sampleRate.toLong, 20)
    w.writeBits(0L, 3) // channels - 1 (mono)
    w.writeBits((bitsPerSample - 1).toLong, 5)
    w.writeBits(samples.length.toLong, 36)
    val streamInfo = w.bytesSoFar
    out.write(streamInfo)
    out.write(md5.digest())
    frames.writeTo(out)
    (out.toByteArray, EncodeStats(types.toSeq))
  }

  private def encodeFrame(x: Array[Int], frameIdx: Long, bps: Int,
                          types: scala.collection.mutable.ArrayBuffer[String]): Array[Byte] = {
    val n = x.length
    val w = new BitWriter
    w.writeBits(0x3FFEL, 14) // sync
    w.writeBits(0L, 1) // reserved
    w.writeBits(0L, 1) // fixed blocking: the coded number is a frame index
    w.writeBits(7L, 4) // block size: 16-bit field at end of header, minus 1
    w.writeBits(0L, 4) // sample rate: from STREAMINFO
    w.writeBits(0L, 4) // channel assignment: mono
    val bpsBits = bps match {
      case 8 => 1L; case 12 => 2L; case 16 => 4L; case 20 => 5L; case 24 => 6L
      case _ => 0L // from STREAMINFO
    }
    w.writeBits(bpsBits, 3)
    w.writeBits(0L, 1) // reserved
    writeUtf8Coded(w, frameIdx)
    w.writeBits((n - 1).toLong, 16)
    val headerBytes = w.bytesSoFar
    w.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)

    // wasted bits: the largest k with every sample divisible by 2^k
    var wasted = 0
    if (x.exists(_ != 0)) {
      wasted = bps - 1
      var i = 0
      while (i < n && wasted > 0) {
        if (x(i) != 0) wasted = math.min(wasted, java.lang.Integer.numberOfTrailingZeros(x(i)))
        i += 1
      }
    }
    val eff = bps - wasted
    val y = if (wasted == 0) x else x.map(_ >> wasted)

    // Predictor selection, the standard two-stage encoder shape: estimate
    // every candidate's bit cost in ONE O(n) pass over its residuals
    // (closed-form Rice cost at k₀ = log₂(mean zigzag), plus the
    // candidate's header/warmup/coefficient overhead), then run the exact
    // Rice parameter search only on the winner. Ranking by estimated BIT
    // cost (not mean |residual|) keeps the LPC coefficient overhead in
    // the comparison, so a fixed predictor still wins when LPC's residual
    // edge is smaller than its 12-bit-per-coefficient price.
    final case class Cand(tag: String, order: Int, res: Array[Long],
                          overhead: Long, qc: Array[Int], shift: Int)
    def estCost(res: Array[Long], overhead: Long): Long = {
      var uSum = 0L
      var i = 0
      while (i < res.length) { uSum += zigzag(res(i)); i += 1 }
      val mean = if (res.isEmpty) 0L else uSum / res.length
      val k0 = if (mean <= 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(mean)
      (uSum >>> k0) + res.length.toLong * (1 + k0) + overhead
    }
    val constant = y.forall(_ == y(0))
    var bestType = "verbatim"
    var bestCost = n.toLong * eff
    var bestFixed = -1
    var bestRice: (Long, Int, Int) = null
    var bestLpc: (Array[Int], Int, Array[Long], (Long, Int, Int)) = null
    if (!constant) {
      val cands = scala.collection.mutable.ArrayBuffer.empty[Cand]
      var order = 0
      while (order <= 4 && order < n) {
        cands += Cand(s"fixed$order", order, fixedResiduals(y, order),
          order.toLong * eff, null, 0)
        order += 1
      }
      LpcOrders.foreach { order =>
        if (order < n) {
          val coefs = levinsonDurbin(y, order)
          if (coefs.length == order) {
            val (qc, shift) = quantizeLpc(coefs, LpcPrecision)
            cands += Cand(s"lpc$order", order, lpcResiduals(y, qc, shift),
              order.toLong * eff + 4 + 5 + order.toLong * LpcPrecision, qc, shift)
          }
        }
      }
      val win = cands.minBy(c => estCost(c.res, c.overhead))
      val rc = riceCost(win.res)
      val cost = win.overhead + rc._1
      if (cost < bestCost) {
        bestCost = cost; bestType = win.tag; bestRice = rc
        if (win.qc == null) bestFixed = win.order
        else bestLpc = (win.qc, win.shift, win.res, rc)
      }
    } else bestType = "constant"
    types += bestType

    def writeSubframeHeader(typeBits: Int): Unit = {
      w.writeBits(0L, 1) // zero pad
      w.writeBits(typeBits.toLong, 6)
      if (wasted == 0) w.writeBits(0L, 1)
      else { w.writeBits(1L, 1); w.writeUnary(wasted - 1) }
    }
    bestType match {
      case "constant" =>
        writeSubframeHeader(0)
        w.writeBits(y(0).toLong, eff)
      case "verbatim" =>
        writeSubframeHeader(1)
        var i = 0
        while (i < n) { w.writeBits(y(i).toLong, eff); i += 1 }
      case t if t.startsWith("fixed") =>
        writeSubframeHeader(8 + bestFixed)
        var i = 0
        while (i < bestFixed) { w.writeBits(y(i).toLong, eff); i += 1 }
        writeResiduals(w, fixedResiduals(y, bestFixed), bestRice._2, bestRice._3)
      case t if t.startsWith("lpc") =>
        val (qc, shift, res, rc) = bestLpc
        val order = qc.length
        writeSubframeHeader(32 + order - 1)
        var i = 0
        while (i < order) { w.writeBits(y(i).toLong, eff); i += 1 }
        w.writeBits((LpcPrecision - 1).toLong, 4)
        w.writeBits(shift.toLong, 5)
        qc.foreach(c => w.writeBits(c.toLong, LpcPrecision))
        writeResiduals(w, res, rc._2, rc._3)
    }
    w.alignByte()
    val body = w.bytesSoFar
    w.writeBits(crc16(body, 0, body.length).toLong, 16)
    w.bytesSoFar
  }

  // ---- decoder ----

  /** Parse and fully decode a FLAC stream: validates magic, STREAMINFO,
    * every frame's sync + CRC-8 + CRC-16, reconciles the decoded sample
    * count with STREAMINFO, and checks the PCM MD5.
    */
  def decodeFlac(bytes: Array[Byte]): FlacStream = {
    if (bytes.length < 4 + 4 + 34 ||
      new String(bytes.slice(0, 4), "US-ASCII") != "fLaC") fail("bad FLAC magic")
    val r = new BitReader(bytes, 4)
    // metadata blocks: STREAMINFO must be first; skip any others
    var last = false
    var sampleRate = -1; var bps = -1; var total = -1L
    var md5Expect: Array[Byte] = null
    var first = true
    while (!last) {
      last = r.readBits(1) == 1L
      val btype = r.readBits(7).toInt
      val len = r.readBits(24).toInt
      if (first) {
        if (btype != 0) fail(s"first metadata block must be STREAMINFO, got type $btype")
        if (len != 34) fail(s"STREAMINFO length $len != 34")
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        sampleRate = r.readBits(20).toInt
        val channels = r.readBits(3).toInt + 1
        if (channels != 1) fail(s"only mono supported, got $channels channels")
        bps = r.readBits(5).toInt + 1
        total = r.readBits(36)
        md5Expect = new Array[Byte](16)
        var i = 0
        while (i < 16) { md5Expect(i) = r.readBits(8).toByte; i += 1 }
        first = false
      } else {
        var i = 0
        while (i < len) { r.readBits(8); i += 1 }
      }
    }
    if (sampleRate <= 0) fail("bad sample rate in STREAMINFO")
    if (total <= 0 || total > Int.MaxValue) fail(s"bad total sample count $total")

    val out = new Array[Int](total.toInt)
    var outLen = 0
    var nFrames = 0
    var expectIdx = 0L
    while (outLen < total) {
      val frameStart = r.bytePos
      if (!r.byteAligned) fail("frame does not start byte-aligned")
      val sync = r.readBits(14)
      if (sync != 0x3FFE) fail(f"bad frame sync 0x$sync%x at byte $frameStart")
      if (r.readBits(1) != 0L) fail("nonzero reserved bit in frame header")
      val blocking = r.readBits(1)
      val bsBits = r.readBits(4).toInt
      val srBits = r.readBits(4).toInt
      val chan = r.readBits(4).toInt
      if (chan != 0) fail(s"only mono supported, channel assignment $chan")
      val bpsBits = r.readBits(3).toInt
      val frameBps = bpsBits match {
        case 0 => bps; case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24
        case b => fail(s"reserved bps code $b")
      }
      if (frameBps != bps) fail(s"frame bps $frameBps != STREAMINFO bps $bps")
      if (r.readBits(1) != 0L) fail("nonzero reserved bit in frame header")
      val coded = readUtf8Coded(r)
      if (blocking == 0L && coded != expectIdx)
        fail(s"frame index $coded, expected $expectIdx")
      val n = bsBits match {
        case 1 => 192
        case b if b >= 2 && b <= 5 => 576 << (b - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case b if b >= 8 => 256 << (b - 8)
        case _ => fail("reserved block size code 0")
      }
      srBits match {
        case 0 => ()
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => fail("invalid sample rate code 15")
        case _ => () // table-coded rates carry no extra field
      }
      val headerCrc = crc8(bytes, frameStart, r.bytePos)
      if (r.readBits(8).toInt != headerCrc) fail(s"frame $expectIdx header CRC-8 mismatch")
      if (outLen + n > total) fail(s"frames decode past STREAMINFO total ($outLen + $n > $total)")

      val x = decodeSubframe(r, n, bps)
      r.alignByte()
      val frameCrc = crc16(bytes, frameStart, r.bytePos)
      if (r.readBits(16).toInt != frameCrc) fail(s"frame $expectIdx CRC-16 mismatch")
      System.arraycopy(x, 0, out, outLen, n)
      outLen += n
      nFrames += 1
      expectIdx += 1
    }
    if (outLen != total) fail(s"decoded $outLen of $total samples")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    out.foreach { s =>
      var i = 0
      while (i < (bps + 7) / 8) { md5.update(((s >> (8 * i)) & 0xFF).toByte); i += 1 }
    }
    if (!java.util.Arrays.equals(md5.digest(), md5Expect))
      fail("decoded PCM fails the STREAMINFO MD5 check")
    FlacStream(sampleRate, bps, nFrames, out)
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Int] = {
    if (r.readBits(1) != 0L) fail("nonzero subframe header pad bit")
    val t = r.readBits(6).toInt
    val wasted =
      if (r.readBits(1) == 0L) 0
      else r.readUnary() + 1
    val eff = bps - wasted
    if (eff <= 0) fail(s"wasted bits $wasted leave no sample bits")
    val y = new Array[Int](n)
    t match {
      case 0 =>
        val v = r.readSigned(eff)
        java.util.Arrays.fill(y, v)
      case 1 =>
        var i = 0
        while (i < n) { y(i) = r.readSigned(eff); i += 1 }
      case o if o >= 8 && o <= 12 =>
        val order = o - 8
        if (order > n) fail(s"fixed order $order exceeds block size $n")
        var i = 0
        while (i < order) { y(i) = r.readSigned(eff); i += 1 }
        val res = readResiduals(r, n, order)
        i = order
        while (i < n) {
          val pred: Long = order match {
            case 0 => 0L
            case 1 => y(i - 1).toLong
            case 2 => 2L * y(i - 1) - y(i - 2)
            case 3 => 3L * y(i - 1) - 3L * y(i - 2) + y(i - 3)
            case 4 => 4L * y(i - 1) - 6L * y(i - 2) + 4L * y(i - 3) - y(i - 4)
          }
          val v = pred + res(i - order)
          if (v < Int.MinValue || v > Int.MaxValue) fail("sample overflow in fixed predictor")
          y(i) = v.toInt
          i += 1
        }
      case o if o >= 32 =>
        val order = o - 32 + 1
        if (order > n) fail(s"LPC order $order exceeds block size $n")
        var i = 0
        while (i < order) { y(i) = r.readSigned(eff); i += 1 }
        val precision = r.readBits(4).toInt + 1
        if (precision == 16) fail("invalid LPC precision code 15")
        val shift = r.readBits(5).toInt
        val qc = new Array[Int](order)
        i = 0
        while (i < order) { qc(i) = r.readSigned(precision); i += 1 }
        val res = readResiduals(r, n, order)
        i = order
        while (i < n) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += qc(j).toLong * y(i - 1 - j); j += 1 }
          val v = (pred >> shift) + res(i - order)
          if (v < Int.MinValue || v > Int.MaxValue) fail("sample overflow in LPC predictor")
          y(i) = v.toInt
          i += 1
        }
      case o => fail(s"reserved subframe type $o")
    }
    if (wasted == 0) y else y.map(_ << wasted)
  }
}
