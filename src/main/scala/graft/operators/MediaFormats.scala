package graft.operators

/** Real, dependency-free binary media formats: P6 PPM (image), PCM16 and
  * G.711 μ-law WAV (audio) builders + parsers. These need no codec
  * library, so the multimodal pipeline can exercise REAL decode (header
  * parse, dimension/rate extraction, companded-sample expansion, signal
  * statistics) inside executors even in this codec-less container.
  * Compressed image decode has a dependency-free baseline in
  * [[graft.operators.Jpeg]]; μ-law is the compressed-audio analog here;
  * MP3/H.264 stay behind the documented [[Multimodal.MediaCodec]] stub
  * seam.
  */
object MediaFormats {

  /** Deterministic pixel byte i for media id: (id*31 + i*7) mod 256 —
    * mirrored in the q56 DuckDB oracle.
    */
  def pixelByte(id: Long, i: Long): Int = (((id * 31 + i * 7) % 256) + 256).toInt % 256

  /** Deterministic PCM16 sample i for media id: ((id*13 + i*11) mod 65536)
    * − 32768 — mirrored in the q56 oracle.
    */
  def pcmSample(id: Long, i: Long): Int = ((((id * 13 + i * 11) % 65536) + 65536) % 65536).toInt - 32768

  /** Deterministic G.711 μ-law byte i for media id: (id*13 + i*11) mod 256
    * — mirrored in the q75 oracle. The encoded stream is the generator
    * (every byte value is a valid μ-law code), so the decode path is
    * exercised on real companded data with a closed-form oracle.
    */
  def mulawByte(id: Long, i: Long): Int = (((id * 13 + i * 11) % 256) + 256).toInt % 256

  private val MulawBias = 0x84 // 132, the G.711 μ-law bias
  private val MulawClip = 32635

  /** G.711 μ-law expansion: 8-bit code → 16-bit PCM (CCITT G.711). */
  def mulawDecode(b: Int): Int = {
    val u = ~b & 0xFF
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0F
    val magnitude = (((mantissa << 3) + MulawBias) << exponent) - MulawBias
    if ((u & 0x80) != 0) -magnitude else magnitude
  }

  /** G.711 μ-law compression: 16-bit PCM → 8-bit code (CCITT G.711).
    * Inverse of [[mulawDecode]] on representable samples; MulawSpec pins
    * the round-trip algebra.
    */
  def mulawEncode(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    var x = math.min(if (sample < 0) -sample else sample, MulawClip) + MulawBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (x & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (x >> (exponent + 3)) & 0x0F
    ~(sign | (exponent << 4) | mantissa) & 0xFF
  }

  /** Binary PPM (P6): ASCII header `P6\n<w> <h>\n255\n` + w*h*3 raw bytes. */
  def buildPpm(id: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = pixelByte(id, i).toByte; i += 1 }
    header ++ px
  }

  case class Ppm(width: Int, height: Int, pixels: Array[Byte])

  /** Serialize a decoded PPM back to P6 bytes (inverse of [[parsePpm]]). */
  def encodePpm(p: Ppm): Array[Byte] =
    s"P6\n${p.width} ${p.height}\n255\n".getBytes("US-ASCII") ++ p.pixels

  /** Average-hash (aHash) perceptual fingerprint of a decoded PPM — the
    * image near-dup primitive: the GREEN channel mean-pools onto an 8×8
    * grid (pixel (x, y) → cell (8x div w, 8y div h); cell value =
    * integer mean), each cell compares against the integer mean of the
    * 64 cell values, and the 64 comparison bits pack row-major
    * (idx = by·8 + bx). ALL-INTEGER — pooling, thresholds, packing — so
    * a DuckDB oracle recomputes the hash bit-for-bit from the pixel
    * formula while THIS path computes it from the parsed binary.
    * Returned as (hi, lo) unsigned 32-bit halves (bit 63 would wrap a
    * signed BIGINT in SQL) plus the popcount.
    */
  def aHashPpm(p: Ppm): (Long, Long, Int) = {
    val w = p.width; val h = p.height
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = 8 * y / h
      var x = 0
      while (x < w) {
        val bx = 8 * x / w
        val cell = by * 8 + bx
        sums(cell) += (p.pixels(3 * (y * w + x) + 1) & 0xFF).toLong
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    val cellMeans = new Array[Long](64)
    var i = 0
    var total = 0L
    while (i < 64) {
      cellMeans(i) = if (counts(i) == 0) 0L else sums(i) / counts(i)
      total += cellMeans(i)
      i += 1
    }
    val m = total / 64
    var hi = 0L; var lo = 0L; var pop = 0
    i = 0
    while (i < 64) {
      if (cellMeans(i) > m) {
        if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
        pop += 1
      }
      i += 1
    }
    (hi, lo, pop)
  }

  /** Nearest-neighbor resample to (tw, th): target pixel (x, y) reads
    * source pixel (⌊x·sw/tw⌋, ⌊y·sh/th⌋) — the standard NN resize, fully
    * integer so the q79 oracle recomputes it in closed form.
    */
  def resizePpm(src: Ppm, tw: Int, th: Int): Ppm = {
    require(tw > 0 && th > 0, s"bad target dims ${tw}x$th")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * src.height / th
      var x = 0
      while (x < tw) {
        val sx = x * src.width / tw
        var c = 0
        while (c < 3) {
          out((y * tw + x) * 3 + c) = src.pixels((sy * src.width + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Ppm(tw, th, out)
  }

  /** Parse a P6 PPM: whitespace-tokenized header then raw pixel plane. */
  def parsePpm(bytes: Array[Byte]): Ppm = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      var v = 0
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
    require(maxVal == 255, s"unsupported maxval $maxVal")
    pos += 1 // single whitespace after maxval per spec
    // long arithmetic + payload bound BEFORE allocating: a corrupt header
    // declaring huge dims must fail fast, not allocate w*h*3 (OOM) — the
    // parser runs on executor-side untrusted bytes
    val need = w.toLong * h * 3
    require(need >= 0 && pos + need <= bytes.length,
      s"truncated PPM: declared ${w}x$h needs $need bytes, have ${bytes.length - pos}")
    Ppm(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt))
  }

  /** Minimal mono PCM16 WAV: RIFF + fmt(16) + data chunks, little-endian. */
  def buildWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)  // byte rate
      .putShort(2).putShort(16)                   // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { buf.putShort(pcmSample(id, i).toShort); i += 1 }
    buf.array()
  }

  /** Mono G.711 μ-law WAV (format tag 7): RIFF + fmt(18, with the cbSize=0
    * extension the spec requires for non-PCM tags) + data, one byte per
    * sample. Data bytes are [[mulawByte]], i.e. the compressed stream IS
    * the generator — the parser's μ-law expansion is what q75 grades.
    */
  def buildMulawWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(46 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(38 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7).putShort(1)                    // μ-law, mono
      .putInt(sampleRate).putInt(sampleRate)      // byte rate = rate (1 B/sample)
      .putShort(1).putShort(8)                    // block align, bits
      .putShort(0)                                // cbSize
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
    var i = 0
    while (i < nSamples) { buf.put(mulawByte(id, i).toByte); i += 1 }
    buf.array()
  }

  /** Minimal Y4M (YUV4MPEG2) video: ASCII stream header
    * `YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C420jpeg\n`, then per frame
    * a `FRAME\n` marker followed by raw 4:2:0 planes (Y = w*h bytes, then
    * U and V at w/2*h/2 each). Frame bytes are [[pixelByte]] over a global
    * index across the concatenated frame data (headers excluded), so the
    * decoded luma statistics are oracle-computable. w and h must be even.
    */
  def buildY4m(id: Long, w: Int, h: Int, nFrames: Int, fpsNum: Int, fpsDen: Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dims")
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val frameSize = w * h * 3 / 2
    val out = new java.io.ByteArrayOutputStream(header.length + nFrames * (frameMark.length + frameSize))
    out.write(header)
    var gi = 0L
    var f = 0
    while (f < nFrames) {
      out.write(frameMark)
      var i = 0
      while (i < frameSize) { out.write(pixelByte(id, gi)); gi += 1; i += 1 }
      f += 1
    }
    out.toByteArray
  }

  case class Y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                 frames: Array[Array[Byte]]) {
    /** Mean of the luma (Y) plane across all frames — exact integer sum,
      * one final division, so it is cross-engine deterministic.
      */
    def lumaMean: Double = {
      val ySize = width * height
      var s = 0L
      var n = 0L
      frames.foreach { fr =>
        var i = 0
        while (i < ySize) { s += (fr(i) & 0xff); i += 1 }
        n += ySize
      }
      if (n == 0) 0.0 else s.toDouble / n
    }
  }

  /** Parse a Y4M stream: tokenize the header line (W/H/F parameters),
    * then walk `FRAME` markers collecting raw 4:2:0 planes.
    */
  def parseY4m(bytes: Array[Byte]): Y4m = {
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 1 // consume newline
      s
    }
    val header = line()
    val toks = header.split(' ')
    require(toks.headOption.contains("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    // header numbers parse via a typed path: garbage like "Wx" or "F30"
    // (no colon) must raise IllegalArgumentException, not NumberFormat/
    // MatchError — the parser runs on executor-side untrusted bytes
    def num(s: String, what: String): Int =
      try s.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"bad Y4M $what: '$s' in $header")
      }
    var w = 0; var h = 0; var fpsNum = 0; var fpsDen = 1
    toks.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = num(t.substring(1), "width")
        case 'H' => h = num(t.substring(1), "height")
        case 'F' =>
          t.substring(1).split(':') match {
            case Array(n, d) => fpsNum = num(n, "fps num"); fpsDen = num(d, "fps den")
            case _ => throw new IllegalArgumentException(s"bad Y4M fps: '$t'")
          }
        case _ => () // Ip / A1:1 / C420jpeg — accepted, not needed
      }
    }
    require(w > 0 && h > 0 && fpsNum > 0, s"bad Y4M header: $header")
    // long arithmetic: declared dims near 2^16 would overflow w*h*3/2 and
    // wrap the per-frame truncation check (a 0-frame stream with huge
    // declared dims is still valid — the bound applies per FRAME)
    val frameSizeL = w.toLong * h * 3 / 2
    val frames = Array.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      val mark = line() // FRAME plus optional per-frame params
      require(mark.startsWith("FRAME"), s"bad frame marker: $mark")
      require(pos + frameSizeL <= bytes.length,
        s"truncated Y4M frame: ${w}x$h needs $frameSizeL bytes, have ${bytes.length - pos}")
      val frameSize = frameSizeL.toInt // <= bytes.length, so Int-safe
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + frameSize)
      pos += frameSize
    }
    Y4m(w, h, fpsNum, fpsDen, frames.result())
  }

  /** Energy-contour fingerprint of decoded PCM16 audio — the audio twin
    * of [[aHashPpm]]: samples split into 16 contiguous windows
    * (sample i → window 16·i div n), each window's integer mean |sample|
    * compares against the integer mean of the 16 window values, and the
    * 16 comparison bits pack LSB-first into an Int. All-integer, so the
    * oracle recomputes it from the sample formula while this path parses
    * the RIFF binary. 16 bits is the coarse "loudness shape" signature —
    * the blocking key an audio near-dup pass buckets on.
    */
  def energyFingerprint(w: Wav): (Int, Int) = {
    val n = w.samples.length
    val sums = new Array[Long](16)
    val counts = new Array[Long](16)
    var i = 0
    while (i < n) {
      val win = (16L * i / n).toInt
      sums(win) += math.abs(w.samples(i).toLong)
      counts(win) += 1L
      i += 1
    }
    val means = new Array[Long](16)
    var total = 0L
    var j = 0
    while (j < 16) {
      means(j) = if (counts(j) == 0) 0L else sums(j) / counts(j)
      total += means(j)
      j += 1
    }
    val m = total / 16
    var sig = 0; var pop = 0
    j = 0
    while (j < 16) {
      if (means(j) > m) { sig |= 1 << j; pop += 1 }
      j += 1
    }
    (sig, pop)
  }

  case class Wav(sampleRate: Int, samples: Array[Short])

  /** Parse a PCM16 mono WAV by walking RIFF chunks to fmt/data. Every
    * declared chunk length is validated against the remaining payload
    * BEFORE any seek or allocation (untrusted executor-side bytes:
    * a corrupt `data` length must not allocate, a negative length must
    * not seek backwards into an infinite loop), and a short buffer raises
    * IllegalArgumentException rather than BufferUnderflow.
    */
  def parseWav(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def need(n: Int, what: String): Unit =
      require(buf.remaining() >= n, s"truncated WAV: $what needs $n bytes, have ${buf.remaining()}")
    def tag(): String = { need(4, "chunk tag"); val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not RIFF"); need(4, "RIFF size"); buf.getInt()
    require(tag() == "WAVE", "not WAVE")
    var rate = 0
    var fmtTag = 0
    var dataBytes: Array[Byte] = null
    while (buf.remaining() >= 8 && (rate == 0 || dataBytes == null)) {
      val id = tag(); val len = buf.getInt()
      require(len >= 0, s"negative chunk length $len for '$id'")
      require(len <= buf.remaining(), s"truncated WAV: chunk '$id' declares $len bytes, have ${buf.remaining()}")
      id match {
        case "fmt " =>
          require(len >= 8, s"fmt chunk too short: $len")
          val fmt = buf.getShort(); val ch = buf.getShort()
          require((fmt == 1 || fmt == 7) && ch == 1, "only PCM/mu-law mono supported")
          fmtTag = fmt
          rate = buf.getInt()
          buf.position(buf.position() + len - 8)
        case "data" =>
          dataBytes = new Array[Byte](len)
          buf.get(dataBytes)
        case _ => buf.position(buf.position() + len)
      }
    }
    require(rate > 0 && dataBytes != null, "missing fmt/data chunk")
    val samples =
      if (fmtTag == 1) {
        val db = java.nio.ByteBuffer.wrap(dataBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Short](dataBytes.length / 2)
        var i = 0
        while (i < out.length) { out(i) = db.getShort(); i += 1 }
        out
      } else {
        val out = new Array[Short](dataBytes.length) // μ-law: 1 byte/sample, expand
        var i = 0
        while (i < out.length) { out(i) = mulawDecode(dataBytes(i) & 0xFF).toShort; i += 1 }
        out
      }
    Wav(rate, samples)
  }
}
