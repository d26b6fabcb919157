package graft.operators

/** Real, dependency-free binary media formats: P6 PPM (image) and PCM16
  * WAV (audio) builders + parsers. These are self-describing formats that
  * need no codec library, so the multimodal pipeline can exercise REAL
  * decode (header parse, dimension/rate extraction, signal statistics)
  * inside executors even in this codec-less container. Compressed formats
  * (JPEG/MP3/H.264) stay behind the documented [[Multimodal.MediaCodec]]
  * stub seam.
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

  /** Binary PPM (P6): ASCII header `P6\n<w> <h>\n255\n` + w*h*3 raw bytes. */
  def buildPpm(id: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = pixelByte(id, i).toByte; i += 1 }
    header ++ px
  }

  case class Ppm(width: Int, height: Int, pixels: Array[Byte])

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
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (rate == 0 || samples == null)) {
      val id = tag(); val len = buf.getInt()
      require(len >= 0, s"negative chunk length $len for '$id'")
      require(len <= buf.remaining(), s"truncated WAV: chunk '$id' declares $len bytes, have ${buf.remaining()}")
      id match {
        case "fmt " =>
          require(len >= 8, s"fmt chunk too short: $len")
          val fmt = buf.getShort(); val ch = buf.getShort()
          require(fmt == 1 && ch == 1, "only PCM mono supported")
          rate = buf.getInt()
          buf.position(buf.position() + len - 8)
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ => buf.position(buf.position() + len)
      }
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    Wav(rate, samples)
  }
}
