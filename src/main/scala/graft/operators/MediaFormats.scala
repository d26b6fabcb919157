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
    Ppm(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
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

  case class Wav(sampleRate: Int, samples: Array[Short])

  /** Parse a PCM16 mono WAV by walking RIFF chunks to fmt/data. */
  def parseWav(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not RIFF"); buf.getInt()
    require(tag() == "WAVE", "not WAVE")
    var rate = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (rate == 0 || samples == null)) {
      val id = tag(); val len = buf.getInt()
      id match {
        case "fmt " =>
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
