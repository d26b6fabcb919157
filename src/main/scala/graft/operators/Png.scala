package graft.operators

/** Dependency-free PNG codec (W3C PNG / RFC 2083 subset) over
  * [[Deflate]]'s from-spec zlib — completing the lossless-image matrix
  * beside GIF/LZW (q201): PNG is the one with real entropy coding under
  * it, and its container (length-typed chunks, CRC-32 over type+data,
  * filtered scanlines) is fully derivable from the public spec.
  *
  * Supported pixel formats: 8-bit truecolor RGB (color type 2) and 8-bit
  * grayscale (color type 0), no interlace — the shapes a training-data
  * pipeline's thumbnails/tiles use. Encoder picks the per-scanline filter
  * (None/Sub/Up/Average/Paeth) by the spec's minimum-sum-of-absolute-
  * differences heuristic; decoder validates EVERYTHING the format pins:
  * signature, per-chunk CRC-32, IHDR ranges, zlib Adler-32 (via
  * [[Deflate.zlibDecompress]]), filter-type bytes, exact filtered-stream
  * length, IEND presence. Cross-validated both directions against
  * `javax.imageio` (an independent implementation in the public JDK) in
  * PngSpec — the q201/q230/q237 independent-reference contract.
  */
object Png {

  final class PngError(msg: String) extends RuntimeException(msg)

  /** Interleaved pixels: 3·w·h bytes RGB (channels=3) or w·h gray (=1). */
  case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte]) {
    require(channels == 1 || channels == 3, s"unsupported channel count $channels")
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
  }

  private val Signature = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  // ------------------------------------------------------------------ encode

  /** Encode with the min-sum-of-abs heuristic; `forceFilter` pins one
    * filter type for every scanline (spec/test hook — guarantees each
    * decode path is exercised).
    */
  def encodePng(img: Image, forceFilter: Option[Int] = None): Array[Byte] = {
    val bpp = img.channels
    val stride = img.width * bpp
    val filtered = new Array[Byte](img.height * (stride + 1))
    val prior = new Array[Byte](stride) // zero row above the first scanline
    var y = 0
    while (y < img.height) {
      val row = java.util.Arrays.copyOfRange(img.pixels, y * stride, (y + 1) * stride)
      val candidates = forceFilter.map(Seq(_)).getOrElse(0 to 4)
      var bestF = -1; var bestCost = Long.MaxValue; var bestOut: Array[Byte] = null
      candidates.foreach { f =>
        val out = filterRow(f, row, if (y == 0) prior else java.util.Arrays.copyOfRange(img.pixels, (y - 1) * stride, y * stride), bpp)
        var cost = 0L
        out.foreach(b => cost += math.abs(b.toInt))
        if (cost < bestCost) { bestCost = cost; bestF = f; bestOut = out }
      }
      filtered(y * (stride + 1)) = bestF.toByte
      System.arraycopy(bestOut, 0, filtered, y * (stride + 1) + 1, stride)
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put((if (img.channels == 3) 2 else 0).toByte) // color type
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", Deflate.zlibCompress(filtered))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def filterRow(f: Int, row: Array[Byte], prior: Array[Byte], bpp: Int): Array[Byte] = {
    val out = new Array[Byte](row.length)
    var i = 0
    while (i < row.length) {
      val x = row(i) & 0xFF
      val a = if (i >= bpp) row(i - bpp) & 0xFF else 0
      val b = prior(i) & 0xFF
      val c = if (i >= bpp) prior(i - bpp) & 0xFF else 0
      out(i) = (f match {
        case 0 => x
        case 1 => x - a
        case 2 => x - b
        case 3 => x - ((a + b) >> 1)
        case 4 => x - paeth(a, b, c)
      }).toByte
      i += 1
    }
    out
  }

  /** Paeth predictor (spec §6.6): nearest of a/b/c to p = a + b − c,
    * ties broken a, then b.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val typAndData = typ.getBytes("US-ASCII") ++ data
    out.write(typAndData, 0, typAndData.length)
    val crc = java.nio.ByteBuffer.allocate(4)
      .putInt(Deflate.crc32(typAndData, 0, typAndData.length).toInt).array()
    out.write(crc, 0, 4)
  }

  // ------------------------------------------------------------------ decode

  def decodePng(bytes: Array[Byte]): Image = {
    if (bytes.length < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), Signature))
      throw new PngError("bad PNG signature")
    var pos = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    var sawHdr = false
    while (!sawEnd) {
      if (pos + 12 > bytes.length) throw new PngError("truncated chunk header")
      val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      // compare in Long: a hostile len near Int.MaxValue would wrap the
      // Int sum negative and sail past this check
      if (len < 0 || pos.toLong + 12L + len > bytes.length)
        throw new PngError("chunk length past EOF")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crcGot = java.nio.ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt.toLong & 0xFFFFFFFFL
      if (crcGot != Deflate.crc32(bytes, pos + 4, pos + 8 + len))
        throw new PngError(s"chunk $typ CRC-32 mismatch")
      val dataOff = pos + 8
      typ match {
        case "IHDR" =>
          if (sawHdr) throw new PngError("duplicate IHDR")
          if (len != 13) throw new PngError("IHDR length must be 13")
          val bb = java.nio.ByteBuffer.wrap(bytes, dataOff, 13)
          width = bb.getInt; height = bb.getInt
          val depth = bb.get() & 0xFF
          val color = bb.get() & 0xFF
          val comp = bb.get() & 0xFF; val filt = bb.get() & 0xFF; val inter = bb.get() & 0xFF
          if (width <= 0 || height <= 0) throw new PngError("non-positive dimensions")
          if (depth != 8) throw new PngError(s"unsupported bit depth $depth")
          channels = color match {
            case 0 => 1
            case 2 => 3
            case other => throw new PngError(s"unsupported color type $other")
          }
          if (comp != 0 || filt != 0) throw new PngError("unknown compression/filter method")
          if (inter != 0) throw new PngError("interlace unsupported")
          sawHdr = true
        case "IDAT" =>
          if (!sawHdr) throw new PngError("IDAT before IHDR")
          idat.write(bytes, dataOff, len)
        case "IEND" =>
          if (len != 0) throw new PngError("IEND must be empty")
          sawEnd = true
        case _ => // ancillary chunk: CRC already validated, content ignored
      }
      pos += 12 + len
    }
    if (!sawHdr) throw new PngError("missing IHDR")
    val filtered = Deflate.zlibDecompress(idat.toByteArray)
    val bpp = channels
    val stride = width * bpp
    if (filtered.length != height * (stride + 1))
      throw new PngError(s"filtered stream length ${filtered.length} != expected ${height * (stride + 1)}")
    val pixels = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val f = filtered(y * (stride + 1)) & 0xFF
      if (f > 4) throw new PngError(s"invalid filter type $f on row $y")
      val in = y * (stride + 1) + 1
      val outRow = y * stride
      var i = 0
      while (i < stride) {
        val x = filtered(in + i) & 0xFF
        val a = if (i >= bpp) pixels(outRow + i - bpp) & 0xFF else 0
        val b = if (y > 0) pixels(outRow - stride + i) & 0xFF else 0
        val c = if (y > 0 && i >= bpp) pixels(outRow - stride + i - bpp) & 0xFF else 0
        pixels(outRow + i) = (f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, c)
        }).toByte
        i += 1
      }
      y += 1
    }
    Image(width, height, channels, pixels)
  }

  /** Deterministic synthetic RGB image for the graded query (the
    * [[MediaFormats.pixelByte]] convention with distinct multipliers).
    */
  def buildImage(id: Long, w: Int, h: Int): Image = {
    val px = Array.tabulate(w * h * 3)(i => (((id * 37 + i.toLong * 11) % 256) + 256).toByte)
    Image(w, h, 3, px)
  }
}
