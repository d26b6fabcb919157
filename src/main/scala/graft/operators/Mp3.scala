package graft.operators

/** Dependency-free MPEG-1 Layer III (MP3) container walker — the
  * metadata-level closure of the last audio codec seam. Full Layer III
  * audio decode (huffman, IMDCT, synthesis filterbank) stays behind the
  * documented [[Multimodal.MediaCodec]] stub, but everything a pipeline
  * needs to CATALOG an MP3 at 100 TB — frame count, duration, bitrate
  * profile, samplerate, exact audio byte extent — comes from genuinely
  * parsing the bitstream: ID3v2 syncsafe-size tag skipping, 11-bit
  * frame-sync validation, version/layer bit checks, the MPEG-1 Layer III
  * bitrate/samplerate tables, and the per-frame length recurrence
  * `144·bitrate/samplerate + padding` that makes the walk land exactly on
  * the next sync word (a wrong table entry or a missed padding bit
  * desynchronizes immediately and fails loudly).
  *
  * The builder emits real, spec-valid streams (every frame header is a
  * legal MPEG-1 Layer III header; CBR is NOT assumed — the bitrate index
  * varies per frame exactly like a VBR encode) from the deterministic
  * id-derived formulas mirrored in the q189 DuckDB oracle, the same
  * decode-vs-formula contract as q73 (JPEG) and q75 (μ-law).
  *
  * Reference anchor: the reference treats media payloads as opaque
  * binaries with typed metadata; this walker supplies the metadata from
  * the bytes themselves.
  */
object Mp3 {

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free-format
    * and 15 = reserved are rejected.
    */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)

  /** MPEG-1 samplerate table (Hz), index 0..2; 3 = reserved is rejected. */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000, -1)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  final case class Mp3Info(
      tagBytes: Int,       // ID3v2 prefix length (0 when absent)
      nFrames: Int,
      sampleRate: Int,
      audioBytes: Long,    // sum of frame lengths (headers included)
      kbpsSum: Long,       // Σ per-frame bitrate — grades VBR extraction
      durationMs: Double)  // nFrames·1152·1000 / sampleRate

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- deterministic id-derived stream parameters (mirrored in the q189 oracle) ----

  def srIndex(id: Long): Int = (((id % 3) + 3) % 3).toInt
  def frameCount(id: Long): Int = (3 + ((id % 6) + 6) % 6).toInt
  def tagBodyLen(id: Long): Int = (10 + (((id % 64) + 64) % 64) * 3).toInt
  def bitrateIndex(id: Long, f: Int): Int = (1 + (((id + f) % 14) + 14) % 14).toInt
  def paddingBit(id: Long, f: Int): Int = ((((id + f) % 2) + 2) % 2).toInt

  /** Frame f's total length in bytes: floor(144·bitrate/samplerate) + padding. */
  def frameLen(id: Long, f: Int): Int = {
    val br = BitrateKbps(bitrateIndex(id, f)) * 1000L
    val sr = SampleRateHz(srIndex(id))
    (144L * br / sr + paddingBit(id, f)).toInt
  }

  /** Build a real MP3 stream for media id: ID3v2.3 tag (syncsafe size) +
    * [[frameCount]] VBR frames, mono, no CRC. Deterministic filler bytes
    * pad tag body and frame bodies.
    */
  def buildMp3(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // ID3v2.3 header: "ID3", version 3.0, flags 0, syncsafe body size
    val body = tagBodyLen(id)
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0)
    out.write((body >> 21) & 0x7F); out.write((body >> 14) & 0x7F)
    out.write((body >> 7) & 0x7F); out.write(body & 0x7F)
    var i = 0
    while (i < body) { out.write(MediaFormats.pixelByte(id, i)); i += 1 }
    val sri = srIndex(id)
    var f = 0
    while (f < frameCount(id)) {
      val bi = bitrateIndex(id, f)
      val len = frameLen(id, f)
      // sync 0xFFF | version MPEG-1 (11) | layer III (01) | no-CRC (1)
      out.write(0xFF); out.write(0xFB)
      out.write((bi << 4) | (sri << 2) | (paddingBit(id, f) << 1))
      out.write(0xC4) // mono, original, no emphasis
      var j = 4
      while (j < len) { out.write(MediaFormats.pixelByte(id + 17, f.toLong * 2048 + j)); j += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Walk a stream: skip any ID3v2 tag, then validate and measure every
    * frame until the bytes end. Malformed input (bad sync, reserved
    * bitrate/samplerate, non-MPEG-1/Layer-III bits, truncated frame,
    * inconsistent samplerate, non-syncsafe tag size) raises typed
    * IllegalArgumentException — never hangs or over-reads.
    */
  def parseMp3(bytes: Array[Byte]): Mp3Info = {
    def u(i: Int): Int = bytes(i) & 0xFF
    var pos = 0
    var tag = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if (u(3) > 4) fail(s"unsupported ID3v2 major version ${u(3)}")
      var size = 0
      var k = 6
      while (k < 10) {
        if ((u(k) & 0x80) != 0) fail("ID3v2 size byte is not syncsafe")
        size = (size << 7) | u(k); k += 1
      }
      val footer = if ((u(5) & 0x10) != 0) 10 else 0
      tag = 10 + size + footer
      if (tag > bytes.length) fail("ID3v2 tag extends past the stream")
      pos = tag
    }
    var nFrames = 0
    var sampleRate = -1
    var audio = 0L
    var kbps = 0L
    while (pos < bytes.length) {
      if (pos + 4 > bytes.length) fail(s"truncated frame header at $pos")
      if (u(pos) != 0xFF || (u(pos + 1) & 0xE0) != 0xE0) fail(s"lost frame sync at $pos")
      val h1 = u(pos + 1)
      if (((h1 >> 3) & 3) != 3) fail("not MPEG-1 (version bits)")
      if (((h1 >> 1) & 3) != 1) fail("not Layer III (layer bits)")
      val h2 = u(pos + 2)
      val bi = (h2 >> 4) & 0xF
      if (bi == 0 || bi == 15) fail(s"reserved/free bitrate index $bi")
      val sri = (h2 >> 2) & 3
      if (sri == 3) fail("reserved samplerate index")
      val sr = SampleRateHz(sri)
      if (sampleRate < 0) sampleRate = sr
      else if (sampleRate != sr) fail("samplerate changes mid-stream")
      val len = (144L * BitrateKbps(bi) * 1000L / sr).toInt + ((h2 >> 1) & 1)
      if (pos + len > bytes.length) fail(s"truncated frame body at $pos (need $len)")
      nFrames += 1
      audio += len
      kbps += BitrateKbps(bi)
      pos += len
    }
    if (nFrames == 0) fail("no MPEG frames in stream")
    Mp3Info(tag, nFrames, sampleRate, audio, kbps,
      (nFrames.toLong * SamplesPerFrame * 1000L).toDouble / sampleRate)
  }
}
