package graft.operators

/** Dependency-free H.264/AVC Annex-B bitstream walker — the metadata-level
  * closure of the video codec seam. Full slice decode (CABAC/CAVLC,
  * inter/intra prediction) stays behind the documented
  * [[Multimodal.MediaCodec]] stub, but the structural layer is genuinely
  * parsed per ITU-T H.264: start-code scanning (3- and 4-byte forms),
  * emulation-prevention-byte removal (00 00 03 xx → 00 00 xx), NAL header
  * validation (forbidden_zero_bit, nal_ref_idc, nal_unit_type), and a real
  * SPS (nal_unit_type 7) parse through an Exp-Golomb bit reader: ue(v)/
  * se(v) fields, pic_order_cnt_type branches, frame-cropping arithmetic
  * with 4:2:0 crop units. A wrong Exp-Golomb prefix count, a missed
  * emulation byte, or bad crop-unit math shifts every later field and
  * fails the closed-form oracle.
  *
  * The builder emits real Annex-B streams (SPS + PPS + IDR slices, all
  * fields Exp-Golomb coded, emulation prevention applied) from the
  * deterministic id-derived formulas mirrored in the q190 DuckDB oracle —
  * the decode-vs-formula contract of q73/q75/q189. IDR payloads start
  * with a forced 00 00 01 00 00 02 run so every stream exercises the
  * escape/unescape path.
  */
object H264 {

  final case class SpsInfo(
      profileIdc: Int,
      levelIdc: Int,
      width: Int,
      height: Int,
      log2MaxFrameNum: Int,
      maxNumRefFrames: Int)

  final case class H264Info(sps: SpsInfo, nNals: Int, nIdr: Int)

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- deterministic id-derived stream parameters (mirrored in the q190 oracle) ----

  private def m(x: Long, n: Int): Int = (((x % n) + n) % n).toInt

  def picWidthInMbsMinus1(id: Long): Int = 1 + m(id, 8)
  def picHeightInMapUnitsMinus1(id: Long): Int = 1 + m(id, 6)
  def croppingFlag(id: Long): Int = if (m(id, 5) == 0) 0 else 1
  def cropRight(id: Long): Int = m(id, 3)
  def cropBottom(id: Long): Int = m(id, 2)
  def levelIdc(id: Long): Int = 10 + m(id, 5) * 10
  def log2MaxFrameNumMinus4(id: Long): Int = m(id, 5)
  def maxNumRefFrames(id: Long): Int = 1 + m(id, 3)
  def idrCount(id: Long): Int = 1 + m(id, 4)

  /** Expected decoded width: 16·mbs − CropUnitX·(left+right), 4:2:0 ⇒ CropUnitX=2. */
  def expectedWidth(id: Long): Int =
    16 * (picWidthInMbsMinus1(id) + 1) -
      2 * (if (croppingFlag(id) == 1) cropRight(id) else 0)

  /** Expected decoded height (frame_mbs_only=1 ⇒ CropUnitY=2). */
  def expectedHeight(id: Long): Int =
    16 * (picHeightInMapUnitsMinus1(id) + 1) -
      2 * (if (croppingFlag(id) == 1) cropBottom(id) else 0)

  // ---- Exp-Golomb bit IO over RBSP bytes ----

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def u(value: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1); n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    /** Unsigned Exp-Golomb: leadingZeroBits = floor(log2(v+1)); write that
      * many 0s, a 1, then v+1−2^k in k bits.
      */
    def ue(v: Int): Unit = {
      require(v >= 0)
      val code = v + 1
      val k = 31 - Integer.numberOfLeadingZeros(code)
      u(0, k); u(code, k + 1)
    }
    /** Signed Exp-Golomb: v>0 → 2v−1, v≤0 → −2v. */
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit then zero-pad to a byte boundary. */
    def trailing(): Unit = { u(1, 1); if (n != 0) u(0, 8 - n) }
    def bytes: Array[Byte] = { require(n == 0, "unterminated RBSP"); out.toByteArray }
  }

  final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    def u(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        if (pos >= bytes.length) fail("RBSP over-read")
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 31) fail("Exp-Golomb prefix too long")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Insert emulation-prevention bytes: any 00 00 followed by a byte ≤ 03
    * inside the payload becomes 00 00 03 xx.
    */
  def rbspToNal(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xFF
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Strip emulation-prevention bytes (exact inverse of [[rbspToNal]] on
    * its image); a bare 00 00 00/01/02 inside a NAL payload is malformed
    * and rejected.
    */
  def nalToRbsp(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var zeros = 0
    var i = 0
    while (i < nal.length) {
      val b = nal(i) & 0xFF
      if (zeros >= 2) {
        if (b <= 2) fail(s"unescaped start-code byte $b inside NAL at $i")
        if (b == 3) {
          if (i + 1 < nal.length && (nal(i + 1) & 0xFF) > 3)
            fail("emulation byte not followed by 00-03")
          zeros = 0; i += 1 // drop the emulation byte
        }
      }
      if (i < nal.length) {
        val c = nal(i) & 0xFF
        out.write(c)
        zeros = if (c == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private def spsRbsp(id: Long): Array[Byte] = {
    val w = new BitWriter
    w.u(66, 8) // profile_idc: Baseline
    w.u(0, 8)  // constraint flags + reserved
    w.u(levelIdc(id), 8)
    w.ue(0) // seq_parameter_set_id
    w.ue(log2MaxFrameNumMinus4(id))
    w.ue(2) // pic_order_cnt_type = 2 (no extra fields)
    w.ue(maxNumRefFrames(id))
    w.u(0, 1) // gaps_in_frame_num_value_allowed_flag
    w.ue(picWidthInMbsMinus1(id))
    w.ue(picHeightInMapUnitsMinus1(id))
    w.u(1, 1) // frame_mbs_only_flag
    w.u(1, 1) // direct_8x8_inference_flag
    w.u(croppingFlag(id), 1)
    if (croppingFlag(id) == 1) {
      w.ue(0)              // crop left
      w.ue(cropRight(id))
      w.ue(0)              // crop top
      w.ue(cropBottom(id))
    }
    w.u(0, 1) // vui_parameters_present_flag
    w.trailing()
    w.bytes
  }

  private def ppsRbsp(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0)       // pps id, sps id
    w.u(0, 1); w.u(0, 1)   // entropy mode (CAVLC), pic_order_present
    w.ue(0)                // num_slice_groups_minus1
    w.ue(0); w.ue(0)       // num_ref_idx_l{0,1}_default_active_minus1
    w.u(0, 1); w.u(0, 2)   // weighted_pred, weighted_bipred_idc
    w.se(0); w.se(0); w.se(0) // init_qp, init_qs, chroma_qp_offset
    w.u(1, 1); w.u(0, 1); w.u(0, 1) // deblocking_control, constrained_intra, redundant_pic_cnt
    w.trailing()
    w.bytes
  }

  /** Build a real Annex-B stream for media id: 4-byte-start-code SPS,
    * 3-byte-start-code PPS, then [[idrCount]] IDR NALs whose payloads open
    * with a forced 00 00 01 00 00 02 run (so emulation prevention is
    * always exercised) followed by deterministic filler.
    */
  def buildH264(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def startCode(four: Boolean): Unit = {
      if (four) out.write(0)
      out.write(0); out.write(0); out.write(1)
    }
    def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte], four: Boolean): Unit = {
      startCode(four)
      out.write((refIdc << 5) | nalType)
      val esc = rbspToNal(rbsp)
      out.write(esc, 0, esc.length)
    }
    nal(3, 7, spsRbsp(id), four = true)
    nal(3, 8, ppsRbsp(), four = false)
    var k = 0
    while (k < idrCount(id)) {
      val body = new java.io.ByteArrayOutputStream()
      body.write(0); body.write(0); body.write(1)
      body.write(0); body.write(0); body.write(2)
      var j = 0
      val n = 24 + m(id, 16)
      while (j < n) { body.write(MediaFormats.pixelByte(id + 29, k.toLong * 512 + j)); j += 1 }
      nal(3, 5, body.toByteArray, four = false)
      k += 1
    }
    out.toByteArray
  }

  /** Parse an SPS RBSP (post emulation removal, header byte stripped). */
  def parseSps(rbsp: Array[Byte]): SpsInfo = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags
    val level = r.u(8)
    r.ue() // sps id
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile))
      fail(s"high-profile SPS (profile_idc=$profile) not supported")
    val log2Mfn = r.ue() + 4
    val pocType = r.ue()
    if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (pocType == 1) fail("pic_order_cnt_type 1 not supported")
    else if (pocType > 2) fail(s"invalid pic_order_cnt_type $pocType")
    val maxRef = r.ue()
    r.u(1) // gaps flag
    val wMbs = r.ue() + 1
    val hUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
    r.u(1) // direct_8x8_inference_flag
    val crop = r.u(1)
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (crop == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    // 4:2:0 (baseline/main implied chroma_format_idc=1): CropUnitX=2,
    // CropUnitY=2·(2−frame_mbs_only_flag)
    val cuy = 2 * (2 - frameMbsOnly)
    SpsInfo(profile, level,
      wMbs * 16 - 2 * (cl + cr),
      hUnits * 16 * (2 - frameMbsOnly) - cuy * (ct + cb),
      log2Mfn, maxRef)
  }

  /** Walk an Annex-B stream: split on start codes, validate NAL headers,
    * parse the first SPS, count NALs and IDR slices. Malformed input
    * (no start code, forbidden bit set, truncated/absent SPS, bad
    * emulation sequence) raises typed IllegalArgumentException.
    */
  def parseH264(bytes: Array[Byte]): H264Info = {
    // find start-code offsets (payload start, after 00 00 01)
    var starts = List.empty[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts ::= (i + 3)
        i += 3
      } else i += 1
    }
    val offs = starts.reverse.toArray
    if (offs.isEmpty) fail("no Annex-B start code")
    if (offs(0) != 3 && !(offs(0) == 4 && bytes(0) == 0))
      fail("stream does not begin with a start code")
    var sps: Option[SpsInfo] = None
    var nIdr = 0
    var n = 0
    while (n < offs.length) {
      val from = offs(n)
      // NAL extends to the next start code (back over its 00 00 (00) prefix)
      val to = if (n + 1 < offs.length) {
        val next = offs(n + 1) - 3
        if (next > 0 && bytes(next - 1) == 0) next - 1 else next
      } else bytes.length
      if (to <= from) fail("empty NAL unit")
      val hdr = bytes(from) & 0xFF
      if ((hdr & 0x80) != 0) fail("forbidden_zero_bit set")
      val nalType = hdr & 0x1F
      val payload = java.util.Arrays.copyOfRange(bytes, from + 1, to)
      if (nalType == 7 && sps.isEmpty) sps = Some(parseSps(nalToRbsp(payload)))
      if (nalType == 5) { nalToRbsp(payload); nIdr += 1 } // validate escaping
      n += 1
    }
    H264Info(sps.getOrElse(fail("stream has no SPS")), offs.length, nIdr)
  }
}
