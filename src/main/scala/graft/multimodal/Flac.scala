package graft.multimodal

/** FLAC sample decoder — the JVM reference twin of the native seam
  * codec (`graft_native.c` decodeFlacPcm16), written to the public
  * xiph.org FLAC format spec the way [[Qoi]] is written to
  * qoiformat.org. Complete bitstream support: CONSTANT / VERBATIM /
  * FIXED(0–4) / LPC(1–32) subframes, both rice residual methods with
  * escape partitions, wasted bits, UTF-8 frame/sample numbers, and all
  * four channel assignments (independent, left/side, right/side,
  * mid/side). The seam contract is 16-bit PCM (the WAV arm's scope):
  * STREAMINFO must declare 16 bits per sample, every frame must agree,
  * and the decoded per-channel sample count must match STREAMINFO's
  * declared total when it is non-zero ("STREAMINFO-verified").
  * Frame-header CRC-8 (poly 0x07) is verified; the trailing frame
  * CRC-16 is parsed past but not checked — the contract guards
  * structure, STREAMINFO agreement, and bit-identity to the native
  * twin (NativeSeamSpec), not transport integrity. Malformed streams
  * throw IllegalArgumentException — the Qoi/WAV loudness discipline,
  * mirrored across the ABI.
  *
  * Returns interleaved samples (ch0, ch1, ..., ch0, ...) exactly as
  * the WAV walk returns its data chunk, so [[Multimodal.RealDecoder]]
  * applies the identical s/32768 feature fold.
  */
object Flac {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Big-endian bit reader; every read bounds-checks (truncation is a
    * loud failure, never a wild read — the WAV chunk-walk discipline).
    */
  private final class Bits(b: Array[Byte], var pos: Int) {
    var bit: Int = 0
    def readBit(): Int = {
      if (pos >= b.length) fail("truncated FLAC stream")
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long =
      if (n == 0) 0L else { val u = read(n); (u << (64 - n)) >> (64 - n) }
    def readUnary(): Long = {
      var q = 0L
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  /** CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the FLAC
    * frame-header checksum.
    */
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private val FixedOrders = 4

  /** Decode a full FLAC payload to interleaved 16-bit samples. */
  def decode(bytes: Array[Byte]): Array[Short] = {
    val meta = Containers.flacMeta(bytes) // magic + STREAMINFO validation
    if (meta.bitsPerSample != 16)
      fail(s"contract covers 16-bit FLAC, got ${meta.bitsPerSample}")
    if (meta.channels > 8) fail("FLAC channels exceed 8")
    // walk the metadata blocks to the first audio frame
    var p = 4
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) fail("truncated FLAC metadata block header")
      last = (bytes(p) & 0x80) != 0
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      p += 4 + len
      if (p > bytes.length) fail("truncated FLAC metadata block")
    }
    if (meta.totalSamples > 0 &&
        meta.totalSamples * meta.channels > Int.MaxValue / 2)
      fail("FLAC declares more samples than a single payload can hold")
    val expected =
      if (meta.totalSamples > 0) (meta.totalSamples * meta.channels).toInt
      else -1
    var out = new Array[Short](if (expected >= 0) expected else 65536)
    var nOut = 0
    def push(v: Long): Unit = {
      if (v < Short.MinValue || v > Short.MaxValue)
        fail("decoded sample exceeds the 16-bit range")
      if (nOut == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
      out(nOut) = v.toShort
      nOut += 1
    }

    while (p < bytes.length) {
      p = decodeFrame(bytes, p, meta, push)
    }
    if (expected >= 0 && nOut != expected)
      fail(s"decoded $nOut samples, STREAMINFO declares $expected")
    if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut)
  }

  /** One frame: header (CRC-8 checked), one subframe per channel,
    * byte-align, 2 CRC-16 bytes. Returns the next frame's offset.
    */
  private def decodeFrame(b: Array[Byte], frameStart: Int,
      meta: Containers.FlacMeta, push: Long => Unit): Int = {
    var p = frameStart
    if (p + 4 > b.length) fail("truncated FLAC frame header")
    if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xfc) != 0xf8)
      fail("bad FLAC frame sync")
    val b2 = b(p + 2) & 0xff
    val b3 = b(p + 3) & 0xff
    val bsCode = b2 >>> 4
    val rateCode = b2 & 0x0f
    val chanAsgn = b3 >>> 4
    val sizeCode = (b3 >>> 1) & 0x07
    if ((b3 & 1) != 0) fail("reserved FLAC frame-header bit set")
    p += 4
    // UTF-8 coded frame/sample number: lead byte sets the length
    val lead = if (p < b.length) b(p) & 0xff else fail("truncated FLAC frame number")
    val extra =
      if ((lead & 0x80) == 0) 0
      else if ((lead & 0xe0) == 0xc0) 1
      else if ((lead & 0xf0) == 0xe0) 2
      else if ((lead & 0xf8) == 0xf0) 3
      else if ((lead & 0xfc) == 0xf8) 4
      else if ((lead & 0xfe) == 0xfc) 5
      else if (lead == 0xfe) 6
      else fail("bad FLAC frame-number coding")
    if (p + 1 + extra > b.length) fail("truncated FLAC frame number")
    var i = 0
    while (i < extra) {
      if ((b(p + 1 + i) & 0xc0) != 0x80) fail("bad FLAC frame-number coding")
      i += 1
    }
    p += 1 + extra
    val blockSize = bsCode match {
      case 0 => fail("reserved FLAC block-size code")
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 =>
        if (p >= b.length) fail("truncated FLAC block size")
        val v = (b(p) & 0xff) + 1; p += 1; v
      case 7 =>
        if (p + 2 > b.length) fail("truncated FLAC block size")
        val v = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1; p += 2; v
      case c => 256 << (c - 8)
    }
    rateCode match {
      case 15 => fail("invalid FLAC sample-rate code")
      case 12 => if (p + 1 > b.length) fail("truncated FLAC sample rate")
        p += 1
      case 13 | 14 => if (p + 2 > b.length) fail("truncated FLAC sample rate")
        p += 2
      case _ => () // table or STREAMINFO rates carry no trailing bytes
    }
    if (p >= b.length) fail("truncated FLAC frame header (no CRC-8)")
    if (crc8(b, frameStart, p) != (b(p) & 0xff))
      fail("FLAC frame-header CRC-8 mismatch")
    p += 1
    val nch = chanAsgn match {
      case a if a <= 7 => a + 1
      case 8 | 9 | 10 => 2
      case _ => fail("reserved FLAC channel assignment")
    }
    if (nch != meta.channels)
      fail(s"frame channel count $nch differs from STREAMINFO ${meta.channels}")
    val frameBps = sizeCode match {
      case 0 => meta.bitsPerSample
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => fail("reserved FLAC sample-size code")
    }
    if (frameBps != 16) fail(s"contract covers 16-bit FLAC, got $frameBps")

    val bits = new Bits(b, p)
    val chans = Array.ofDim[Long](nch, blockSize)
    var ch = 0
    while (ch < nch) {
      // the side channel of a decorrelated pair carries one extra bit
      val side = (chanAsgn == 8 && ch == 1) || (chanAsgn == 9 && ch == 0) ||
        (chanAsgn == 10 && ch == 1)
      decodeSubframe(bits, blockSize, frameBps + (if (side) 1 else 0),
        chans(ch))
      ch += 1
    }
    bits.align()
    if (bits.pos + 2 > b.length) fail("truncated FLAC frame CRC-16")

    var s = 0
    while (s < blockSize) {
      chanAsgn match {
        case 8 => // left/side: R = L - S
          push(chans(0)(s)); push(chans(0)(s) - chans(1)(s))
        case 9 => // right/side (side first): L = R + S
          push(chans(1)(s) + chans(0)(s)); push(chans(1)(s))
        case 10 => // mid/side
          val mid = (chans(0)(s) << 1) | (chans(1)(s) & 1)
          push((mid + chans(1)(s)) >> 1); push((mid - chans(1)(s)) >> 1)
        case _ =>
          var c = 0
          while (c < nch) { push(chans(c)(s)); c += 1 }
      }
      s += 1
    }
    bits.pos + 2
  }

  private def decodeSubframe(bits: Bits, n: Int, bps: Int,
      out: Array[Long]): Unit = {
    if (bits.readBit() != 0) fail("FLAC subframe padding bit set")
    val tpe = bits.read(6).toInt
    var wasted = 0
    if (bits.readBit() == 1) wasted = bits.readUnary().toInt + 1
    val eff = bps - wasted
    if (eff <= 0) fail("FLAC wasted bits exceed the sample size")
    if (tpe == 0) { // CONSTANT
      val v = bits.readSigned(eff)
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = bits.readSigned(eff); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= FixedOrders) {
      val order = tpe & 0x07
      var i = 0
      while (i < order) { out(i) = bits.readSigned(eff); i += 1 }
      residual(bits, n, order, out)
      i = order
      while (i < n) {
        val p = order match {
          case 0 => 0L
          case 1 => out(i - 1)
          case 2 => 2 * out(i - 1) - out(i - 2)
          case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
            out(i - 4)
        }
        out(i) += p
        i += 1
      }
    } else if ((tpe & 0x20) != 0) { // LPC, order 1..32
      val order = (tpe & 0x1f) + 1
      if (order > n) fail("FLAC predictor order exceeds the block size")
      var i = 0
      while (i < order) { out(i) = bits.readSigned(eff); i += 1 }
      val precision = bits.read(4).toInt + 1
      if (precision == 16) fail("invalid FLAC LPC precision code")
      val shift = bits.readSigned(5).toInt
      if (shift < 0) fail("negative FLAC LPC shift")
      val coef = new Array[Long](order)
      i = 0
      while (i < order) { coef(i) = bits.readSigned(precision); i += 1 }
      residual(bits, n, order, out)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else fail("reserved FLAC subframe type")
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** Fixture encoder — the forward-writing twin (the
    * [[Containers.buildWebPFixture]] / [[Mp4.buildFixture]]
    * convention): emits a spec-conformant 16-bit stream from raw
    * samples so specs and gates can prove decode without any codec
    * library. The subframe strategy is EXPLICIT so each bitstream path
    * is exercisable on demand: `constant` (all-equal blocks),
    * `verbatim`, `fixed0`..`fixed4` (rice residuals, method 0),
    * `lpc1` (order-1, coefficient 1, shift 0 — the exercisable LPC
    * path with a hand-checkable prediction); `stereo` picks the
    * channel assignment for 2-channel input: `indep` | `leftside` |
    * `rightside` | `midside`.
    */
  def buildFixture(chans: Array[Array[Int]], blockSize: Int,
      mode: String, stereo: String = "indep",
      sampleRate: Int = 8000): Array[Byte] = {
    val nch = chans.length
    require(nch >= 1 && nch <= 8, "1..8 channels")
    val total = chans(0).length
    require(chans.forall(_.length == total), "equal-length channels")
    require(total > 0 && blockSize >= 8, "non-empty, blockSize >= 8")
    val o = new java.io.ByteArrayOutputStream()
    o.write('f'); o.write('L'); o.write('a'); o.write('C')
    // STREAMINFO (last metadata block)
    o.write(0x80); o.write(0); o.write(0); o.write(34)
    val lastBs = if (total % blockSize == 0) blockSize else total % blockSize
    def be16(v: Int): Unit = { o.write((v >>> 8) & 0xff); o.write(v & 0xff) }
    be16(math.min(lastBs, blockSize)); be16(blockSize)
    (0 until 6).foreach(_ => o.write(0)) // min/max frame size unknown
    // rate(20) | channels-1(3) | bps-1(5) | total(36), big-endian packed
    val packed = (sampleRate.toLong << 44) | ((nch - 1).toLong << 41) |
      (15L << 36) | total.toLong
    (0 until 8).foreach(i => o.write(((packed >>> (56 - 8 * i)) & 0xff).toInt))
    (0 until 16).foreach(_ => o.write(0)) // md5 unset

    val chanAsgn = stereo match {
      case "indep" => nch - 1
      case "leftside" => require(nch == 2, "stereo modes need 2 channels"); 8
      case "rightside" => require(nch == 2, "stereo modes need 2 channels"); 9
      case "midside" => require(nch == 2, "stereo modes need 2 channels"); 10
      case m => throw new IllegalArgumentException(s"unknown stereo mode $m")
    }
    var frameNo = 0
    var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      // header bytes (byte-aligned through the CRC-8)
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(0xff); hdr.write(0xf8) // sync, fixed blocking
      hdr.write((7 << 4) | 0)          // 16-bit blocksize at end; STREAMINFO rate
      hdr.write((chanAsgn << 4) | (4 << 1)) // 16-bit samples
      require(frameNo < 128, "fixture keeps frame numbers single-byte")
      hdr.write(frameNo)
      hdr.write(((bs - 1) >>> 8) & 0xff); hdr.write((bs - 1) & 0xff)
      val hb = hdr.toByteArray
      o.write(hb, 0, hb.length)
      o.write(crc8(hb, 0, hb.length))

      val w = new BitW
      var ch = 0
      while (ch < nch) {
        val side = (chanAsgn == 8 && ch == 1) || (chanAsgn == 9 && ch == 0) ||
          (chanAsgn == 10 && ch == 1)
        val data = new Array[Long](bs)
        var i = 0
        while (i < bs) {
          val l = chans(0)(off + i).toLong
          val r = if (nch > 1) chans(math.min(1, nch - 1))(off + i).toLong else 0L
          data(i) = chanAsgn match {
            case 8 => if (ch == 0) l else l - r
            case 9 => if (ch == 0) l - r else r
            case 10 => if (ch == 0) (l + r) >> 1 else l - r
            case _ => chans(ch)(off + i).toLong
          }
          i += 1
        }
        encodeSubframe(w, data, 16 + (if (side) 1 else 0), mode)
        ch += 1
      }
      w.align()
      val body = w.bytes
      o.write(body, 0, body.length)
      o.write(0); o.write(0) // frame CRC-16 unchecked by the contract
      frameNo += 1
      off += bs
    }
    o.toByteArray
  }

  private final class BitW {
    private val o = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) { o.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = o.toByteArray
  }

  private def encodeSubframe(w: BitW, data: Array[Long], bps: Int,
      mode: String): Unit = {
    def warmupAndResidual(order: Int): Unit = {
      var i = 0
      while (i < order) { w.bits(data(i) & ((1L << bps) - 1), bps); i += 1 }
      val res = new Array[Long](data.length - order)
      i = order
      while (i < data.length) {
        val p = order match {
          case 0 => 0L
          case 1 => data(i - 1)
          case 2 => 2 * data(i - 1) - data(i - 2)
          case 3 => 3 * data(i - 1) - 3 * data(i - 2) + data(i - 3)
          case _ => 4 * data(i - 1) - 6 * data(i - 2) + 4 * data(i - 3) -
            data(i - 4)
        }
        res(i - order) = data(i) - p
        i += 1
      }
      // method 0, one partition, adaptive rice parameter
      w.bits(0, 2); w.bits(0, 4)
      val maxU = res.foldLeft(0L)((m, e) =>
        math.max(m, if (e >= 0) 2 * e else -2 * e - 1))
      var k = 0
      while (k < 14 && (maxU >> k) > 30) k += 1
      w.bits(k.toLong, 4)
      res.foreach { e =>
        val u = if (e >= 0) 2 * e else -2 * e - 1
        var q = u >>> k
        while (q > 0) { w.bit(0); q -= 1 }
        w.bit(1)
        w.bits(u & ((1L << k) - 1), k)
      }
    }
    w.bit(0) // padding
    mode match {
      case "constant" =>
        require(data.forall(_ == data(0)), "constant mode needs equal samples")
        w.bits(0, 6); w.bit(0)
        w.bits(data(0) & ((1L << bps) - 1), bps)
      case "verbatim" =>
        w.bits(1, 6); w.bit(0)
        data.foreach(v => w.bits(v & ((1L << bps) - 1), bps))
      case m if m.startsWith("fixed") =>
        val order = m.drop(5).toInt
        require(order >= 0 && order <= 4 && order < data.length, "fixed order")
        w.bits(0x08L | order, 6); w.bit(0)
        warmupAndResidual(order)
      case "lpc1" =>
        w.bits(0x20L, 6); w.bit(0) // LPC order 1
        w.bits(data(0) & ((1L << bps) - 1), bps) // warmup
        w.bits(3, 4)          // precision 4
        w.bits(0, 5)          // shift 0
        w.bits(1L & 0xf, 4)   // coefficient [1] → prediction = s[i-1]
        val res = (1 until data.length).map(i => data(i) - data(i - 1))
        w.bits(0, 2); w.bits(0, 4)
        val maxU = res.foldLeft(0L)((m, e) =>
          math.max(m, if (e >= 0) 2 * e else -2 * e - 1))
        var k = 0
        while (k < 14 && (maxU >> k) > 30) k += 1
        w.bits(k.toLong, 4)
        res.foreach { e =>
          val u = if (e >= 0) 2 * e else -2 * e - 1
          var q = u >>> k
          while (q > 0) { w.bit(0); q -= 1 }
          w.bit(1)
          w.bits(u & ((1L << k) - 1), k)
        }
      case m => throw new IllegalArgumentException(s"unknown mode $m")
    }
  }

  /** Rice-coded residual, methods 0 (4-bit params) and 1 (5-bit), with
    * the escape-to-raw partitions. Fills out(order until n).
    */
  private def residual(bits: Bits, n: Int, order: Int,
      out: Array[Long]): Unit = {
    val method = bits.read(2).toInt
    if (method > 1) fail("reserved FLAC residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = bits.read(4).toInt
    val parts = 1 << partOrder
    if ((n & (parts - 1)) != 0)
      fail("FLAC partition order does not divide the block size")
    // the first partition holds perPart - order samples (the warmups
    // came before the residual); it may be empty, never negative
    val perPart = n >> partOrder
    if (perPart < order) fail("FLAC predictor order exceeds the partition")
    var i = order
    var part = 0
    while (part < parts) {
      val count = (if (part == 0) perPart - order else perPart)
      val param = bits.read(pBits).toInt
      var k = 0
      if (param == escape) {
        val raw = bits.read(5).toInt
        while (k < count) { out(i) = bits.readSigned(raw); i += 1; k += 1 }
      } else {
        while (k < count) {
          val q = bits.readUnary()
          val u = (q << param) | bits.read(param)
          out(i) = (u >>> 1) ^ -(u & 1L)
          i += 1; k += 1
        }
      }
      part += 1
    }
  }
}
