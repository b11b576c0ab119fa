package graft.multimodal

/** WebP LOSSLESS (VP8L) pixel decoder — the JVM reference twin of the
  * native seam codec (`graft_native.c` decodeWebpArgb), written to the
  * public WebP Lossless Bitstream Specification the way [[Flac]] is
  * written to the xiph.org FLAC spec and [[Qoi]] to qoiformat.org.
  * Complete bitstream support: LSB-first bit reading, simple and
  * normal (code-length-coded) prefix codes with 2-bit repeat-previous
  * and 3/7-bit zero-run operators and the optional max-symbol cap,
  * degenerate single-symbol trees (zero-bit reads), color cache,
  * LZ77 backward references through both the 120-entry close-neighbor
  * distance map and the direct distance form, meta prefix-code groups
  * (the entropy image), and all four transforms — predictor (modes
  * 0–13 with the spec's border rules and the top-right wraparound),
  * cross-channel color transform (3.5 signed fixed-point deltas,
  * blue corrected against the reconstructed red), subtract-green, and
  * color indexing with sub-byte pixel bundling. Inverse transforms
  * apply in reverse bitstream order, exactly as the spec requires.
  *
  * Malformed streams throw IllegalArgumentException — the Qoi/WAV/FLAC
  * loudness discipline, mirrored across the ABI (over-subscribed code
  * lengths, empty alphabets, back-references before the image start,
  * out-of-range cache and palette indices, truncation anywhere).
  * Returns (width, height, pixels) with pixels as 0xAARRGGBB ints in
  * top-down row-major order — the [[Qoi.decode]] convention plus
  * alpha, so [[Multimodal.RealDecoder]] applies the identical
  * per-pixel luminance fold and the contract spec can demand
  * bit-identical pixels from the native twin.
  */
object Webp {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** LSB-first bit reader (VP8L convention — the opposite of FLAC's
    * MSB-first); every read bounds-checks so truncation is loud.
    */
  private final class Bits(b: Array[Byte], var pos: Int, val end: Int) {
    var bit: Int = 0
    def readBit(): Int = {
      if (pos >= end) fail("truncated VP8L stream")
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private val MaxLen = 15

  /** Canonical prefix code over `lengths` (DEFLATE-style assignment:
    * shorter codes first, ties by symbol order; the first bit read is
    * the code's most significant bit). A single non-zero length makes
    * the degenerate tree that decodes to its symbol reading ZERO bits
    * (the spec's simple-code num_symbols=1 case and its normal-code
    * equivalent). Over-subscribed lengths and empty alphabets fail
    * loudly; incomplete trees are legal and fail only if a stream
    * walks into a hole.
    */
  private final class Huff(lengths: Array[Int]) {
    private var single = -1
    private val count = new Array[Int](MaxLen + 1)
    private val first = new Array[Int](MaxLen + 2)
    private val offs = new Array[Int](MaxLen + 2)
    private var syms: Array[Int] = null
    locally {
      var nz = 0
      var lastSym = -1
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > MaxLen) fail(s"prefix code length $l out of range")
        if (l > 0) { nz += 1; lastSym = i; count(l) += 1 }
        i += 1
      }
      if (nz == 0) fail("empty prefix code (no symbol has a length)")
      if (nz == 1) single = lastSym
      else {
        var kraft = 0L
        var l = 1
        while (l <= MaxLen) { kraft += count(l).toLong << (MaxLen - l); l += 1 }
        if (kraft > (1L << MaxLen)) fail("over-subscribed prefix code lengths")
        var code = 0
        l = 1
        var run = 0
        while (l <= MaxLen) {
          first(l) = code
          offs(l) = run
          code = (code + count(l)) << 1
          run += count(l)
          l += 1
        }
        syms = new Array[Int](run)
        val cursor = offs.clone()
        i = 0
        while (i < lengths.length) {
          val ln = lengths(i)
          if (ln > 0) { syms(cursor(ln)) = i; cursor(ln) += 1 }
          i += 1
        }
      }
    }
    def read(bits: Bits): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < MaxLen) {
        code = (code << 1) | bits.readBit()
        len += 1
        if (count(len) > 0 && code >= first(len) &&
            code - first(len) < count(len))
          return syms(offs(len) + code - first(len))
      }
      fail("invalid prefix-coded stream (no symbol within 15 bits)")
    }
  }

  // the spec's code-length-code symbol order
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The 120-entry close-neighborhood distance map — (dx, dy) pairs in
    * the spec's order; distance = dy * width + dx, clamped to at least
    * 1. The table follows the spec's generative rule: all offsets with
    * dy in 0..7 (dx in 1..8 when dy = 0, -7..8 otherwise), sorted by
    * dx² + dy² ascending, ties broken by the larger dy first and
    * positive dx before negative.
    */
  private val DistMap: Array[Int] = {
    val pairs = Array(
      0, 1, 1, 0, 1, 1, -1, 1, 0, 2, 2, 0,
      1, 2, -1, 2, 2, 1, -2, 1, 2, 2, -2, 2,
      0, 3, 3, 0, 1, 3, -1, 3, 3, 1, -3, 1,
      2, 3, -2, 3, 3, 2, -3, 2, 0, 4, 4, 0,
      1, 4, -1, 4, 4, 1, -4, 1, 3, 3, -3, 3,
      2, 4, -2, 4, 4, 2, -4, 2, 0, 5, 3, 4,
      -3, 4, 4, 3, -4, 3, 5, 0, 1, 5, -1, 5,
      5, 1, -5, 1, 2, 5, -2, 5, 5, 2, -5, 2,
      4, 4, -4, 4, 3, 5, -3, 5, 5, 3, -5, 3,
      0, 6, 6, 0, 1, 6, -1, 6, 6, 1, -6, 1,
      2, 6, -2, 6, 6, 2, -6, 2, 4, 5, -4, 5,
      5, 4, -5, 4, 3, 6, -3, 6, 6, 3, -6, 3,
      0, 7, 7, 0, 1, 7, -1, 7, 5, 5, -5, 5,
      7, 1, -7, 1, 4, 6, -4, 6, 6, 4, -6, 4,
      2, 7, -2, 7, 7, 2, -7, 2, 3, 7, -3, 7,
      7, 3, -7, 3, 5, 6, -5, 6, 6, 5, -6, 5,
      8, 0, 4, 7, -4, 7, 7, 4, -7, 4, 8, 1,
      8, 2, 6, 6, -6, 6, 8, 3, 5, 7, -5, 7,
      7, 5, -7, 5, 8, 4, 6, 7, -6, 7, 7, 6,
      -7, 6, 8, 5, 7, 7, -7, 7, 8, 6, 8, 7)
    require(pairs.length == 240)
    pairs
  }

  private def divUp(a: Int, b: Int): Int = (a + b - 1) / b

  /** A transform read from the stream. `srcW` is the image width
    * BEFORE this transform narrowed it (only color indexing does).
    */
  private final case class Transform(
      tpe: Int, bits: Int, data: Array[Int], srcW: Int)

  /** Decode a full WebP payload (RIFF container + VP8L chunk) to
    * (width, height, ARGB pixels top-down row-major).
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    // container walk to the VP8L chunk (webpMeta validates the RIFF
    // grammar; here we need the chunk offset too)
    Containers.webpMeta(bytes) match {
      case m if m.variant != "lossless" =>
        fail(s"contract covers VP8L lossless WebP, got ${m.variant}" +
          (if (m.animation) " — animated payloads decode via Webp.decodeFrames"
           else ""))
      case _ => ()
    }
    var i = 12
    var s = -1
    var e = -1
    while (s < 0 && i + 8 <= bytes.length) {
      val tpe = new String(bytes, i, 4,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val size = ((bytes(i + 4) & 0xff) | ((bytes(i + 5) & 0xff) << 8) |
        ((bytes(i + 6) & 0xff) << 16) | ((bytes(i + 7) & 0xff) << 24))
      if (tpe == "VP8L") { s = i + 8; e = s + size }
      else i += 8 + size + (size & 1)
    }
    if (s < 0 || e > bytes.length) fail("VP8L chunk missing or truncated")
    decodeVp8l(bytes, s, e)
  }

  /** The VP8L bitstream core over a [s, e) slice — shared by the
    * single-image path and the animated-frame walk.
    */
  private def decodeVp8l(bytes: Array[Byte], s: Int,
      e: Int): (Int, Int, Array[Int]) = {
    if (s >= e || (bytes(s) & 0xff) != 0x2f) fail("VP8L signature missing")
    val bits = new Bits(bytes, s + 1, e)
    val w = bits.read(14) + 1
    val h = bits.read(14) + 1
    bits.readBit() // alpha-is-used hint — informational
    if (bits.read(3) != 0) fail("unsupported VP8L version")
    val px = decodeImage(bits, w, h, level0 = true)
    (w, h, px)
  }

  /** One animated-WebP frame: canvas placement (x, y), dimensions,
    * duration, and the decoded VP8L pixels.
    */
  final case class AnimFrame(x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, px: Array[Int])

  /** Decode an ANIMATED lossless WebP: the VP8X+ANIM+ANMF container
    * walk (pure JVM, the [[Mp4]]/[[Containers]] convention for
    * container structure) with each ANMF frame's VP8L bitstream
    * decoded through the same core as [[decode]]. Returns the canvas
    * dimensions and the frames in file order. Lossless frames only —
    * a VP8 (lossy) or ALPH frame payload is loud; so is an ANMF frame
    * overrunning the canvas, a missing ANIM chunk, or a VP8X without
    * the animation flag.
    */
  def decodeFrames(bytes: Array[Byte]): (Int, Int, List[AnimFrame]) = {
    val m = Containers.webpMeta(bytes)
    if (m.variant != "extended" || !m.animation)
      fail("not an animated WebP (VP8X with the animation flag required)")
    def u24(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16)
    def u32(i: Int): Long = (u24(i) & 0xffffffL) | ((bytes(i + 3) & 0xffL) << 24)
    var i = 12
    var sawAnim = false
    val frames = scala.collection.mutable.ListBuffer.empty[AnimFrame]
    while (i + 8 <= bytes.length) {
      val tpe = new String(bytes, i, 4,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val size = u32(i + 4)
      val start = i + 8
      if (start + size > bytes.length)
        fail(s"chunk '$tpe' overruns the WebP payload")
      tpe match {
        case "ANIM" =>
          if (size < 6) fail("truncated ANIM chunk")
          sawAnim = true
        case "ANMF" =>
          if (!sawAnim) fail("ANMF frame before the ANIM parameters")
          if (size < 16) fail("truncated ANMF header")
          val fx = u24(start) * 2
          val fy = u24(start + 3) * 2
          val fw = u24(start + 6) + 1
          val fh = u24(start + 9) + 1
          val dur = u24(start + 12)
          // flags byte at start+15: blending/disposal — placement
          // metadata, no effect on per-frame pixel decode
          if (fx + fw > m.width || fy + fh > m.height)
            fail(s"ANMF frame [$fx,$fy ${fw}x$fh] overruns the " +
              s"${m.width}x${m.height} canvas")
          // frame data: subchunks; the lossless contract wants VP8L
          var p = start + 16
          var decoded: Option[(Int, Int, Array[Int])] = None
          while (decoded.isEmpty && p + 8 <= start + size) {
            val st = new String(bytes, p, 4,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val ss = u32(p + 4)
            if (p + 8 + ss > start + size)
              fail(s"frame subchunk '$st' overruns its ANMF")
            st match {
              case "VP8L" => decoded = Some(decodeVp8l(bytes, p + 8,
                (p + 8 + ss).toInt))
              case "VP8 " | "ALPH" =>
                fail("contract covers LOSSLESS animated WebP; frame " +
                  s"carries '$st'")
              case _ => p += 8 + ss.toInt + (ss.toInt & 1)
            }
          }
          val (dw, dh, px) = decoded.getOrElse(
            fail("ANMF frame without a VP8L bitstream"))
          if (dw != fw || dh != fh)
            fail(s"frame bitstream is ${dw}x$dh but ANMF declares ${fw}x$fh")
          frames += AnimFrame(fx, fy, fw, fh, dur, px)
        case _ => () // VP8X/ICCP/EXIF/XMP: skip
      }
      i = start + size.toInt + (size.toInt & 1)
    }
    if (frames.isEmpty) fail("animated WebP carries no ANMF frames")
    (m.width, m.height, frames.toList)
  }

  /** Quarantine twin ([[Mp4.tryMeta]] convention). */
  def tryDecodeFrames(
      bytes: Array[Byte]): Either[String, (Int, Int, List[AnimFrame])] =
    try Right(decodeFrames(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed animated WebP"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated WebP: out-of-bounds read at ${e.getMessage}")
    }

  /** Animated fixture builder: VP8X (animation flag, canvas) + ANIM +
    * one ANMF per frame, each frame's pixels encoded by
    * [[buildFixture]]'s VP8L machinery under the given mode.
    */
  def buildAnimFixture(canvasW: Int, canvasH: Int,
      frames: Seq[(Int, Int, Int, Array[Int], Int, Int)], // x, y, durMs, px, w, h
      mode: String = "literal"): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val o = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff) }
    def w24(v: Int): Unit = { w16(v & 0xffff); o.write((v >>> 16) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def s4(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (fx, fy, dur, px, fw, fh) =>
      require(fx % 2 == 0 && fy % 2 == 0, "ANMF stores x/2, y/2")
      require(fx + fw <= canvasW && fy + fh <= canvasH, "frame on canvas")
      // reuse the single-image builder and carve out its VP8L chunk
      // (RIFF 12 + chunk header 8 in, chunk size from its header)
      val whole = buildFixture(px, fw, fh, mode)
      val chunkSize = (whole(16) & 0xff) | ((whole(17) & 0xff) << 8) |
        ((whole(18) & 0xff) << 16) | ((whole(19) & 0xff) << 24)
      val f = new java.io.ByteArrayOutputStream()
      def f16(v: Int): Unit = { f.write(v & 0xff); f.write((v >>> 8) & 0xff) }
      def f24(v: Int): Unit = { f16(v & 0xffff); f.write((v >>> 16) & 0xff) }
      f24(fx / 2); f24(fy / 2); f24(fw - 1); f24(fh - 1)
      f24(dur); f.write(0) // flags: no blend, keep
      f.write(whole, 12, 8 + chunkSize + (chunkSize & 1))
      val fb = f.toByteArray
      body.write("ANMF".getBytes("ISO-8859-1"))
      body.write(fb.length & 0xff); body.write((fb.length >>> 8) & 0xff)
      body.write((fb.length >>> 16) & 0xff); body.write((fb.length >>> 24) & 0xff)
      body.write(fb, 0, fb.length)
      if ((fb.length & 1) == 1) body.write(0)
    }
    val anim = body.toByteArray
    val riffLen = 4 + (8 + 10) + (8 + 6) + anim.length
    s4("RIFF"); w32(riffLen); s4("WEBP")
    s4("VP8X"); w32(10)
    o.write(0x02); o.write(0); o.write(0); o.write(0) // animation flag
    w24(canvasW - 1); w24(canvasH - 1)
    s4("ANIM"); w32(6)
    w32(0); w16(0) // background BGRA, infinite loop
    o.write(anim, 0, anim.length)
    o.toByteArray
  }

  private def decodeImage(bits: Bits, w: Int, h: Int,
      level0: Boolean): Array[Int] = {
    var curW = w
    var transforms = List.empty[Transform]
    if (level0) {
      var seen = 0
      while (bits.readBit() == 1) {
        val t = bits.read(2)
        if ((seen & (1 << t)) != 0) fail(s"VP8L transform $t appears twice")
        seen |= 1 << t
        t match {
          case 0 | 1 => // predictor / color: block-sized subimage
            val sb = bits.read(3) + 2
            val data = decodeImage(bits,
              divUp(curW, 1 << sb), divUp(h, 1 << sb), level0 = false)
            transforms ::= Transform(t, sb, data, curW)
          case 2 =>
            transforms ::= Transform(2, 0, null, curW)
          case _ => // color indexing: palette + possible pixel bundling
            val n = bits.read(8) + 1
            val pal = decodeImage(bits, n, 1, level0 = false)
            var k = 1
            while (k < n) { // palette entries are stored as deltas
              pal(k) = addPixels(pal(k), pal(k - 1))
              k += 1
            }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transforms ::= Transform(3, widthBits, pal, curW)
            curW = divUp(curW, 1 << widthBits)
        }
      }
    }
    var px = decodeSpatial(bits, curW, h, level0)
    // inverse transforms in reverse bitstream order (list is built
    // head-first, so it already iterates newest-to-oldest); each
    // inverse restores the width that transform saw when it was read
    transforms.foreach { t =>
      px = t.tpe match {
        case 0 => inversePredictor(t, px, t.srcW, h); px
        case 1 => inverseColor(t, px, t.srcW, h); px
        case 2 => inverseSubtractGreen(px); px
        case _ => inverseIndexing(t, px, curW, h)
      }
      curW = t.srcW
    }
    if (curW != w) fail("VP8L transform chain does not restore the width")
    px
  }

  /** The spatially-coded image: optional color cache, optional meta
    * prefix groups (level 0 only), then the LZ77 + literal + cache
    * pixel stream.
    */
  private def decodeSpatial(bits: Bits, w: Int, h: Int,
      level0: Boolean): Array[Int] = {
    val cacheBits =
      if (bits.readBit() == 1) {
        val cb = bits.read(4)
        if (cb < 1 || cb > 11) fail(s"VP8L color-cache bits $cb out of 1..11")
        cb
      } else 0
    var hb = 0
    var ew = 0
    var entropy: Array[Int] = null
    var nGroups = 1
    if (level0 && bits.readBit() == 1) {
      hb = bits.read(3) + 2
      ew = divUp(w, 1 << hb)
      entropy = decodeSpatial(bits, ew, divUp(h, 1 << hb), level0 = false)
      var m = 0
      var i = 0
      while (i < entropy.length) {
        m = math.max(m, (entropy(i) >> 8) & 0xffff); i += 1
      }
      nGroups = m + 1
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greens = new Array[Huff](nGroups)
    val reds = new Array[Huff](nGroups)
    val blues = new Array[Huff](nGroups)
    val alphas = new Array[Huff](nGroups)
    val dists = new Array[Huff](nGroups)
    var g = 0
    while (g < nGroups) {
      greens(g) = readCode(bits, 256 + 24 + cacheSize)
      reds(g) = readCode(bits, 256)
      blues(g) = readCode(bits, 256)
      alphas(g) = readCode(bits, 256)
      dists(g) = readCode(bits, 40)
      g += 1
    }
    val n = w * h
    val px = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    def insert(v: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * v) >>> (32 - cacheBits)) = v
    var i = 0
    while (i < n) {
      val grp =
        if (entropy == null) 0
        else {
          val m = entropy(((i / w) >> hb) * ew + ((i % w) >> hb))
          val gi = (m >> 8) & 0xffff
          gi
        }
      val s = greens(grp).read(bits)
      if (s < 256) {
        val r = reds(grp).read(bits)
        val b = blues(grp).read(bits)
        val a = alphas(grp).read(bits)
        val v = (a << 24) | (r << 16) | (s << 8) | b
        px(i) = v
        insert(v)
        i += 1
      } else if (s < 280) {
        val len = prefixValue(s - 256, bits)
        val dcode = prefixValue(dists(grp).read(bits), bits)
        val dist0 =
          if (dcode > 120) dcode - 120
          else {
            val dx = DistMap((dcode - 1) * 2)
            val dy = DistMap((dcode - 1) * 2 + 1)
            val d = dy * w + dx
            if (d < 1) 1 else d
          }
        if (dist0 > i) fail("VP8L back-reference before the image start")
        if (i + len > n) fail("VP8L back-reference overruns the image")
        var k = 0
        while (k < len) {
          val v = px(i - dist0)
          px(i) = v
          insert(v)
          i += 1
          k += 1
        }
      } else {
        if (cacheBits == 0) fail("VP8L color-cache symbol without a cache")
        val idx = s - 280
        if (idx >= cacheSize) fail("VP8L color-cache index out of range")
        px(i) = cache(idx)
        i += 1
      }
    }
    px
  }

  /** LZ77 length/distance prefix decoding: codes 0–3 are the value
    * directly (+1); above that, (2 + low bit) << extra_bits + extra.
    */
  private def prefixValue(code: Int, bits: Bits): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      ((2 + (code & 1)) << extra) + bits.read(extra) + 1
    }

  /** One prefix code: the simple form (1 or 2 symbols, spelled out) or
    * the normal form (code-length-coded lengths with repeats and the
    * optional max-symbol cap).
    */
  private def readCode(bits: Bits, alphabet: Int): Huff = {
    if (bits.readBit() == 1) { // simple
      val nSym = bits.readBit() + 1
      val first8 = bits.readBit()
      val s0 = bits.read(if (first8 == 1) 8 else 1)
      if (s0 >= alphabet) fail("VP8L simple-code symbol out of the alphabet")
      val lengths = new Array[Int](alphabet)
      if (nSym == 1) { lengths(s0) = 1 }
      else {
        val s1 = bits.read(8)
        if (s1 >= alphabet) fail("VP8L simple-code symbol out of the alphabet")
        if (s1 == s0) fail("VP8L simple code repeats a symbol")
        lengths(s0) = 1
        lengths(s1) = 1
      }
      new Huff(lengths)
    } else {
      val clLens = new Array[Int](19)
      val ncl = 4 + bits.read(4)
      var i = 0
      while (i < ncl) { clLens(ClOrder(i)) = bits.read(3); i += 1 }
      val clTree = new Huff(clLens)
      val lengths = new Array[Int](alphabet)
      var maxSymbol =
        if (bits.readBit() == 1) {
          val nb = 2 + 2 * bits.read(3)
          2 + bits.read(nb)
        } else alphabet
      var sym = 0
      var prev = 8
      var break = false
      while (sym < alphabet && !break) {
        if (maxSymbol == 0) break = true
        else {
          maxSymbol -= 1
          val cl = clTree.read(bits)
          if (cl < 16) {
            lengths(sym) = cl
            sym += 1
            if (cl != 0) prev = cl
          } else {
            val (extra, offset, usePrev) = cl match {
              case 16 => (2, 3, true)
              case 17 => (3, 3, false)
              case _  => (7, 11, false)
            }
            val rep = bits.read(extra) + offset
            if (sym + rep > alphabet)
              fail("VP8L code-length repeat overruns the alphabet")
            val v = if (usePrev) prev else 0
            var k = 0
            while (k < rep) { lengths(sym) = v; sym += 1; k += 1 }
          }
        }
      }
      new Huff(lengths)
    }
  }

  // ---- inverse transforms -------------------------------------------

  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) & 0xff
    val rr = (((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) & 0xff
    val gg = (((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) & 0xff
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) >> 1
    val rr = (((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) >> 1
    val gg = (((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) >> 1
    val bb = ((a & 0xff) + (b & 0xff)) >> 1
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var pL = 0
    var pT = 0
    var s = 0
    while (s < 32) {
      val p = ch(l, s) + ch(t, s) - ch(tl, s)
      pL += math.abs(p - ch(l, s))
      pT += math.abs(p - ch(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      out |= clamp255(ch(l, s) + ch(t, s) - ch(tl, s)) << s
      s += 8
    }
    out
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      val a = ch(ave, s)
      out |= clamp255(a + (a - ch(tl, s)) / 2) << s
      s += 8
    }
    out
  }

  private[multimodal] def predict(mode: Int, l: Int, t: Int, tl: Int,
      tr: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(avg2(l, t), tl)
    case m => fail(s"VP8L predictor mode $m out of 0..13")
  }

  /** In-place: residuals become pixels scanning row-major, so every
    * neighbor is already reconstructed. Border rules per the spec:
    * (0,0) predicts opaque black, the top row predicts L, the left
    * column predicts T; the top-right of a rightmost pixel wraps to
    * the current row's first pixel (the flat-index rule the spec
    * defines).
    */
  private def inversePredictor(tf: Transform, px: Array[Int], w: Int,
      h: Int): Unit = {
    val tw = divUp(w, 1 << tf.bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1)
          else if (x == 0) px(i - w)
          else {
            val mode = (tf.data(((y >> tf.bits) * tw) + (x >> tf.bits)) >> 8) & 0xff
            predict(mode, px(i - 1), px(i - w), px(i - w - 1), px(i - w + 1))
          }
        px(i) = addPixels(px(i), pred)
        x += 1
      }
      y += 1
    }
  }

  /** 3.5 signed fixed-point cross-channel delta: both the transform
    * value and the color channel are re-interpreted as signed bytes.
    */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** In-place inverse color transform. Element channels per the spec:
    * green_to_red rides the blue byte, green_to_blue the green byte,
    * red_to_blue the red byte; blue's red-delta uses the RECONSTRUCTED
    * red.
    */
  private def inverseColor(tf: Transform, px: Array[Int], w: Int,
      h: Int): Unit = {
    val tw = divUp(w, 1 << tf.bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val e = tf.data(((y >> tf.bits) * tw) + (x >> tf.bits))
        val g2r = e & 0xff
        val g2b = (e >> 8) & 0xff
        val r2b = (e >> 16) & 0xff
        val v = px(i)
        val g = (v >>> 8) & 0xff
        var r = (v >>> 16) & 0xff
        var b = v & 0xff
        r = (r + ctDelta(g2r, g)) & 0xff
        b = (b + ctDelta(g2b, g)) & 0xff
        b = (b + ctDelta(r2b, r)) & 0xff
        px(i) = (v & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val g = (v >>> 8) & 0xff
      val r = (((v >>> 16) & 0xff) + g) & 0xff
      val b = ((v & 0xff) + g) & 0xff
      px(i) = (v & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Color-indexing inverse: the green channel carries the palette
    * index — sub-byte-bundled when the palette has at most 16 entries.
    * An out-of-range index is loud (stricter than tolerant decoders,
    * and mirrored by the native twin).
    */
  private def inverseIndexing(tf: Transform, px: Array[Int], packedW: Int,
      h: Int): Array[Int] = {
    val w = tf.srcW
    val n = tf.data.length
    val xcount = 1 << tf.bits
    val bitsPer = 8 >> tf.bits
    val mask = (1 << bitsPer) - 1
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = px(y * packedW + (x >> tf.bits))
        val j = x & (xcount - 1)
        val idx = ((packed >>> 8) >> (j * bitsPer)) & mask
        if (idx >= n) fail("VP8L palette index out of range")
        out(y * w + x) = tf.data(idx)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- fixture encoder ----------------------------------------------

  /** LSB-first bit writer (the [[Flac.BitW]] twin for the VP8L bit
    * order).
    */
  private final class BitW {
    private val o = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(v: Int): Unit = {
      cur |= (v & 1) << nb
      nb += 1
      if (nb == 8) { o.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { bit((v >>> i) & 1); i += 1 }
    }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = { align(); o.toByteArray }
  }

  /** Canonical writer table for a lengths array — codes assigned once
    * (the reader's assignment, MSB-first on the wire), then each
    * symbol write is a bit loop. A single-symbol table writes zero
    * bits, mirroring the degenerate tree.
    */
  private final class Codes(val lengths: Array[Int]) {
    private val codes = new Array[Int](lengths.length)
    private val single: Boolean = {
      var nz = 0
      lengths.foreach(l => if (l > 0) nz += 1)
      if (nz > 1) {
        val count = new Array[Int](MaxLen + 1)
        lengths.foreach(l => if (l > 0) count(l) += 1)
        val next = new Array[Int](MaxLen + 1)
        var code = 0
        var l = 1
        while (l <= MaxLen) {
          next(l) = code
          code = (code + count(l)) << 1
          l += 1
        }
        var i = 0
        while (i < lengths.length) {
          val ln = lengths(i)
          if (ln > 0) { codes(i) = next(ln); next(ln) += 1 }
          i += 1
        }
      }
      nz == 1
    }
    def write(w: BitW, sym: Int): Unit = {
      if (single) return
      val len = lengths(sym)
      val c = codes(sym)
      var j = len - 1
      while (j >= 0) { w.bit((c >>> j) & 1); j -= 1 }
    }
  }

  private def writeSym(w: BitW, codes: Codes, sym: Int): Unit =
    codes.write(w, sym)

  /** Write a NORMAL-form prefix code whose symbols all have length
    * `len` for the first `alphabet` symbols (a flat, possibly
    * incomplete canonical code): the code-length code is the
    * degenerate single-symbol tree for `len`, so each of the
    * `alphabet` per-symbol reads costs zero bits.
    */
  private def writeFlatCode(w: BitW, alphabet: Int, len: Int): Unit = {
    w.bit(0) // normal form
    val idx = ClOrder.indexOf(len)
    val ncl = math.max(4, idx + 1)
    w.bits(ncl - 4, 4)
    var i = 0
    while (i < ncl) { w.bits(if (ClOrder(i) == len) 1 else 0, 3); i += 1 }
    w.bit(0) // no max-symbol cap: all `alphabet` lengths are emitted
    // each symbol's length then decodes from the degenerate
    // single-symbol code-length tree at ZERO bits — nothing to write
  }

  private def flatLengths(alphabet: Int, len: Int): Array[Int] =
    Array.fill(alphabet)(len)

  /** Write the degenerate one-symbol code via the simple form (its
    * 8-bit symbol field caps this at 255 — every tree the fixtures
    * leave unused takes symbol 0).
    */
  private def writeSingleCode(w: BitW, sym: Int): Unit = {
    require(sym < 256, "simple-form single-symbol codes cap at 255")
    w.bit(1) // simple
    w.bit(0) // one symbol
    if (sym < 2) { w.bit(0); w.bit(sym) }
    else { w.bit(1); w.bits(sym, 8) }
  }

  /** Encode ARGB pixels (top-down row-major) as a spec-conformant
    * lossless WebP. The bitstream strategy is EXPLICIT (the
    * [[Flac.buildFixture]] convention) so each path is exercisable:
    *
    *  - `literal`   — flat 9-bit green / 8-bit channel codes, no
    *                  transform, no cache
    *  - `lz77`      — second half of the pixels must repeat the first
    *                  half; emitted as one direct-distance reference
    *  - `lz77map`   — all pixels after the first must equal it; one
    *                  reference through distance-map code 2 (dx=1,dy=0)
    *  - `cache`     — 4-bit color cache; literals, cache hits whenever
    *                  the hash slot already holds the pixel
    *  - `subgreen`  — subtract-green transform over literals
    *  - `predictorN` (N in 0..13) — one predictor block covering the
    *                  whole image (needs w,h <= 512), residual literals
    *  - `colortx`   — one color-transform block (g2r=5, g2b=-3,
    *                  r2b=2), forward-transformed literals
    *  - `palette`   — color indexing; bundles indices when the
    *                  distinct-color count is at most 16
    *  - `meta`      — meta prefix groups: a 4-pixel-block entropy
    *                  image splits the canvas into a left and a right
    *                  group whose green codes have DIFFERENT lengths
    *                  (9 vs 10 bits), so decode proves the right tree
    *                  is selected per block
    */
  def buildFixture(px: Array[Int], w: Int, h: Int,
      mode: String): Array[Byte] = {
    require(px.length == w * h, "pixel count must equal w*h")
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383, "dims in 1..16383")
    val bw = new BitW
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    val alphaUsed = px.exists(p => ((p >>> 24) & 0xff) != 0xff)
    bw.bit(if (alphaUsed) 1 else 0)
    bw.bits(0, 3) // version

    def writeLiteralImage(pixels: Array[Int], cacheBits: Int): Unit = {
      // no meta groups; optional cache; flat trees
      if (cacheBits > 0) { bw.bit(1); bw.bits(cacheBits, 4) }
      else bw.bit(0)
      bw.bit(0) // no meta prefix image (level 0 only reads this bit —
                // subimages are written by writeSubimage below)
      val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
      val greenLens = new Codes(flatLengths(256 + 24 + cacheSize, 9))
      val chan8 = new Codes(flatLengths(256, 8))
      writeFlatCode(bw, 256 + 24 + cacheSize, 9)
      writeFlatCode(bw, 256, 8)
      writeFlatCode(bw, 256, 8)
      writeFlatCode(bw, 256, 8)
      writeSingleCode(bw, 0) // distance tree: unused single symbol
      val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
      val filled =
        if (cache != null) new Array[Boolean](cacheSize) else null
      var i = 0
      while (i < pixels.length) {
        val v = pixels(i)
        val slot =
          if (cache != null) (0x1e35a7bd * v) >>> (32 - cacheBits) else 0
        if (cache != null && filled(slot) && cache(slot) == v) {
          writeSym(bw, greenLens, 280 + slot)
        } else {
          writeSym(bw, greenLens, (v >>> 8) & 0xff)
          writeSym(bw, chan8, (v >>> 16) & 0xff)
          writeSym(bw, chan8, v & 0xff)
          writeSym(bw, chan8, (v >>> 24) & 0xff)
          if (cache != null) { cache(slot) = v; filled(slot) = true }
        }
        i += 1
      }
    }

    /** A 1-row/1-pixel-deep subimage (palette, transform blocks):
      * no transforms, no cache, no meta image — literal pixels under
      * flat codes; single-symbol codes when one pixel suffices.
      */
    def writeSubimage(pixels: Array[Int]): Unit = {
      bw.bit(0) // no color cache
      // NOT level 0: no meta-prefix bit is read for subimages
      writeFlatCode(bw, 256 + 24, 9)
      writeFlatCode(bw, 256, 8)
      writeFlatCode(bw, 256, 8)
      writeFlatCode(bw, 256, 8)
      writeSingleCode(bw, 0)
      val g9 = new Codes(flatLengths(256 + 24, 9))
      val c8 = new Codes(flatLengths(256, 8))
      pixels.foreach { v =>
        writeSym(bw, g9, (v >>> 8) & 0xff)
        writeSym(bw, c8, (v >>> 16) & 0xff)
        writeSym(bw, c8, v & 0xff)
        writeSym(bw, c8, (v >>> 24) & 0xff)
      }
    }

    mode match {
      case "literal" =>
        bw.bit(0) // no transforms
        writeLiteralImage(px, 0)
      case "cache" =>
        bw.bit(0)
        writeLiteralImage(px, 4)
      case "subgreen" =>
        bw.bit(1); bw.bits(2, 2) // subtract-green
        bw.bit(0)
        writeLiteralImage(px.map { v =>
          val g = (v >>> 8) & 0xff
          val r = (((v >>> 16) & 0xff) - g) & 0xff
          val b = ((v & 0xff) - g) & 0xff
          (v & 0xff00ff00) | (r << 16) | b
        }, 0)
      case "lz77" =>
        require(w * h % 2 == 0 &&
          (0 until w * h / 2).forall(i => px(i) == px(i + w * h / 2)),
          "lz77 mode needs the second half repeating the first")
        bw.bit(0)
        bw.bit(0) // no cache
        bw.bit(0) // no meta image
        val half = w * h / 2
        val greenLens = new Codes(flatLengths(256 + 24, 9))
        val c8 = new Codes(flatLengths(256, 8))
        writeFlatCode(bw, 256 + 24, 9)
        writeFlatCode(bw, 256, 8)
        writeFlatCode(bw, 256, 8)
        writeFlatCode(bw, 256, 8)
        writeFlatCode(bw, 40, 6)
        var i = 0
        while (i < half) {
          val v = px(i)
          writeSym(bw, greenLens, (v >>> 8) & 0xff)
          writeSym(bw, c8, (v >>> 16) & 0xff)
          writeSym(bw, c8, v & 0xff)
          writeSym(bw, c8, (v >>> 24) & 0xff)
          i += 1
        }
        writeLz(bw, greenLens, new Codes(flatLengths(40, 6)), half, half + 120)
      case "lz77map" =>
        require(w * h >= 2 && (1 until w * h).forall(i => px(i) == px(0)),
          "lz77map mode needs all pixels equal")
        bw.bit(0)
        bw.bit(0)
        bw.bit(0)
        val greenLens = new Codes(flatLengths(256 + 24, 9))
        val c8 = new Codes(flatLengths(256, 8))
        writeFlatCode(bw, 256 + 24, 9)
        writeFlatCode(bw, 256, 8)
        writeFlatCode(bw, 256, 8)
        writeFlatCode(bw, 256, 8)
        writeFlatCode(bw, 40, 6)
        val v = px(0)
        writeSym(bw, greenLens, (v >>> 8) & 0xff)
        writeSym(bw, c8, (v >>> 16) & 0xff)
        writeSym(bw, c8, v & 0xff)
        writeSym(bw, c8, (v >>> 24) & 0xff)
        // distance-map plane code 2 = (dx=1, dy=0) → distance 1
        writeLz(bw, greenLens, new Codes(flatLengths(40, 6)), w * h - 1, 2)
      case m if m.startsWith("predictor") =>
        // "predictorN": one block, mode N, covering the whole image;
        // "predictormulti": 4-pixel blocks whose modes CYCLE through
        // all 14 — proving per-block mode switching in the inverse
        val multi = m == "predictormulti"
        val pmode = if (multi) -1 else m.drop("predictor".length).toInt
        require(multi || (pmode >= 0 && pmode <= 13), "predictor mode 0..13")
        require(w <= 512 && h <= 512, "predictor fixture: dims <= 512")
        var sb = 2
        if (!multi) while ((1 << sb) < math.max(w, h)) sb += 1
        require(sb <= 9, "predictor block size")
        val tw = divUp(w, 1 << sb)
        val th = divUp(h, 1 << sb)
        def modeAt(x: Int, y: Int): Int =
          if (multi) ((y >> sb) * tw + (x >> sb)) % 14 else pmode
        bw.bit(1); bw.bits(0, 2) // predictor transform
        bw.bits(sb - 2, 3)
        writeSubimage(Array.tabulate(tw * th)(k =>
          0xff000000 | ((if (multi) k % 14 else pmode) << 8)))
        bw.bit(0) // end of transforms
        // forward: residual = pixel - predicted (original neighbors —
        // the inverse reconstructs them identically)
        val res = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y * w + x
            val pred =
              if (x == 0 && y == 0) 0xff000000
              else if (y == 0) px(i - 1)
              else if (x == 0) px(i - w)
              else predict(modeAt(x, y), px(i - 1), px(i - w),
                px(i - w - 1), px(i - w + 1))
            res(i) = subPixels(px(i), pred)
            x += 1
          }
          y += 1
        }
        writeLiteralImage(res, 0)
      case "colortx" =>
        require(w <= 512 && h <= 512, "colortx fixture: dims <= 512")
        var sb = 2
        while ((1 << sb) < math.max(w, h)) sb += 1
        require(sb <= 9, "colortx block size")
        // g2r=5 (blue byte), g2b=-3 (green byte), r2b=2 (red byte)
        val cte = 0xff000000 | (2 << 16) | ((-3 & 0xff) << 8) | 5
        bw.bit(1); bw.bits(1, 2) // color transform
        bw.bits(sb - 2, 3)
        writeSubimage(Array(cte))
        bw.bit(0)
        writeLiteralImage(px.map { v =>
          val g = (v >>> 8) & 0xff
          val r = (v >>> 16) & 0xff
          val b = v & 0xff
          val rt = (r - ctDelta(5, g)) & 0xff
          val bt = (b - ctDelta(-3 & 0xff, g) - ctDelta(2, r)) & 0xff
          (v & 0xff00ff00) | (rt << 16) | bt
        }, 0)
      case "palette" =>
        val distinct = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
        px.foreach(v => if (!distinct.contains(v)) distinct(v) = distinct.size)
        val n = distinct.size
        require(n <= 256, "palette fixture: at most 256 distinct colors")
        val pal = distinct.keys.toArray
        bw.bit(1); bw.bits(3, 2) // color indexing
        bw.bits(n - 1, 8)
        // palette is stored delta-coded per channel
        val deltas = pal.zipWithIndex.map { case (p, i) =>
          if (i == 0) p else subPixels(p, pal(i - 1))
        }
        writeSubimage(deltas)
        bw.bit(0) // end of transforms
        val widthBits =
          if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
        val xcount = 1 << widthBits
        val bitsPer = 8 >> widthBits
        val packedW = divUp(w, xcount)
        val packed = new Array[Int](packedW * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val idx = distinct(px(y * w + x))
            val pi = y * packedW + (x >> widthBits)
            val j = x & (xcount - 1)
            packed(pi) |= (idx << (j * bitsPer)) << 8 // green channel
            x += 1
          }
          y += 1
        }
        // packed pixels carry index bits in green; alpha stays 0 —
        // the indexing inverse replaces the whole pixel anyway
        writeLiteralImage(packed, 0)
      case "meta" =>
        require(w > 4, "meta mode needs both groups non-empty (w > 4)")
        bw.bit(0) // no transforms
        bw.bit(0) // no color cache
        bw.bit(1) // meta prefix image
        val hb = 2 // 4-pixel blocks
        bw.bits(hb - 2, 3)
        val ew = divUp(w, 1 << hb)
        val eh = divUp(h, 1 << hb)
        def groupOf(x: Int): Int = if ((x >> hb) * (1 << hb) >= w / 2) 1 else 0
        val entropyPx = Array.tabulate(ew * eh) { k =>
          0xff000000 | (groupOf((k % ew) << hb) << 8)
        }
        writeSubimage(entropyPx)
        // two groups whose green codes differ in LENGTH — a stream
        // decoded with the wrong group's tree cannot round-trip
        val g9 = new Codes(flatLengths(256 + 24, 9))
        val g10 = new Codes(flatLengths(256 + 24, 10))
        Seq(9, 10).foreach { len =>
          writeFlatCode(bw, 256 + 24, len)
          writeFlatCode(bw, 256, 8)
          writeFlatCode(bw, 256, 8)
          writeFlatCode(bw, 256, 8)
          writeSingleCode(bw, 0)
        }
        val c8 = new Codes(flatLengths(256, 8))
        var i = 0
        while (i < px.length) {
          val v = px(i)
          val gl = if (groupOf(i % w) == 0) g9 else g10
          writeSym(bw, gl, (v >>> 8) & 0xff)
          writeSym(bw, c8, (v >>> 16) & 0xff)
          writeSym(bw, c8, v & 0xff)
          writeSym(bw, c8, (v >>> 24) & 0xff)
          i += 1
        }
      case other => throw new IllegalArgumentException(s"unknown mode $other")
    }

    val stream = bw.bytes
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    def s4(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
    val payload = 1 + stream.length // signature + stream
    s4("RIFF"); w32(4 + 8 + payload + (payload & 1)); s4("WEBP")
    s4("VP8L"); w32(payload)
    o.write(0x2f)
    o.write(stream, 0, stream.length)
    if ((payload & 1) == 1) o.write(0)
    o.toByteArray
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) & 0xff) - ((b >>> 24) & 0xff)) & 0xff
    val rr = (((a >>> 16) & 0xff) - ((b >>> 16) & 0xff)) & 0xff
    val gg = (((a >>> 8) & 0xff) - ((b >>> 8) & 0xff)) & 0xff
    val bb = ((a & 0xff) - (b & 0xff)) & 0xff
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }

  /** One LZ77 reference: length via the prefix coding on the green
    * tree, then the distance code on the distance tree.
    */
  private def writeLz(w: BitW, greenLens: Codes, distLens: Codes,
      len: Int, distCode: Int): Unit = {
    val (lsym, lextra, lbits) = prefixEncode(len)
    writeSym(w, greenLens, 256 + lsym)
    if (lbits > 0) w.bits(lextra, lbits)
    val (dsym, dextra, dbits) = prefixEncode(distCode)
    writeSym(w, distLens, dsym)
    if (dbits > 0) w.bits(dextra, dbits)
  }

  /** Inverse of [[prefixValue]]: value → (code, extra, extraBits). */
  private[multimodal] def prefixEncode(value: Int): (Int, Int, Int) = {
    require(value >= 1, "prefix values start at 1")
    if (value <= 4) (value - 1, 0, 0)
    else {
      var extra = 1
      while (true) {
        val lo2 = 2 << extra
        val lo3 = 3 << extra
        if (value - 1 >= lo2 && value - 1 < lo3)
          return (2 + 2 * extra, value - 1 - lo2, extra)
        if (value - 1 >= lo3 && value - 1 < (lo2 << 1))
          return (3 + 2 * extra, value - 1 - lo3, extra)
        extra += 1
        if (extra > 24) fail("LZ77 value out of range")
      }
      throw new IllegalStateException("unreachable")
    }
  }
}
