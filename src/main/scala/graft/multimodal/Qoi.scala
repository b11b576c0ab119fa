package graft.multimodal

/** A complete decoder for the QOI image format (the public "Quite OK
  * Image" spec, qoiformat.org) — the first REAL non-JDK codec wired
  * through the [[Multimodal.RealDecoder]] seam. QOI is a genuine
  * compressed format (byte-tagged run-length, seen-pixel index, and
  * delta ops), so decoding it proves the seam's contract end-to-end
  * with zero native dependencies: a lossless non-JDK codec must
  * reproduce [[Multimodal.UncompressedDecoder]]'s features
  * BIT-FOR-BIT on the same pixel content (MultimodalContractSpec pins
  * QOI-vs-BMP equality on a stream exercising every op).
  *
  * Decode state per the spec: previous pixel starts (0,0,0,255); a
  * 64-slot seen-pixel index keyed by (3r+5g+7b+11a) mod 64, updated
  * after every decoded OP (run pixels repeat the op's pixel, so the
  * entry is already current). Corrupt streams fail loudly — a
  * truncated chunk or an overlong run must never spin an executor or
  * read past the buffer (the UncompressedDecoder WAV rule).
  */
object Qoi {

  /** Decode to (width, height, 0xRRGGBB pixels in top-down row-major
    * order). Alpha decodes (it feeds the index hash) but is not
    * returned — the feature fold ignores it, like RealDecoder's ARGB
    * path.
    */
  def decode(b: Array[Byte]): (Int, Int, Array[Int]) = {
    require(b.length >= 14 + 8 &&
      b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f',
      "not a QOI payload")
    def u32be(i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    val w = u32be(4)
    val h = u32be(8)
    val channels = b(12) & 0xff
    val colorspace = b(13) & 0xff
    require(channels == 3 || channels == 4,
      s"QOI channels must be 3 or 4, got $channels")
    require(colorspace <= 1, s"QOI colorspace must be 0 or 1, got $colorspace")
    require(w > 0 && h > 0 && w.toLong * h <= (Int.MaxValue >> 2),
      s"bad QOI dimensions ${w}x$h")
    val n = w * h
    val px = new Array[Int](n)
    var r = 0; var g = 0; var bl = 0; var a = 255
    val index = new Array[Int](64) // packed RGBA, zero = (0,0,0,0)
    val end = b.length - 8 // ops end where the 8-byte end marker starts
    var p = 14
    var i = 0
    while (i < n) {
      require(p < end, s"truncated QOI stream at pixel $i of $n")
      val tag = b(p) & 0xff
      var run = 1
      if (tag == 0xFE) { // QOI_OP_RGB
        require(p + 4 <= end, "truncated QOI_OP_RGB")
        r = b(p + 1) & 0xff; g = b(p + 2) & 0xff; bl = b(p + 3) & 0xff
        p += 4
      } else if (tag == 0xFF) { // QOI_OP_RGBA
        require(p + 5 <= end, "truncated QOI_OP_RGBA")
        r = b(p + 1) & 0xff; g = b(p + 2) & 0xff
        bl = b(p + 3) & 0xff; a = b(p + 4) & 0xff
        p += 5
      } else (tag >>> 6) match {
        case 0 => // QOI_OP_INDEX
          val v = index(tag & 0x3f)
          r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff
          bl = (v >>> 8) & 0xff; a = v & 0xff
          p += 1
        case 1 => // QOI_OP_DIFF: 2-bit channel deltas, bias 2, wrapping
          r = (r + ((tag >> 4) & 3) - 2) & 0xff
          g = (g + ((tag >> 2) & 3) - 2) & 0xff
          bl = (bl + (tag & 3) - 2) & 0xff
          p += 1
        case 2 => // QOI_OP_LUMA: 6-bit dg bias 32; 4-bit dr-dg/db-dg bias 8
          require(p + 2 <= end, "truncated QOI_OP_LUMA")
          val dg = (tag & 0x3f) - 32
          val b2 = b(p + 1) & 0xff
          r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
          g = (g + dg) & 0xff
          bl = (bl + dg + (b2 & 0xf) - 8) & 0xff
          p += 2
        case _ => // QOI_OP_RUN (0xFE/0xFF were taken above): length 1..62
          run = (tag & 0x3f) + 1
          p += 1
      }
      index(((3 * r + 5 * g + 7 * bl + 11 * a) % 64)) =
        (r << 24) | (g << 16) | (bl << 8) | a
      require(i + run <= n,
        s"QOI run of $run overflows the ${w}x$h pixel count at $i")
      val packed = (r << 16) | (g << 8) | bl
      var k = 0
      while (k < run) { px(i) = packed; i += 1; k += 1 }
    }
    (w, h, px)
  }
}
