package graft.multimodal

/** WebP and FLAC container-metadata walks — the companions to [[Mp4]]
  * on the codec seam's container step: pure-JVM byte parsing of the
  * PUBLIC formats (RIFF/WebP container spec; the FLAC format spec's
  * STREAMINFO block), NO sample decode, loud on every malformation
  * (the Qoi corrupt-stream discipline). What a curation pipeline asks
  * of an image/audio payload before any decoder runs: is the container
  * well-formed, what are the dimensions / duration / channel layout.
  */
object Containers {

  /** WebP image metadata: the variant chunk that carries the
    * dimensions ("VP8 " lossy / "VP8L" lossless / "VP8X" extended) and
    * the canvas size. For VP8X, `alpha`/`animation` expose the feature
    * flags a pipeline filters on.
    */
  final case class WebPMeta(variant: String, width: Int, height: Int,
      alpha: Boolean, animation: Boolean)

  /** FLAC STREAMINFO metadata: rate/channels/depth and the exact
    * duration (total samples are in the header — no frame walk
    * needed).
    */
  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, durationSec: Double)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  private def u24be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  private def cc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def need(cond: Boolean, what: => String): Unit =
    require(cond, s"truncated or malformed WebP/FLAC: $what")

  /** Parse a WebP payload's metadata. RIFF grammar: `RIFF` + u32le
    * riff-size + `WEBP`, then chunks of `[4cc][u32le size][payload,
    * padded to even]`. Dimensions come from the first variant chunk:
    *
    *  - `VP8 ` (lossy): 3-byte frame tag, the 9d 01 2a start code,
    *    then 14-bit width/height (u16le & 0x3fff).
    *  - `VP8L` (lossless): the 0x2f signature, then width-1/height-1
    *    as consecutive 14-bit little-endian bitfields.
    *  - `VP8X` (extended): 1 flag byte (bit 4 alpha, bit 1 animation),
    *    3 reserved, then canvas width-1/height-1 as u24le.
    */
  def webpMeta(bytes: Array[Byte]): WebPMeta = {
    need(bytes.length >= 12, "shorter than the RIFF header")
    require(cc(bytes, 0) == "RIFF" && cc(bytes, 8) == "WEBP",
      "not a WebP payload (RIFF....WEBP magic missing)")
    val riffEnd = 8 + u32le(bytes, 4)
    require(riffEnd <= bytes.length,
      s"RIFF size $riffEnd overruns the ${bytes.length}-byte buffer")
    var i = 12L
    while (i + 8 <= riffEnd) {
      val tpe = cc(bytes, i.toInt)
      val size = u32le(bytes, i.toInt + 4)
      val start = i + 8
      require(start + size <= riffEnd,
        s"chunk '$tpe' (size $size) overruns the RIFF payload")
      val s = start.toInt
      tpe match {
        case "VP8 " =>
          need(size >= 10, "VP8 bitstream header")
          require((bytes(s + 3) & 0xff) == 0x9d &&
              (bytes(s + 4) & 0xff) == 0x01 && (bytes(s + 5) & 0xff) == 0x2a,
            "VP8 start code missing")
          return WebPMeta("lossy", u16le(bytes, s + 6) & 0x3fff,
            u16le(bytes, s + 8) & 0x3fff, alpha = false, animation = false)
        case "VP8L" =>
          need(size >= 5, "VP8L header")
          require((bytes(s) & 0xff) == 0x2f, "VP8L signature missing")
          val w = 1 + (((bytes(s + 2) & 0x3f) << 8) | (bytes(s + 1) & 0xff))
          val h = 1 + (((bytes(s + 4) & 0x0f) << 10) |
            ((bytes(s + 3) & 0xff) << 2) | ((bytes(s + 2) & 0xc0) >>> 6))
          // VP8L's alpha_is_used bit rides after the 28 size bits
          val alpha = (bytes(s + 4) & 0x10) != 0
          return WebPMeta("lossless", w, h, alpha, animation = false)
        case "VP8X" =>
          need(size >= 10, "VP8X header")
          val flags = bytes(s) & 0xff
          return WebPMeta("extended",
            1 + u24le(bytes, s + 4), 1 + u24le(bytes, s + 7),
            alpha = (flags & 0x10) != 0, animation = (flags & 0x02) != 0)
        case _ => () // ICCP/EXIF/etc. before the variant chunk: skip
      }
      i = start + size + (size & 1) // chunks pad to even
    }
    throw new IllegalArgumentException(
      "no VP8 /VP8L/VP8X chunk: WebP carries no image bitstream")
  }

  /** Parse a FLAC payload's STREAMINFO. Grammar: `fLaC`, then metadata
    * blocks of `[1 byte: last<<7 | type][u24be length]`; STREAMINFO is
    * type 0, mandatory first, 34 bytes: min/max block size (2+2),
    * min/max frame size (3+3), then 8 packed bytes — sample rate 20
    * bits, channels-1 3 bits, bits-per-sample-1 5 bits, total samples
    * 36 bits.
    */
  def flacMeta(bytes: Array[Byte]): FlacMeta = {
    need(bytes.length >= 8, "shorter than the fLaC magic + block header")
    require(cc(bytes, 0) == "fLaC", "not a FLAC payload (fLaC magic missing)")
    require((bytes(4) & 0x7f) == 0, "first metadata block is not STREAMINFO")
    val len = u24be(bytes, 5)
    require(len >= 34, s"STREAMINFO length $len < 34")
    need(8 + len <= bytes.length, "STREAMINFO body")
    val s = 8 + 10 // skip block/frame size fields
    val sampleRate = ((bytes(s) & 0xff) << 12) | ((bytes(s + 1) & 0xff) << 4) |
      ((bytes(s + 2) & 0xff) >>> 4)
    require(sampleRate > 0, "STREAMINFO sample rate 0")
    val channels = ((bytes(s + 2) >>> 1) & 0x07) + 1
    val bps = (((bytes(s + 2) & 0x01) << 4) | ((bytes(s + 3) & 0xff) >>> 4)) + 1
    val totalSamples = ((bytes(s + 3) & 0x0fL) << 32) |
      ((bytes(s + 4) & 0xffL) << 24) | ((bytes(s + 5) & 0xffL) << 16) |
      ((bytes(s + 6) & 0xffL) << 8) | (bytes(s + 7) & 0xffL)
    FlacMeta(sampleRate, channels, bps, totalSamples,
      totalSamples.toDouble / sampleRate)
  }

  /** Quarantine forms of the two walks ([[Mp4.tryMeta]] convention):
    * a malformed payload yields Left(reason) instead of aborting the
    * pass; loud forms stay for fixtures. Parse-shaped failures only —
    * errors still propagate.
    */
  def tryWebpMeta(bytes: Array[Byte]): Either[String, WebPMeta] =
    try Right(webpMeta(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed WebP"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated WebP: out-of-bounds read at ${e.getMessage}")
    }

  def tryFlacMeta(bytes: Array[Byte]): Either[String, FlacMeta] =
    try Right(flacMeta(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed FLAC"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated FLAC: out-of-bounds read at ${e.getMessage}")
    }

  /** FLAC VORBIS_COMMENT tags (metadata block type 4) — the text
    * metadata an audio-curation pipeline filters on (TITLE, ARTIST,
    * LANGUAGE, ...). The comment block is LITTLE-endian (the vorbis
    * framing convention, unlike every other FLAC field): vendor
    * length + string, then a comment count and length-prefixed
    * `KEY=value` UTF-8 entries. Keys are case-insensitive per the
    * vorbis spec and come back UPPERCASED; values keep their bytes.
    * Duplicate keys are legal (multi-valued tags) and all survive in
    * file order. A FLAC without the block yields (vendor "", no
    * tags); a malformed block is loud.
    */
  def flacTags(bytes: Array[Byte]): (String, List[(String, String)]) = {
    flacMeta(bytes) // magic + STREAMINFO validation
    var p = 4
    var last = false
    while (!last) {
      need(p + 4 <= bytes.length, "FLAC metadata block header")
      last = (bytes(p) & 0x80) != 0
      val tpe = bytes(p) & 0x7f
      val len = u24be(bytes, p + 1)
      need(p + 4 + len <= bytes.length, "FLAC metadata block body")
      if (tpe == 4) {
        val end = p + 4 + len
        var q = p + 4
        def u32(): Long = {
          need(q + 4 <= end, "VORBIS_COMMENT length field")
          val v = u32le(bytes, q); q += 4; v
        }
        def str(n: Long): String = {
          require(n <= end - q,
            s"VORBIS_COMMENT string ($n bytes) overruns the block")
          val s = new String(bytes, q, n.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          q += n.toInt
          s
        }
        val vendor = str(u32())
        val n = u32()
        val tags = List.newBuilder[(String, String)]
        var i = 0L
        while (i < n) {
          val c = str(u32())
          val eq = c.indexOf('=')
          require(eq > 0, s"VORBIS_COMMENT entry without KEY=: '$c'")
          tags += ((c.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
            c.substring(eq + 1)))
          i += 1
        }
        return (vendor, tags.result())
      }
      p += 4 + len
    }
    ("", Nil)
  }

  def tryFlacTags(
      bytes: Array[Byte]): Either[String, (String, List[(String, String)])] =
    try Right(flacTags(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed FLAC"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated FLAC: out-of-bounds read at ${e.getMessage}")
    }

  /** Fixture builders — the forward-writing twins ([[Mp4.buildFixture]]
    * convention): gates/specs prove the round trip without a codec.
    */
  def buildWebPFixture(variant: String, w: Int, h: Int,
      alpha: Boolean = false, animation: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >>> 16) & 0xffff).toInt) }
    def s4(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
    val body = new java.io.ByteArrayOutputStream()
    variant match {
      case "lossy" =>
        body.write(0); body.write(0); body.write(0) // frame tag
        body.write(0x9d); body.write(0x01); body.write(0x2a)
        body.write(w & 0xff); body.write((w >>> 8) & 0x3f)
        body.write(h & 0xff); body.write((h >>> 8) & 0x3f)
      case "lossless" =>
        body.write(0x2f)
        val wm = w - 1; val hm = h - 1
        body.write(wm & 0xff)
        body.write(((wm >>> 8) & 0x3f) | ((hm & 0x03) << 6))
        body.write((hm >>> 2) & 0xff)
        body.write(((hm >>> 10) & 0x0f) | (if (alpha) 0x10 else 0))
      case "extended" =>
        body.write((if (alpha) 0x10 else 0) | (if (animation) 0x02 else 0))
        body.write(0); body.write(0); body.write(0)
        val wm = w - 1; val hm = h - 1
        body.write(wm & 0xff); body.write((wm >>> 8) & 0xff); body.write((wm >>> 16) & 0xff)
        body.write(hm & 0xff); body.write((hm >>> 8) & 0xff); body.write((hm >>> 16) & 0xff)
      case other => throw new IllegalArgumentException(s"variant: $other")
    }
    val chunkType = variant match {
      case "lossy" => "VP8 "
      case "lossless" => "VP8L"
      case "extended" => "VP8X"
    }
    val payload = body.toByteArray
    s4("RIFF"); w32(4L + 8 + payload.length + (payload.length & 1)); s4("WEBP")
    s4(chunkType); w32(payload.length.toLong); o.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) o.write(0)
    o.toByteArray
  }

  def buildFlacFixture(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, vendor: String = "",
      tags: Seq[(String, String)] = Nil): Array[Byte] = {
    val withTags = vendor.nonEmpty || tags.nonEmpty
    val o = new java.io.ByteArrayOutputStream()
    o.write("fLaC".getBytes("ISO-8859-1"))
    // STREAMINFO is last only when no VORBIS_COMMENT block follows
    o.write(if (withTags) 0x00 else 0x80)
    o.write(0); o.write(0); o.write(34)
    // min/max block size, min/max frame size: token values
    o.write(0x10); o.write(0); o.write(0x10); o.write(0)
    (0 until 6).foreach(_ => o.write(0))
    o.write((sampleRate >>> 12) & 0xff)
    o.write((sampleRate >>> 4) & 0xff)
    o.write(((sampleRate & 0x0f) << 4) | (((channels - 1) & 0x07) << 1) |
      (((bitsPerSample - 1) >>> 4) & 0x01))
    o.write((((bitsPerSample - 1) & 0x0f) << 4) |
      ((totalSamples >>> 32) & 0x0f).toInt)
    o.write(((totalSamples >>> 24) & 0xff).toInt)
    o.write(((totalSamples >>> 16) & 0xff).toInt)
    o.write(((totalSamples >>> 8) & 0xff).toInt)
    o.write((totalSamples & 0xff).toInt)
    (0 until 16).foreach(_ => o.write(0)) // MD5 of raw samples: token
    if (withTags) {
      // VORBIS_COMMENT (type 4, last) — little-endian framing
      val body = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        body.write(v & 0xff); body.write((v >>> 8) & 0xff)
        body.write((v >>> 16) & 0xff); body.write((v >>> 24) & 0xff)
      }
      val vb = vendor.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      le32(vb.length); body.write(vb, 0, vb.length)
      le32(tags.size)
      tags.foreach { case (k, v) =>
        val cb = s"$k=$v".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        le32(cb.length); body.write(cb, 0, cb.length)
      }
      val bb = body.toByteArray
      o.write(0x84) // last block, type 4
      o.write((bb.length >>> 16) & 0xff); o.write((bb.length >>> 8) & 0xff)
      o.write(bb.length & 0xff)
      o.write(bb, 0, bb.length)
    }
    o.toByteArray
  }
}
