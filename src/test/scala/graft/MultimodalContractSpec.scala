package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow, UncompressedDecoder}
import graft.tsdb.TsdbFixtures.spark

/** The decoder seam's executable contract: for UNCOMPRESSED payloads
  * (24bpp BI_RGB BMP, PCM16 WAV — both parseable with plain byte
  * arithmetic, no codec library) the features are pinned against
  * hand-computed goldens from files the test writes byte-for-byte
  * itself. A production RealDecoder wired to an actual codec must
  * reproduce exactly these numbers on the same inputs.
  */
class MultimodalContractSpec extends AnyFunSuite {

  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: ByteArrayOutputStream, v: Int): Unit = {
    le16(o, v & 0xffff); le16(o, (v >>> 16) & 0xffff)
  }

  /** 24bpp BI_RGB BMP, pixels given top-down as (r,g,b) rows. */
  private def bmp(rows: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = rows.length
    val w = rows.head.length
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val o = new ByteArrayOutputStream()
    o.write('B'); o.write('M')
    le32(o, 54 + rowBytes * h) // file size
    le32(o, 0)                 // reserved
    le32(o, 54)                // pixel-array offset
    le32(o, 40)                // BITMAPINFOHEADER size
    le32(o, w); le32(o, h)
    le16(o, 1); le16(o, 24)    // planes, bpp
    le32(o, 0)                 // BI_RGB
    le32(o, rowBytes * h); le32(o, 2835); le32(o, 2835)
    le32(o, 0); le32(o, 0)
    rows.reverse.foreach { row => // stored bottom-up
      row.foreach { case (r, g, b) => o.write(b); o.write(g); o.write(r) }
      (w * 3 until rowBytes).foreach(_ => o.write(0))
    }
    o.toByteArray
  }

  /** Minimal RIFF/WAVE, PCM16 mono, with the given s16 samples. */
  private def wav(samples: Seq[Int]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes); le32(o, 36 + samples.length * 2)
    o.write("WAVE".getBytes)
    o.write("fmt ".getBytes); le32(o, 16)
    le16(o, 1); le16(o, 1)         // PCM, mono
    le32(o, 8000); le32(o, 16000)  // sample rate, byte rate
    le16(o, 2); le16(o, 16)        // block align, bits
    o.write("data".getBytes); le32(o, samples.length * 2)
    samples.foreach(s => le16(o, s & 0xffff))
    o.toByteArray
  }

  private def meta(fmt: String, bytes: Array[Byte]) =
    MediaMeta(fmt, 0, 0, bytes.length.toLong)

  test("BMP golden: per-pixel luminance lands in the right buckets") {
    // top row: red, green; bottom row: blue, white
    val img = bmp(Seq(
      Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (255, 255, 255))))
    val third = 255.0f / (3.0f * 255.0f)
    val f4 = UncompressedDecoder.features(img, meta("bmp", img), 4)
    assert(f4.length == 4)
    // pixel index y*w+x: (red, green, blue, white) luminances
    val expect = Array(third, third, third, 1.0f)
    f4.zip(expect).zipWithIndex.foreach { case ((a, e), i) =>
      assert(math.abs(a - e) < 1e-6, s"bucket $i: $a vs $e")
    }
    // folding: dim=2 sums pixels 0+2 and 1+3
    val f2 = UncompressedDecoder.features(img, meta("bmp", img), 2)
    assert(math.abs(f2(0) - 2 * third) < 1e-6)
    assert(math.abs(f2(1) - (third + 1.0f)) < 1e-6)
  }

  test("top-down BMP (negative height) yields identical features") {
    val px = Seq(Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (255, 255, 255)))
    val bottomUp = bmp(px)
    // same image, negative biHeight, rows stored top-down
    val topDown = {
      val o = new ByteArrayOutputStream()
      val rowBytes = 8
      o.write('B'); o.write('M')
      le32(o, 54 + rowBytes * 2); le32(o, 0); le32(o, 54)
      le32(o, 40); le32(o, 2); le32(o, -2) // negative height
      le16(o, 1); le16(o, 24); le32(o, 0)
      le32(o, rowBytes * 2); le32(o, 2835); le32(o, 2835)
      le32(o, 0); le32(o, 0)
      px.foreach { row => // stored in TOP-DOWN order
        row.foreach { case (r, g, b) => o.write(b); o.write(g); o.write(r) }
        (6 until rowBytes).foreach(_ => o.write(0))
      }
      o.toByteArray
    }
    val a = UncompressedDecoder.features(bottomUp, meta("bmp", bottomUp), 4)
    val b = UncompressedDecoder.features(topDown, meta("bmp", topDown), 4)
    assert(a.toSeq == b.toSeq)
  }

  test("corrupt WAV chunk sizes fail loudly instead of spinning") {
    // a chunk whose size field is negative (F8 FF FF FF) previously
    // made the skip a no-op — an infinite loop inside an executor
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes); le32(o, 20); o.write("WAVE".getBytes)
    o.write("junk".getBytes); le32(o, -8)
    val bad = o.toByteArray
    val e = intercept[IllegalArgumentException] {
      UncompressedDecoder.features(bad, meta("wav", bad), 2)
    }
    assert(e.getMessage.contains("corrupt"), e.getMessage)
    // truncated data chunk: declared size exceeds the buffer
    val t = new ByteArrayOutputStream()
    t.write("RIFF".getBytes); le32(t, 20); t.write("WAVE".getBytes)
    t.write("data".getBytes); le32(t, 100); le16(t, 1)
    val trunc = t.toByteArray
    val e2 = intercept[IllegalArgumentException] {
      UncompressedDecoder.features(trunc, meta("wav", trunc), 2)
    }
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("corrupt"))
  }

  test("WAV golden: PCM16 samples normalized and folded") {
    val audio = wav(Seq(16384, -16384, 32767, -32768))
    val f2 = UncompressedDecoder.features(audio, meta("wav", audio), 2)
    assert(math.abs(f2(0) - (0.5f + 32767.0f / 32768.0f)) < 1e-6)
    assert(math.abs(f2(1) - (-0.5f + -1.0f)) < 1e-6)
  }

  test("the contract runs through the distributed seam end-to-end") {
    import spark.implicits._
    val img = bmp(Seq(Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (255, 255, 255))))
    val audio = wav(Seq(16384, -16384, 32767, -32768))
    val media = Seq(
      MediaRow(1L, img, meta("bmp", img)),
      MediaRow(2L, audio, meta("wav", audio))).toDS().repartition(2)
    val out = Multimodal.extractFeatures(media, dim = 2, UncompressedDecoder)
      .collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L))
    val direct1 = UncompressedDecoder.features(img, meta("bmp", img), 2)
    val direct2 = UncompressedDecoder.features(audio, meta("wav", audio), 2)
    assert(out(0).features.toSeq == direct1.toSeq)
    assert(out(1).features.toSeq == direct2.toSeq)
  }

  test("unsupported format points at the RealDecoder seam") {
    val e = intercept[IllegalArgumentException] {
      UncompressedDecoder.features(Array[Byte](1, 2), meta("jpeg", Array(1, 2)), 2)
    }
    assert(e.getMessage.contains("RealDecoder"))
  }

  // ---- RealDecoder: the JDK-codec production decoder must satisfy ----
  // ---- the contract BIT-FOR-BIT on the uncompressed goldens       ----

  test("RealDecoder reproduces the BMP goldens bit-for-bit") {
    val img = bmp(Seq(Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (255, 255, 255))))
    for (dim <- Seq(2, 4, 7)) {
      val contract = UncompressedDecoder.features(img, meta("bmp", img), dim)
      val real = Multimodal.RealDecoder.features(img, meta("bmp", img), dim)
      assert(real.toSeq == contract.toSeq, s"dim=$dim") // exact, not approx
    }
  }

  test("RealDecoder reproduces the WAV golden bit-for-bit") {
    val audio = wav(Seq(16384, -16384, 32767, -32768, 1, -1))
    for (dim <- Seq(2, 4)) {
      val contract = UncompressedDecoder.features(audio, meta("wav", audio), dim)
      val real = Multimodal.RealDecoder.features(audio, meta("wav", audio), dim)
      assert(real.toSeq == contract.toSeq, s"dim=$dim")
    }
  }

  test("RealDecoder: PNG of the same pixels matches the BMP features") {
    // lossless round trip: encode the golden image's pixel content as
    // PNG with ImageIO and decode through the seam — features must
    // equal the BMP-derived contract goldens exactly
    val px = Seq(Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (255, 255, 255)))
    val bi = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) {
      val (r, g, b) = px(y)(x)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val o = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", o))
    val png = o.toByteArray
    val bmpBytes = bmp(px)
    val contract = UncompressedDecoder.features(bmpBytes, meta("bmp", bmpBytes), 3)
    val real = Multimodal.RealDecoder.features(png, meta("png", png), 3)
    assert(real.toSeq == contract.toSeq)
  }

  test("RealDecoder runs through the distributed seam") {
    import spark.implicits._
    val img = bmp(Seq(Seq((10, 20, 30), (40, 50, 60))))
    val media = Seq(MediaRow(1L, img, meta("bmp", img))).toDS()
    val out = Multimodal.extractFeatures(media, dim = 2, Multimodal.RealDecoder)
      .collect()
    assert(out.head.features.toSeq ==
      UncompressedDecoder.features(img, meta("bmp", img), 2).toSeq)
  }

  // ---- QOI: the seam's first real NON-JDK codec (public spec, a  ----
  // ---- genuinely compressed format) under the same contract       ----

  /** Hand-assembled QOI stream: header + raw op bytes + end marker. */
  private def qoi(w: Int, h: Int, ops: Seq[Int]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write('q'); o.write('o'); o.write('i'); o.write('f')
    def be32(v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    be32(w); be32(h)
    o.write(3); o.write(0) // channels, colorspace
    ops.foreach(b => o.write(b & 0xff))
    (0 until 7).foreach(_ => o.write(0)); o.write(1) // end marker
    o.toByteArray
  }

  test("QOI: every op decodes; features equal the BMP contract bit-for-bit") {
    // 2x4 image exercising ALL SIX ops:
    //   px0 RGB(10,20,30)            px1 DIFF +1/+1/+1 -> (11,21,31)
    //   px2-3 RUN(2) -> (11,21,31)   px4 LUMA dg=+8,dr-dg=+2,db-dg=-2 -> (21,29,37)
    //   px5 INDEX[hash(10,20,30,255) = 9] -> (10,20,30)
    //   px6 RGBA(40,50,60,128)       px7 RGB(70,80,90)
    val ops = Seq(
      0xFE, 10, 20, 30, //      QOI_OP_RGB
      0x7F, //                  QOI_OP_DIFF dr=+1 dg=+1 db=+1
      0xC1, //                  QOI_OP_RUN length 2
      0xA8, 0xA6, //            QOI_OP_LUMA dg=+8, (dr-dg)+8=10, (db-dg)+8=6
      0x09, //                  QOI_OP_INDEX slot 9
      0xFF, 40, 50, 60, 128, // QOI_OP_RGBA (alpha feeds the hash, not the fold)
      0xFE, 70, 80, 90)
    val img = qoi(2, 4, ops)
    val (w, h, px) = graft.multimodal.Qoi.decode(img)
    assert((w, h) == (2, 4))
    def rgb(r: Int, g: Int, b: Int) = (r << 16) | (g << 8) | b
    assert(px.toSeq == Seq(rgb(10, 20, 30), rgb(11, 21, 31), rgb(11, 21, 31),
      rgb(11, 21, 31), rgb(21, 29, 37), rgb(10, 20, 30), rgb(40, 50, 60),
      rgb(70, 80, 90)))
    // THE seam contract: a lossless non-JDK codec over the same pixel
    // content must reproduce the uncompressed-BMP features EXACTLY
    val same = bmp(Seq(
      Seq((10, 20, 30), (11, 21, 31)),
      Seq((11, 21, 31), (11, 21, 31)),
      Seq((21, 29, 37), (10, 20, 30)),
      Seq((40, 50, 60), (70, 80, 90))))
    for (dim <- Seq(2, 4, 7)) {
      val contract = UncompressedDecoder.features(same, meta("bmp", same), dim)
      val real = Multimodal.RealDecoder.features(img, meta("qoi", img), dim)
      assert(real.toSeq == contract.toSeq, s"dim=$dim")
    }
  }

  test("QOI: corrupt streams fail loudly, never spin or over-read") {
    // a clean run fills the remaining pixels exactly
    val good = qoi(2, 4, Seq(0xFE, 10, 20, 30, 0xC0 | 6)) // RGB + RUN 7 = 8 px
    assert(graft.multimodal.Qoi.decode(good)._3.length == 8)
    // run overflowing the pixel count
    intercept[IllegalArgumentException] {
      graft.multimodal.Qoi.decode(qoi(2, 2, Seq(0xFE, 10, 20, 30, 0xC0 | 8)))
    }
    // truncated: too few ops for the advertised pixel count
    intercept[IllegalArgumentException] {
      graft.multimodal.Qoi.decode(qoi(4, 4, Seq(0xFE, 10, 20, 30)))
    }
    // not QOI at all
    intercept[IllegalArgumentException] {
      graft.multimodal.Qoi.decode(Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("RealDecoder fails loudly on undecodable bytes and unknown formats") {
    val junk = Array[Byte](1, 2, 3, 4)
    intercept[Exception] {
      Multimodal.RealDecoder.features(junk, meta("png", junk), 2)
    }
    val e = intercept[IllegalArgumentException] {
      Multimodal.RealDecoder.features(junk, meta("mp4", junk), 2)
    }
    assert(e.getMessage.contains("JNI/FFI"), e.getMessage)
  }

  // ---- MP4 container-metadata walk (graft.multimodal.Mp4) ----

  test("MP4 golden: the box walk reads back every field; fixture digest pinned") {
    import graft.multimodal.Mp4
    val bytes = Mp4.buildFixture("isom", timescale = 90000L,
      durationTicks = 450000L,
      tracks = Seq(("vide", 640, 360), ("soun", 0, 0)))
    // pinned digest: any change to the builder's byte layout (which the
    // mm05 gate depends on) must be a CONSCIOUS change here
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(digest == "39f861f2640768edb019c2e1472b5e4c", digest)
    val m = Mp4.meta(bytes)
    assert(m.brand == "isom")
    assert(m.timescale == 90000L && m.durationTicks == 450000L)
    assert(m.durationSec == 5.0)
    assert(m.tracks == Seq(Mp4.Track("vide", 640, 360), Mp4.Track("soun", 0, 0)))
    // the v1 (64-bit times) layout reads back identically
    val m1 = Mp4.meta(Mp4.buildFixture("mp42", 90000L, 450000L,
      Seq(("vide", 1920, 1080)), v1 = true))
    assert(m1.brand == "mp42" && m1.durationSec == 5.0 &&
      m1.tracks == Seq(Mp4.Track("vide", 1920, 1080)))
    // durations past u32 ticks need v1 and survive exactly
    val big = Mp4.meta(Mp4.buildFixture("isom", 1000L, 1L << 40,
      Seq(("soun", 0, 0)), v1 = true))
    assert(big.durationTicks == (1L << 40))
  }

  test("MP4: corrupt streams fail loudly, never spin or over-read") {
    import graft.multimodal.Mp4
    val good = Mp4.buildFixture("isom", 1000L, 5000L, Seq(("vide", 64, 36)))
    // truncation anywhere inside moov: loud, names the malformation
    for (cut <- Seq(4, 12, good.length / 2, good.length - 6)) {
      val e = intercept[IllegalArgumentException] {
        Mp4.meta(java.util.Arrays.copyOf(good, cut))
      }
      assert(e.getMessage.matches(".*(truncated|overruns|no moov).*"),
        s"cut=$cut: ${e.getMessage}")
    }
    // a box whose declared size overruns its scope
    val overrun = good.clone()
    overrun(0) = 0x7f.toByte // ftyp size becomes enormous
    assert(intercept[IllegalArgumentException](Mp4.meta(overrun))
      .getMessage.contains("overruns"))
    // a size smaller than its own header
    val tiny = good.clone()
    tiny(0) = 0; tiny(1) = 0; tiny(2) = 0; tiny(3) = 4
    assert(intercept[IllegalArgumentException](Mp4.meta(tiny))
      .getMessage.contains("smaller than its header"))
    // no moov at all (mdat-only fragment)
    val noMoov = Array[Byte](0, 0, 0, 12, 'm', 'd', 'a', 't', 1, 2, 3, 4)
    assert(intercept[IllegalArgumentException](Mp4.meta(noMoov))
      .getMessage.contains("no moov"))
    // unknown mvhd version
    val badVer = good.clone()
    val mvhdAt = {
      var i = 0
      while (!(good(i + 4) == 'm' && good(i + 5) == 'v' &&
        good(i + 6) == 'h' && good(i + 7) == 'd')) i += 1
      i + 8
    }
    badVer(mvhdAt) = 3
    assert(intercept[IllegalArgumentException](Mp4.meta(badVer))
      .getMessage.contains("unknown mvhd version"))
  }

  // ---- WebP / FLAC container walks (graft.multimodal.Containers) ----

  test("MP4 sample tables: stsz/stts/stss walk back; spec rules pinned") {
    import graft.multimodal.Mp4
    val sizes = Seq(500L, 1200L, 300L, 900L, 700L, 400L, 1100L)
    val fix = Mp4.buildFixture("isom", 30000, 7 * 1001, Seq(("vide", 640, 360)),
      sampleSizes = Seq(sizes), sampleDelta = 1001, syncEvery = 3)
    val st = Mp4.sampleStats(fix) match { case s :: Nil => s }
    assert(st.handler == "vide" && st.mediaTimescale == 30000)
    assert(st.nSamples == 7 && st.totalBytes == sizes.sum)
    assert(st.minSize == 300 && st.maxSize == 1200)
    assert(st.durationTicks == 7 * 1001)
    assert(st.nSync == 3) // samples 1, 4, 7
    // absent stss → EVERY sample is sync (the spec's rule)
    val noSync = Mp4.buildFixture("isom", 30000, 7 * 1001,
      Seq(("vide", 640, 360)), sampleSizes = Seq(sizes), sampleDelta = 1001)
    assert(Mp4.sampleStats(noSync).head.nSync == 7)
    // a track without sample tables contributes nothing; the old
    // metadata walk is untouched by the new boxes
    val plain = Mp4.buildFixture("isom", 30000, 99, Seq(("soun", 0, 0)))
    assert(Mp4.sampleStats(plain).isEmpty)
    assert(Mp4.meta(fix).tracks.head.handler == "vide")
    // stts/stsz sample-count disagreement is loud: patch stts's run
    // count (stts payload: v0(4) + entry_count(4) + [count, delta])
    def patchBox(b: Array[Byte], tpe: String, off: Int, v: Int): Array[Byte] = {
      val out = b.clone()
      val i = (0 until b.length - 4).find(i =>
        new String(b, i, 4, "ISO-8859-1") == tpe).get
      out(i + 4 + off + 3) = (v & 0xff).toByte
      out
    }
    val badCount = patchBox(fix, "stts", 8, 6) // run of 6 vs stsz's 7
    assert(intercept[IllegalArgumentException](Mp4.sampleStats(badCount))
      .getMessage.contains("disagrees"))
    // non-zero table versions are out of scope, loudly
    val bv = fix.clone()
    val szAt = (0 until fix.length - 4).find(i =>
      new String(fix, i, 4, "ISO-8859-1") == "stsz").get
    bv(szAt + 4) = 1 // version byte
    assert(intercept[IllegalArgumentException](Mp4.sampleStats(bv))
      .getMessage.contains("version-0"))
    // quarantine twin survives the malformation instead of throwing
    assert(Mp4.trySampleStats(badCount).isLeft)
    assert(Mp4.trySampleStats(fix).isRight)
  }

  test("MP4 keyframe ranges: stsc/stco chunk math lands on the sample bytes") {
    import graft.multimodal.Mp4
    // 5 samples, 2 per chunk → chunks (1,2)(3,4)(5); syncs 1, 4
    val sizes = Seq(10L, 20L, 30L, 40L, 50L)
    val fix = Mp4.buildFixture("isom", 1000, 5 * 40, Seq(("vide", 64, 48)),
      sampleSizes = Seq(sizes), sampleDelta = 40, syncEvery = 3,
      samplesPerChunk = 2, sampleFill = (_, si, j) => (si * 100 + j).toInt)
    val ts = Mp4.syncSamples(fix) match { case t :: Nil => t }
    assert(ts.handler == "vide")
    assert(ts.syncs.map(_.sample) == List(1L, 4L))
    // sample 1 starts chunk 1; sample 4 is the SECOND sample of chunk
    // 2, so its offset is chunk2's base + size(sample 3)
    val s1 = ts.syncs(0)
    val s4 = ts.syncs(1)
    assert(s1.size == 10 && s4.size == 40)
    // the ranges carry the bytes sampleFill wrote: sample si's byte j
    // is (si*100 + j) mod 256
    assert((0 until 10).forall(j => (fix(s1.offset.toInt + j) & 0xff) == j))
    assert((0 until 40).forall(j =>
      (fix(s4.offset.toInt + j) & 0xff) == ((300 + j) & 0xff)))
    // chunk math: sample 4 (idx 3) sits after sample 3 (idx 2) in its
    // chunk — offsets differ by exactly size(sample 3)
    val all = Mp4.buildFixture("isom", 1000, 5 * 40, Seq(("vide", 64, 48)),
      sampleSizes = Seq(sizes), sampleDelta = 40, syncEvery = 1,
      samplesPerChunk = 2, sampleFill = (_, si, j) => (si * 100 + j).toInt)
    val offs = Mp4.syncSamples(all).head.syncs.map(_.offset)
    assert(offs(3) - offs(2) == 30)
    // absent stss: EVERY sample resolves (spec rule carried over)
    val noSync = Mp4.buildFixture("isom", 1000, 5 * 40, Seq(("vide", 64, 48)),
      sampleSizes = Seq(sizes), sampleDelta = 40, samplesPerChunk = 2,
      sampleFill = (_, si, j) => (si * 100 + j).toInt)
    assert(Mp4.syncSamples(noSync).head.syncs.size == 5)
    // a chunked walk without stsc/stco is loud (ranges unresolvable)
    val noChunks = Mp4.buildFixture("isom", 1000, 5 * 40,
      Seq(("vide", 64, 48)), sampleSizes = Seq(sizes), sampleDelta = 40)
    assert(intercept[IllegalArgumentException](Mp4.syncSamples(noChunks))
      .getMessage.contains("stsc"))
    // an offset table pointing past the file is loud, never a wild read
    val bad = fix.clone()
    val coAt = (0 until fix.length - 4).find(i =>
      new String(fix, i, 4, "ISO-8859-1") == "stco").get
    bad(coAt + 12) = 0x7f // first chunk offset high byte → far past EOF
    assert(intercept[IllegalArgumentException](Mp4.syncSamples(bad))
      .getMessage.contains("overruns the payload"))
    assert(Mp4.trySyncSamples(bad).isLeft)
    assert(Mp4.trySyncSamples(fix).isRight)
  }

  test("WebP golden: all three variant encodings read back; digests pinned") {
    import graft.multimodal.Containers
    def md5(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    val lossy = Containers.buildWebPFixture("lossy", 640, 360)
    assert(md5(lossy) == "9d3872917618da0f2150a76ff01d81d0", md5(lossy))
    assert(Containers.webpMeta(lossy) ==
      Containers.WebPMeta("lossy", 640, 360, false, false))
    // VP8L packs 14-bit fields across byte boundaries — pick dims that
    // exercise the cross-byte bits (w-1=16383 uses all 14)
    val lossless = Containers.buildWebPFixture("lossless", 16384, 300,
      alpha = true)
    assert(Containers.webpMeta(lossless) ==
      Containers.WebPMeta("lossless", 16384, 300, true, false))
    val ext = Containers.buildWebPFixture("extended", 70000, 40000,
      alpha = false, animation = true)
    assert(Containers.webpMeta(ext) ==
      Containers.WebPMeta("extended", 70000, 40000, false, true))
  }

  test("WebP: corrupt payloads fail loudly") {
    import graft.multimodal.Containers
    val good = Containers.buildWebPFixture("lossy", 64, 36)
    assert(intercept[IllegalArgumentException](
      Containers.webpMeta("RIFFxxxxWAVE    ".getBytes)).getMessage
      .contains("magic missing"))
    // declared RIFF size overrunning the buffer
    val overrun = good.clone(); overrun(4) = 0x7f.toByte
    assert(intercept[IllegalArgumentException](
      Containers.webpMeta(overrun)).getMessage.contains("overruns"))
    // VP8 start code damaged
    val badCode = good.clone(); badCode(23) = 0
    assert(intercept[IllegalArgumentException](
      Containers.webpMeta(badCode)).getMessage.contains("start code"))
    // header-only RIFF with no variant chunk
    val empty = java.util.Arrays.copyOf(good, 12)
    empty(4) = 4; empty(5) = 0; empty(6) = 0; empty(7) = 0
    assert(intercept[IllegalArgumentException](
      Containers.webpMeta(empty)).getMessage.contains("no image bitstream"))
  }

  test("FLAC golden: STREAMINFO bitfields read back; digest pinned") {
    import graft.multimodal.Containers
    val f = Containers.buildFlacFixture(44100, 2, 16, 441000L)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(f).map("%02x".format(_)).mkString
    assert(digest == "7a4facf6a646000085c44f4184c0c062", digest)
    assert(Containers.flacMeta(f) ==
      Containers.FlacMeta(44100, 2, 16, 441000L, 10.0))
    // the 1-bit bps straddle (bps-1 = 23 crosses the byte boundary)
    // and a 36-bit sample count past u32
    val hi = Containers.flacMeta(
      Containers.buildFlacFixture(192000, 8, 24, 1L << 35))
    assert(hi == Containers.FlacMeta(192000, 8, 24, 1L << 35,
      (1L << 35).toDouble / 192000))
  }

  test("FLAC: corrupt payloads fail loudly") {
    import graft.multimodal.Containers
    assert(intercept[IllegalArgumentException](
      Containers.flacMeta("OggS0000".getBytes)).getMessage
      .contains("magic missing"))
    val good = Containers.buildFlacFixture(8000, 1, 16, 800L)
    // first block not STREAMINFO
    val wrongType = good.clone(); wrongType(4) = 0x84.toByte
    assert(intercept[IllegalArgumentException](
      Containers.flacMeta(wrongType)).getMessage.contains("not STREAMINFO"))
    // truncated body
    assert(intercept[IllegalArgumentException](
      Containers.flacMeta(java.util.Arrays.copyOf(good, 20))).getMessage
      .contains("truncated"))
    // zero sample rate (reserved/invalid in the spec)
    val zeroRate = Containers.buildFlacFixture(8000, 1, 16, 0L)
    zeroRate(18) = 0; zeroRate(19) = 0; zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(intercept[IllegalArgumentException](
      Containers.flacMeta(zeroRate)).getMessage.contains("sample rate 0"))
  }

  test("FLAC tags: VORBIS_COMMENT walks back; vorbis rules pinned") {
    import graft.multimodal.Containers
    val fx = Containers.buildFlacFixture(44100, 2, 16, 1000,
      vendor = "graft-test",
      tags = Seq("Title" -> "Ode", "ARTIST" -> "someone",
        "artist" -> "someone else", "LANGUAGE" -> "en"))
    val (vendor, tags) = Containers.flacTags(fx)
    assert(vendor == "graft-test")
    // keys uppercase (case-insensitive per vorbis); duplicates are
    // multi-valued tags and ALL survive in file order
    assert(tags == List("TITLE" -> "Ode", "ARTIST" -> "someone",
      "ARTIST" -> "someone else", "LANGUAGE" -> "en"))
    // values keep their bytes — '=' inside a VALUE is legal
    val eq = Containers.buildFlacFixture(8000, 1, 16, 0,
      vendor = "v", tags = Seq("K" -> "a=b"))
    assert(Containers.flacTags(eq)._2 == List("K" -> "a=b"))
    // the STREAMINFO walk is untouched by the extra block
    val m = Containers.flacMeta(fx)
    assert(m.sampleRate == 44100 && m.channels == 2 && m.totalSamples == 1000)
    // a FLAC without the block yields empty tags, not an error
    assert(Containers.flacTags(
      Containers.buildFlacFixture(8000, 1, 16, 0)) == (("", Nil)))
    // a comment-string length overrunning the block is loud
    val bad = fx.clone()
    // vendor length lives right after the 4-byte block header at the
    // VORBIS_COMMENT block (4 magic + 38 STREAMINFO): bump it huge
    bad(4 + 38 + 4 + 3) = 0x7f
    assert(intercept[IllegalArgumentException](Containers.flacTags(bad))
      .getMessage.contains("overruns the block"))
    assert(Containers.tryFlacTags(bad).isLeft)
    assert(Containers.tryFlacTags(fx).isRight)
    // an entry without KEY= is loud
    val noEq = Containers.buildFlacFixture(8000, 1, 16, 0,
      vendor = "v", tags = Seq("JUSTAKEY" -> ""))
    assert(Containers.flacTags(noEq)._2 == List("JUSTAKEY" -> ""))
  }

  test("FLAC decode: every subframe type and channel assignment round-trips") {
    import graft.multimodal.Flac
    val rnd = new scala.util.Random(42)
    val mono = Array.fill(40)(rnd.nextInt(65536) - 32768)
    for (mode <- Seq("verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
        "fixed4", "lpc1")) {
      val enc = Flac.buildFixture(Array(mono), 16, mode)
      assert(Flac.decode(enc).toSeq == mono.map(_.toShort).toSeq, mode)
    }
    val const = Array.fill(32)(1234)
    assert(Flac.decode(Flac.buildFixture(Array(const), 16, "constant"))
      .toSeq == const.map(_.toShort).toSeq)
    // stereo: all four channel assignments reconstruct the SAME
    // interleaved PCM — decorrelation is an encoding choice, not a
    // semantic one
    val l = Array.fill(48)(rnd.nextInt(65536) - 32768)
    val r = Array.fill(48)(rnd.nextInt(65536) - 32768)
    val want = (0 until 48).flatMap(i => Seq(l(i).toShort, r(i).toShort))
    for (st <- Seq("indep", "leftside", "rightside", "midside")) {
      assert(Flac.decode(Flac.buildFixture(Array(l, r), 16, "verbatim", st))
        .toSeq == want, st)
      assert(Flac.decode(Flac.buildFixture(Array(l, r), 16, "fixed2", st))
        .toSeq == want, st)
    }
    // feature parity with a WAV of the same PCM: the two audio arms
    // must agree bit-for-bit on features — the cross-format half of
    // the codec contract
    import graft.multimodal.Multimodal
    val flacBytes = Flac.buildFixture(Array(mono), 16, "fixed2")
    val wavBytes = {
      val o = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      o.write("RIFF".getBytes); le32(36 + mono.length * 2)
      o.write("WAVE".getBytes); o.write("fmt ".getBytes); le32(16)
      le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
      o.write("data".getBytes); le32(mono.length * 2)
      mono.foreach(le16)
      o.toByteArray
    }
    val fFeat = Multimodal.RealDecoder.features(flacBytes,
      Multimodal.MediaMeta("flac", 0, 0, flacBytes.length.toLong), 5)
    val wFeat = Multimodal.RealDecoder.features(wavBytes,
      Multimodal.MediaMeta("wav", 0, 0, wavBytes.length.toLong), 5)
    assert(fFeat.toSeq == wFeat.toSeq)
  }

  test("FLAC decode: malformed streams fail loudly, STREAMINFO is verified") {
    import graft.multimodal.{Containers, Flac}
    val rnd = new scala.util.Random(7)
    val mono = Array.fill(32)(rnd.nextInt(65536) - 32768)
    val good = Flac.buildFixture(Array(mono), 16, "fixed2")
    assert(Flac.decode(good).length == 32)
    // frame-header CRC-8: first frame starts at 42 (4 magic + 4 block
    // header + 34 STREAMINFO), its CRC byte at 42+7
    val badCrc = good.clone(); badCrc(49) = (badCrc(49) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](Flac.decode(badCrc))
      .getMessage.contains("CRC-8"))
    // truncation mid-frame
    intercept[IllegalArgumentException](
      Flac.decode(java.util.Arrays.copyOf(good, good.length - 4)))
    // STREAMINFO total-sample disagreement (the "verified" half):
    // total's low byte lives at offset 25
    val badTotal = good.clone(); badTotal(25) = (badTotal(25) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](Flac.decode(badTotal))
      .getMessage.contains("STREAMINFO declares"))
    // non-16-bit depth rejects by contract, before any frame walk
    assert(intercept[IllegalArgumentException](Flac.decode(
      Containers.buildFlacFixture(8000, 1, 24, 0L)))
      .getMessage.contains("contract covers 16-bit FLAC"))
    // reserved subframe type: type bits 000010 (2) is reserved —
    // corrupt the first subframe's type field
    val badType = good.clone()
    // subframe starts right after the CRC byte (offset 50): bits are
    // [pad][type:6]... — set the byte to 0b00000100 (type 2, reserved)
    badType(50) = 0x04.toByte
    assert(intercept[IllegalArgumentException](Flac.decode(badType))
      .getMessage.contains("reserved FLAC subframe type"))
  }

  test("WebP decode: every bitstream path round-trips; features equal BMP") {
    import graft.multimodal.Webp
    val rnd = new scala.util.Random(42)
    def pix(n: Int) = Array.fill(n)(
      (0xff << 24) | (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) |
        rnd.nextInt(256))
    def roundtrip(px: Array[Int], w: Int, h: Int, mode: String): Unit = {
      val (dw, dh, dec) = Webp.decode(Webp.buildFixture(px, w, h, mode))
      assert(dw == w && dh == h, s"$mode dims")
      assert(dec.toSeq == px.toSeq, s"$mode pixels")
    }
    roundtrip(pix(35), 7, 5, "literal")
    roundtrip(pix(18), 6, 3, "subgreen")
    val rep = pix(16)
    roundtrip(rep ++ rep, 4, 8, "cache")
    val half = pix(10)
    roundtrip(half ++ half, 5, 4, "lz77")
    roundtrip(Array.fill(12)(0xff102030), 4, 3, "lz77map")
    // all 14 predictor modes — including the Select and the two
    // clamped add/subtract estimators with their exact tie/truncation
    // rules
    (0 to 13).foreach(m => roundtrip(pix(48), 8, 6, s"predictor$m"))
    // multi-block: 4-px blocks whose modes cycle through all 14 —
    // the inverse must switch predictors at every block boundary
    roundtrip(pix(24 * 18), 24, 18, "predictormulti")
    roundtrip(pix(36), 9, 4, "colortx")
    // meta prefix groups: two groups with different green code lengths
    // (9 vs 10 bits) — decode must pick the right tree per 4-px block
    roundtrip(pix(60), 10, 6, "meta")
    roundtrip(pix(45), 9, 5, "meta")
    // palettes at every bundling width: 8, 4, 2 indices per byte and
    // the unbundled > 16-color form
    roundtrip(Array.tabulate(20)(i =>
      if (i % 3 == 0) 0xff112233 else 0xff445566), 5, 4, "palette")
    roundtrip(Array.tabulate(24)(i =>
      0xff000000 | ((i % 4) * 0x204060)), 6, 4, "palette")
    roundtrip(Array.tabulate(24)(i =>
      0xff000000 | ((i % 13) * 0x0a0a0a)), 6, 4, "palette")
    roundtrip(Array.tabulate(34)(i =>
      0xff000000 | ((i % 17) * 0x0f0f0f)), 17, 2, "palette")
    // alpha channel survives decode
    val ap = Array.tabulate(9)(i => ((i * 20 + 10) << 24) | 0x123456)
    roundtrip(ap, 3, 3, "literal")
    // feature parity with a BMP of the same pixels: the lossless image
    // arms must agree bit-for-bit on features — the cross-format half
    // of the codec contract (the QOI-vs-BMP rule, now for WebP)
    import graft.multimodal.Multimodal
    val w = 6; val h = 4
    val px = pix(w * h)
    val rows = (0 until h).map(y => (0 until w).map { x =>
      val v = px(y * w + x)
      (((v >> 16) & 0xff), ((v >> 8) & 0xff), (v & 0xff))
    })
    val webpBytes = Webp.buildFixture(px, w, h, "predictor7")
    val wFeat = Multimodal.RealDecoder.features(webpBytes,
      Multimodal.MediaMeta("webp", 0, 0, webpBytes.length.toLong), 5)
    val bmpBytes = bmp(rows)
    val bFeat = Multimodal.RealDecoder.features(bmpBytes,
      Multimodal.MediaMeta("bmp", 0, 0, bmpBytes.length.toLong), 5)
    assert(wFeat.toSeq == bFeat.toSeq)
  }

  test("WebP animated: frame walk + per-frame VP8L decode; placement rules") {
    import graft.multimodal.Webp
    val rnd = new scala.util.Random(31)
    def pix(n: Int) = Array.fill(n)(0xff000000 | rnd.nextInt(0x1000000))
    val f0 = pix(12) // 4x3 at (0,0)
    val f1 = pix(6)  // 3x2 at (2,4)
    val anim = Webp.buildAnimFixture(10, 8,
      Seq((0, 0, 40, f0, 4, 3), (2, 4, 70, f1, 3, 2)), "subgreen")
    val (cw, ch, frames) = Webp.decodeFrames(anim)
    assert(cw == 10 && ch == 8)
    assert(frames.map(f => (f.x, f.y, f.w, f.h, f.durationMs)) ==
      List((0, 0, 4, 3, 40), (2, 4, 3, 2, 70)))
    assert(frames(0).px.toSeq == f0.toSeq && frames(1).px.toSeq == f1.toSeq)
    // the container meta agrees (variant extended, animation flagged)
    val m = graft.multimodal.Containers.webpMeta(anim)
    assert(m.variant == "extended" && m.animation && m.width == 10)
    // a PLAIN lossless image is not an animation — loud
    val still = Webp.buildFixture(pix(9), 3, 3, "literal")
    assert(intercept[IllegalArgumentException](Webp.decodeFrames(still))
      .getMessage.contains("animation flag"))
    // a frame overrunning the canvas is loud at the walk, before
    // any pixel decode
    intercept[IllegalArgumentException](Webp.buildAnimFixture(4, 4,
      Seq((2, 2, 10, pix(12), 4, 3))))
    // ...and a hand-corrupted declared width triggers the decoder's
    // own canvas check (ANMF width byte: header starts after
    // RIFF(12) + VP8X(18) + ANIM(14) + 'ANMF'+size(8) → +6 is w-1)
    val bad = anim.clone()
    bad(12 + 18 + 14 + 8 + 6) = 0x7f
    assert(intercept[IllegalArgumentException](Webp.decodeFrames(bad))
      .getMessage.contains("overruns the"))
    assert(Webp.tryDecodeFrames(bad).isLeft)
    assert(Webp.tryDecodeFrames(anim).isRight)
  }

  test("WebP decode: malformed streams fail loudly, never spin or over-read") {
    import graft.multimodal.{Containers, Webp}
    val rnd = new scala.util.Random(11)
    val px = Array.fill(20)(0xff000000 | rnd.nextInt(0x1000000))
    val good = Webp.buildFixture(px, 5, 4, "literal")
    assert(Webp.decode(good)._3.toSeq == px.toSeq)
    // VP8L signature byte (offset 20: RIFF hdr 12 + chunk hdr 8)
    val badSig = good.clone(); badSig(20) = 0x00
    intercept[IllegalArgumentException](Webp.decode(badSig))
    // nonzero version bits (bit 30 of the stream: byte 24 bit 6)
    val badVer = good.clone(); badVer(24) = (badVer(24) ^ 0x40).toByte
    assert(intercept[IllegalArgumentException](Webp.decode(badVer))
      .getMessage.contains("version"))
    // truncation anywhere is loud
    (1 to 4).foreach { cut =>
      intercept[IllegalArgumentException](
        Webp.decode(java.util.Arrays.copyOf(good, good.length - cut)))
    }
    // the lossy variant is outside the VP8L contract
    assert(intercept[IllegalArgumentException](
      Webp.decode(Containers.buildWebPFixture("lossy", 4, 4)))
      .getMessage.contains("lossless"))
    // a metadata-only VP8L fixture (header, no image stream) truncates
    intercept[IllegalArgumentException](
      Webp.decode(Containers.buildWebPFixture("lossless", 4, 4)))
    // an LZ77 reference before the image start is loud: hand-build a
    // stream whose first symbol is a back-reference
    val bw = Webp.buildFixture(Array.fill(4)(0xff010203), 2, 2, "lz77map")
    // corrupting the literal's green symbol high bits lands in the
    // length-code region before any pixel exists — any IAE is fine,
    // just never a hang or a wild read
    (21 until bw.length).foreach { i =>
      val c = bw.clone(); c(i) = (c(i) ^ 0x55).toByte
      try Webp.decode(c) catch { case _: IllegalArgumentException => () }
    }
  }

  test("MP4 extraction runs through the distributed seam") {
    import spark.implicits._
    import graft.multimodal.Mp4
    val rows = (1L to 6L).map { id =>
      Multimodal.MediaRow(id,
        Mp4.buildFixture("isom", 1000L, id * 100,
          Seq(("vide", id.toInt * 10, id.toInt * 5), ("soun", 0, 0)),
          v1 = id % 2 == 1),
        Multimodal.MediaMeta("mp4", 0, 0, 0L))
    }
    val out = Mp4.extract(spark.createDataset(rows).repartition(3))
      .collect().sortBy(_.id)
    assert(out.map(_.duration_ticks).toSeq == (1L to 6L).map(_ * 100))
    assert(out.forall(r => r.handlers == "vide,soun" && r.n_tracks == 2))
    assert(out.map(r => (r.video_width, r.video_height)).toSeq ==
      (1 to 6).map(i => (i * 10, i * 5)))
  }

  test("quarantine walks: corrupt payloads survive beside good ones; loud forms still throw") {
    import spark.implicits._
    import graft.multimodal.{Containers, Mp4}
    // one good + one corrupt payload per format through the try forms
    val goodMp4 = Mp4.buildFixture("isom", 1000L, 500L,
      Seq(("vide", 64, 32)), v1 = false)
    assert(Mp4.tryMeta(goodMp4).exists(_.durationTicks == 500L))
    assert(Mp4.tryMeta(goodMp4.take(12)).isLeft)
    val goodWebp = Containers.buildWebPFixture("lossy", 40, 30)
    assert(Containers.tryWebpMeta(goodWebp).exists(m =>
      m.width == 40 && m.height == 30))
    assert(Containers.tryWebpMeta(goodWebp.take(10)).isLeft)
    assert(Containers.tryWebpMeta("RIFFxxxxNOPE".getBytes("ISO-8859-1")).isLeft)
    val goodFlac = Containers.buildFlacFixture(44100, 2, 16, 44100L)
    assert(Containers.tryFlacMeta(goodFlac).exists(_.sampleRate == 44100))
    assert(Containers.tryFlacMeta(goodFlac.take(6)).isLeft)
    // the loud forms keep the fixture discipline — same bytes, thrown
    intercept[IllegalArgumentException](Mp4.meta(goodMp4.take(12)))
    intercept[IllegalArgumentException](Containers.webpMeta(goodWebp.take(10)))
    intercept[IllegalArgumentException](Containers.flacMeta(goodFlac.take(6)))
    // distributed: the corrupt row rides the pass with err set; the
    // clean rows' fields are intact — one truncated upload never
    // aborts the job
    val rows = (1L to 5L).map { id =>
      val full = Mp4.buildFixture("isom", 1000L, id * 100,
        Seq(("vide", id.toInt * 10, id.toInt * 5)), v1 = false)
      Multimodal.MediaRow(id, if (id == 3L) full.take(12) else full,
        Multimodal.MediaMeta("mp4", 0, 0, 0L))
    }
    val q = Mp4.extractQuarantine(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.id)
    assert(q.length == 5)
    assert(q.filter(_.err.isDefined).map(_.id).toSeq == Seq(3L))
    assert(q.filter(_.err.isEmpty).map(_.duration_ticks.get).toSeq ==
      Seq(100L, 200L, 400L, 500L))
  }
}
