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
}
