package graft

import java.nio.file.Files

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Mp4, NativeCodec}

/** Contract spec for the JNI decode seam (round 13): an mm fixture
  * round-trips through the C ABI and comes back byte-identical as a
  * FRESH JVM-owned array, the input is never mutated, and a scalar
  * computed natively (FNV-1a) agrees bit-for-bit with the Scala twin.
  *
  * Behind the build flag: `GRAFT_NATIVE_LIB` names a prebuilt library;
  * without it, the spec builds one itself when a C toolchain + JNI
  * headers are present (this container has both), and CANCELS — not
  * fails — on machines with neither. The production decode path stays
  * flag-gated the same way (NativeCodec.fromEnv).
  */
class NativeSeamSpec extends AnyFunSuite {

  private def buildLib(): Option[String] = {
    val javaHome = System.getProperty("java.home")
    val src = new java.io.File("src/native/graft_native.c")
    if (!src.isFile) return None
    if (Seq("sh", "-c", "command -v gcc").!(ProcessLogger(_ => ())) != 0)
      return None
    val out = Files.createTempDirectory("graftjni")
      .resolve("libgraftnative.so").toAbsolutePath.toString
    val rc = Seq("gcc", "-shared", "-fPIC", "-O2",
      s"-I$javaHome/include", s"-I$javaHome/include/linux",
      src.getAbsolutePath, "-o", out).!(ProcessLogger(_ => ()))
    if (rc == 0) Some(out) else None
  }

  // one library per JVM: System.load is process-global, so both tests
  // share the same build (load() is idempotent for the same path)
  private lazy val lib: Option[String] =
    sys.env.get(NativeCodec.LibEnv).orElse(buildLib())

  test("JNI seam: mm fixture round-trips the C ABI; ownership + checksum contract") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    // same-path reload is idempotent; a different path refuses
    NativeCodec.load(lib.get)
    intercept[IllegalArgumentException](NativeCodec.load("/tmp/other.so"))

    val fixture = Mp4.buildFixture("isom", 1000L, 777L,
      Seq(("vide", 64, 32), ("soun", 0, 0)), v1 = true)
    val back = h.identity(fixture)
    // byte-identical, but a FRESH array — the JVM owns the output,
    // native holds no alias into our input
    assert(back.toSeq == fixture.toSeq)
    assert(!(back eq fixture))
    // the round-tripped bytes still parse as the same container
    assert(Mp4.meta(back) == Mp4.meta(fixture))
    assert(Mp4.meta(fixture).durationTicks == 777L) // input unmutated
    // scalar contract: native FNV-1a == the Scala reference, on the
    // fixture and on adversarial sizes (empty, 1 byte, high bytes)
    assert(h.fnv1a(fixture) == NativeCodec.fnv1aRef(fixture))
    for (bytes <- Seq(Array.emptyByteArray, Array[Byte](0),
        Array[Byte](-1, -128, 127, 0), Array.fill[Byte](65537)(-57))) {
      assert(h.fnv1a(bytes) == NativeCodec.fnv1aRef(bytes),
        s"fnv1a mismatch at n=${bytes.length}")
      assert(h.identity(bytes).toSeq == bytes.toSeq)
    }
  }

  /** Hand-assembled QOI stream (the MultimodalContractSpec builder). */
  private def qoi(w: Int, h: Int, ops: Seq[Int]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write('q'); o.write('o'); o.write('i'); o.write('f')
    def be32(v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    be32(w); be32(h)
    o.write(3); o.write(0)
    ops.foreach(b => o.write(b & 0xff))
    (0 until 7).foreach(_ => o.write(0)); o.write(1)
    o.toByteArray
  }

  test("JNI seam: native QOI decode is bit-identical to the JVM decoder") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    import graft.multimodal.Qoi
    // the all-six-ops fixture (RGB/DIFF/RUN/LUMA/INDEX/RGBA — the
    // MultimodalContractSpec golden) through BOTH decoders
    val img = qoi(2, 4, Seq(
      0xFE, 10, 20, 30, 0x7F, 0xC1, 0xA8, 0xA6, 0x09,
      0xFF, 40, 50, 60, 128, 0xFE, 70, 80, 90))
    val native = h.decodeQoi(img)
    val (w, jh, px) = Qoi.decode(img)
    assert(native(0) == w && native(1) == jh)
    assert(native.drop(2).toSeq == px.toSeq)
    // run-fill fixture: same parity
    val good = qoi(2, 4, Seq(0xFE, 10, 20, 30, 0xC0 | 6))
    assert(h.decodeQoi(good).drop(2).toSeq == Qoi.decode(good)._3.toSeq)
    // malformation parity: the SAME corrupt streams throw
    // IllegalArgumentException on BOTH sides of the ABI — loudness is
    // part of the seam contract, not a JVM-side nicety
    for (bad <- Seq(
        qoi(2, 2, Seq(0xFE, 10, 20, 30, 0xC0 | 8)), // run overflow
        qoi(4, 4, Seq(0xFE, 10, 20, 30)), //           truncated ops
        Array[Byte](1, 2, 3, 4, 5))) { //              not QOI at all
      intercept[IllegalArgumentException](Qoi.decode(bad))
      intercept[IllegalArgumentException](h.decodeQoi(bad))
    }
    // crafted giant-dimension header (w = h = 0xF0000000 as u32):
    // both sides must reject as malformed — native-side a naive w*h
    // would overflow signed arithmetic and slip the area guard
    val giant = qoi(0xF0000000, 0xF0000000, Seq(0xC0))
    intercept[IllegalArgumentException](Qoi.decode(giant))
    intercept[IllegalArgumentException](h.decodeQoi(giant))
    // null payloads NPE across the ABI, never a SIGSEGV
    intercept[NullPointerException](h.decodeQoi(null))
    intercept[NullPointerException](h.identity(null))
    intercept[NullPointerException](h.fnv1a(null))
  }

  /** Minimal RIFF/WAVE PCM16 mono (the MultimodalContractSpec builder). */
  private def wav(samples: Seq[Int]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    o.write("RIFF".getBytes); le32(36 + samples.length * 2)
    o.write("WAVE".getBytes)
    o.write("fmt ".getBytes); le32(16)
    le16(1); le16(1)          // PCM, mono
    le32(8000); le32(16000)   // sample rate, byte rate
    le16(2); le16(16)         // block align, bits
    o.write("data".getBytes); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xffff))
    o.toByteArray
  }

  test("JNI seam: native WAV-PCM16 samples are bit-identical to the JVM walk") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    val fixture = wav(Seq(16384, -16384, 32767, -32768, 1, -1, 0))
    assert(h.decodeWavPcm16(fixture).toSeq ==
      Seq[Short](16384, -16384, 32767, -32768, 1, -1, 0))
    // feature parity against BOTH JVM decoders on the same payload
    import graft.multimodal.Multimodal
    val meta = Multimodal.MediaMeta("wav", 0, 0, fixture.length.toLong)
    val jvm = Multimodal.RealDecoder.features(fixture, meta, 3)
    val contract = Multimodal.UncompressedDecoder.features(fixture, meta, 3)
    assert(jvm.toSeq == contract.toSeq)
    // malformation parity: non-PCM16 fmt, truncated chunk, not RIFF —
    // loud on BOTH sides of the ABI
    val badFmt = {
      val b = wav(Seq(1, 2)); b(20) = 3; b } // fmt code 3 = IEEE float
    for (bad <- Seq(badFmt, fixture.take(30),
        Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'N', 'O', 'P', 'E'))) {
      intercept[IllegalArgumentException](h.decodeWavPcm16(bad))
    }
    intercept[NullPointerException](h.decodeWavPcm16(null))
  }

  test("JNI seam: RealDecoder routes qoi + wav through the native codec when enabled") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    import graft.multimodal.Multimodal
    val img = qoi(2, 4, Seq(
      0xFE, 10, 20, 30, 0x7F, 0xC1, 0xA8, 0xA6, 0x09,
      0xFF, 40, 50, 60, 128, 0xFE, 70, 80, 90))
    val audio = wav(Seq(16384, -16384, 32767, -32768, 7))
    val qMeta = Multimodal.MediaMeta("qoi", 2, 4, img.length.toLong)
    val wMeta = Multimodal.MediaMeta("wav", 0, 0, audio.length.toLong)
    val jvmQ = Multimodal.RealDecoder.features(img, qMeta, 3)
    val jvmW = Multimodal.RealDecoder.features(audio, wMeta, 3)
    Multimodal.RealDecoder.handleOverride = Some(h)
    try {
      // bit-identical features through the native decode — the wiring
      // the production flag (GRAFT_NATIVE_LIB) enables
      assert(Multimodal.RealDecoder.features(img, qMeta, 3).toSeq ==
        jvmQ.toSeq)
      assert(Multimodal.RealDecoder.features(audio, wMeta, 3).toSeq ==
        jvmW.toSeq)
      // malformation stays loud through the wired path too
      intercept[IllegalArgumentException](Multimodal.RealDecoder.features(
        img.take(16), qMeta, 3))
    } finally Multimodal.RealDecoder.handleOverride = None
  }
}
