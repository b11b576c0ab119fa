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
/** Child-JVM probe for the resolution failure modes: runs the REAL
  * production path (RealDecoder → NativeCodec.fromEnv → System.load)
  * in a process whose GRAFT_NATIVE_LIB the spec controls. Prints
  * DECODED:... on success, THREW:<class> + exit 3 on any failure — the
  * spec asserts which one happens under which flag.
  */
object NativeSeamProbe {
  def main(args: Array[String]): Unit = {
    val o = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    o.write("RIFF".getBytes); le32(36 + 6)
    o.write("WAVE".getBytes); o.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    o.write("data".getBytes); le32(6)
    Seq(100, -100, 7).foreach(le16)
    val wav = o.toByteArray
    try {
      val f = graft.multimodal.Multimodal.RealDecoder.features(wav,
        graft.multimodal.Multimodal.MediaMeta("wav", 0, 0, wav.length.toLong), 3)
      println("DECODED:" + f.toSeq.mkString(","))
    } catch {
      case e: Throwable =>
        println("THREW:" + e.getClass.getName)
        sys.exit(3)
    }
  }
}

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

  /** RIFF/WAVE with a WAVE_FORMAT_EXTENSIBLE (0xFFFE) fmt chunk whose
    * subformat GUID is the given 16 bytes (PCM =
    * 00000001-0000-0010-8000-00AA00389B71 in on-disk order).
    */
  private def wavExt(samples: Seq[Int], guid: Array[Int]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    o.write("RIFF".getBytes); le32(60 + samples.length * 2)
    o.write("WAVE".getBytes)
    o.write("fmt ".getBytes); le32(40)
    le16(0xFFFE); le16(1)     // extensible, mono
    le32(8000); le32(16000)   // sample rate, byte rate
    le16(2); le16(16)         // block align, container bits
    le16(22); le16(16)        // cbSize, valid bits
    le32(0x4)                 // channel mask: FRONT_CENTER
    guid.foreach(o.write)
    o.write("data".getBytes); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xffff))
    o.toByteArray
  }

  private val PcmGuid = Array(0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
    0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)

  test("JNI seam: extensible (0xFFFE) PCM16 WAV decodes identically on both sides") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    // the env-dependent divergence from advice r14: AudioSystem
    // normalizes WAVE_FORMAT_EXTENSIBLE PCM16, so the native walk must
    // accept the same payloads — a payload must never decode on one
    // host and reject on another because the flag is set there
    val ext = wavExt(Seq(16384, -16384, 32767, -32768, 7), PcmGuid)
    assert(h.decodeWavPcm16(ext).toSeq ==
      Seq[Short](16384, -16384, 32767, -32768, 7))
    import graft.multimodal.Multimodal
    val meta = Multimodal.MediaMeta("wav", 0, 0, ext.length.toLong)
    val jvm = Multimodal.RealDecoder.features(ext, meta, 3)
    Multimodal.RealDecoder.handleOverride = Some(h)
    try assert(Multimodal.RealDecoder.features(ext, meta, 3).toSeq == jvm.toSeq)
    finally Multimodal.RealDecoder.handleOverride = None
    // a non-PCM subformat (IEEE float GUID) rejects on BOTH sides
    val float = wavExt(Seq(1, 2), PcmGuid.updated(0, 0x03))
    intercept[IllegalArgumentException](h.decodeWavPcm16(float))
    intercept[Exception](Multimodal.RealDecoder.features(float, meta, 3))
  }

  test("JNI seam: native FLAC decode is bit-identical to the JVM twin") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    import graft.multimodal.Flac
    val rnd = new scala.util.Random(19)
    val mono = Array.fill(40)(rnd.nextInt(65536) - 32768)
    for (mode <- Seq("constant", "verbatim", "fixed0", "fixed1", "fixed2",
        "fixed3", "fixed4", "lpc1")) {
      val src = if (mode == "constant") Array.fill(40)(-777) else mono
      val enc = Flac.buildFixture(Array(src), 16, mode)
      assert(h.decodeFlacPcm16(enc).toSeq == Flac.decode(enc).toSeq, mode)
    }
    val l = Array.fill(48)(rnd.nextInt(65536) - 32768)
    val r = Array.fill(48)(rnd.nextInt(65536) - 32768)
    for (st <- Seq("indep", "leftside", "rightside", "midside")) {
      val enc = Flac.buildFixture(Array(l, r), 16, "fixed2", st)
      assert(h.decodeFlacPcm16(enc).toSeq == Flac.decode(enc).toSeq, st)
    }
    // malformation parity: the SAME corrupt streams throw on BOTH sides
    val good = Flac.buildFixture(Array(mono), 16, "fixed2")
    val badCrc = good.clone(); badCrc(49) = (badCrc(49) ^ 0x01).toByte
    val badTotal = good.clone(); badTotal(25) = (badTotal(25) ^ 0x01).toByte
    val badType = good.clone(); badType(50) = 0x04.toByte
    for (bad <- Seq(badCrc, badTotal, badType,
        java.util.Arrays.copyOf(good, good.length - 4),
        Array[Byte](1, 2, 3, 4))) {
      intercept[IllegalArgumentException](Flac.decode(bad))
      intercept[IllegalArgumentException](h.decodeFlacPcm16(bad))
    }
    intercept[NullPointerException](h.decodeFlacPcm16(null))
    // RealDecoder's flac arm routes natively when the seam is enabled
    import graft.multimodal.Multimodal
    val meta = Multimodal.MediaMeta("flac", 0, 0, good.length.toLong)
    val jvm = Multimodal.RealDecoder.features(good, meta, 3)
    Multimodal.RealDecoder.handleOverride = Some(h)
    try {
      assert(Multimodal.RealDecoder.features(good, meta, 3).toSeq == jvm.toSeq)
      intercept[IllegalArgumentException](
        Multimodal.RealDecoder.features(badCrc, meta, 3))
    } finally Multimodal.RealDecoder.handleOverride = None
  }

  test("JNI seam: native WebP VP8L decode is bit-identical to the JVM twin") {
    assume(lib.isDefined,
      s"no ${NativeCodec.LibEnv} and no local C toolchain — seam untestable here")
    val h = NativeCodec.load(lib.get)
    import graft.multimodal.Webp
    val rnd = new scala.util.Random(23)
    def px(n: Int) = Array.fill(n)(
      (0xff << 24) | (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) |
        rnd.nextInt(256))
    def check(pixels: Array[Int], w: Int, hh: Int, mode: String): Unit = {
      val enc = Webp.buildFixture(pixels, w, hh, mode)
      val (dw, dh, jvm) = Webp.decode(enc)
      val nat = h.decodeWebpArgb(enc)
      assert(nat(0) == dw && nat(1) == dh, s"$mode dims")
      assert(nat.drop(2).toSeq == jvm.toSeq, s"$mode pixels")
      assert(jvm.toSeq == pixels.toSeq, s"$mode roundtrip")
    }
    check(px(35), 7, 5, "literal")
    check(px(24) ++ px(0), 6, 4, "subgreen")
    check(px(12) ++ px(12), 6, 4, "cache")
    val half = px(10)
    check(half ++ half, 5, 4, "lz77")
    check(Array.fill(12)(0xff314159), 4, 3, "lz77map")
    (0 to 13).foreach(m => check(px(48), 8, 6, s"predictor$m"))
    check(px(24 * 18), 24, 18, "predictormulti")
    check(px(36), 9, 4, "colortx")
    check(px(60), 10, 6, "meta")
    check(Array.tabulate(20)(i => if (i % 2 == 0) 0xff112233 else 0xff445566),
      5, 4, "palette")
    check(Array.tabulate(34)(i => 0xff000000 | (i % 17) * 0x0f0f0f),
      17, 2, "palette")
    // malformation parity: the SAME corrupt streams throw on BOTH sides
    val good = Webp.buildFixture(px(20), 5, 4, "literal")
    val badSig = good.clone(); badSig(20) = 0x00 // VP8L signature byte
    val badVer = good.clone()
    // version bits are bits 29..31 after the signature: flip one
    badVer(24) = (badVer(24) ^ 0x40).toByte
    for (bad <- Seq(badSig, badVer,
        java.util.Arrays.copyOf(good, good.length - 3),
        Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'E', 'B', 'P'))) {
      intercept[IllegalArgumentException](Webp.decode(bad))
      intercept[IllegalArgumentException](h.decodeWebpArgb(bad))
    }
    intercept[NullPointerException](h.decodeWebpArgb(null))
    // RealDecoder's webp arm routes natively when the seam is enabled
    import graft.multimodal.Multimodal
    val meta = Multimodal.MediaMeta("webp", 0, 0, good.length.toLong)
    val jvmF = Multimodal.RealDecoder.features(good, meta, 3)
    Multimodal.RealDecoder.handleOverride = Some(h)
    try {
      assert(Multimodal.RealDecoder.features(good, meta, 3).toSeq == jvmF.toSeq)
      intercept[IllegalArgumentException](
        Multimodal.RealDecoder.features(badSig, meta, 3))
    } finally Multimodal.RealDecoder.handleOverride = None
  }

  test("JNI seam: a bad GRAFT_NATIVE_LIB fails LOUDLY — never a silent fallback") {
    // System.load is process-global and this JVM may already hold the
    // good library, so the resolution failure modes probe in a CHILD
    // JVM running the production path (NativeSeamProbe → RealDecoder →
    // NativeCodec.fromEnv). Three pins: garbage .so (load-time
    // UnsatisfiedLinkError), valid .so missing the symbols (call-time
    // UnsatisfiedLinkError), and no flag at all (clean JVM fallback) —
    // proving the fallback happens ONLY when the flag is absent, by
    // design rather than by a swallowed error.
    val cp = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
      .map(new java.io.File(_).getAbsolutePath).mkString(":") +
      ":/opt/spark/jars/*"
    def probe(envLib: Option[String]): (Int, String) = {
      val out = new StringBuilder
      val base = Seq("java", "-cp", cp, "graft.NativeSeamProbe")
      val pb = envLib match {
        case Some(p) => Process(base, None, NativeCodec.LibEnv -> p)
        case None => Process(base)
      }
      val rc = pb.!(ProcessLogger(s => out.append(s).append('\n'), _ => ()))
      (rc, out.toString)
    }
    val (okRc, okOut) = probe(None)
    assert(okRc == 0 && okOut.contains("DECODED:"), s"$okRc $okOut")
    // garbage bytes at the flagged path: load-time failure, loud
    val garbage = Files.createTempDirectory("graftbadso")
      .resolve("libgarbage.so")
    Files.write(garbage, Array[Byte](1, 2, 3, 4, 5))
    val (gRc, gOut) = probe(Some(garbage.toAbsolutePath.toString))
    assert(gRc != 0 && gOut.contains("THREW:java.lang.UnsatisfiedLinkError"),
      s"$gRc $gOut")
    // a VALID library missing the codec symbols: call-time failure, loud
    val emptyLib = {
      val dir = Files.createTempDirectory("graftemptyso")
      val src = dir.resolve("empty.c")
      Files.write(src, "int graft_unrelated(void) { return 42; }\n".getBytes)
      val out = dir.resolve("libempty.so").toAbsolutePath.toString
      val rc = Seq("gcc", "-shared", "-fPIC", src.toAbsolutePath.toString,
        "-o", out).!(ProcessLogger(_ => ()))
      if (rc == 0) Some(out) else None
    }
    assume(emptyLib.isDefined, "no C toolchain for the missing-symbol probe")
    val (eRc, eOut) = probe(emptyLib)
    assert(eRc != 0 && eOut.contains("THREW:java.lang.UnsatisfiedLinkError"),
      s"$eRc $eOut")
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
