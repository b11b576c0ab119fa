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

  test("JNI seam: mm fixture round-trips the C ABI; ownership + checksum contract") {
    val lib = sys.env.get(NativeCodec.LibEnv).orElse(buildLib())
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
}
