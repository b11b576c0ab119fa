package graft.multimodal

/** The native half of the decode seam, prototyped (round 13): the
  * container walks (Mp4/Containers/Qoi) stay pure JVM; actual frame/
  * sample DECODE crosses a C ABI. This handle proves that boundary's
  * memory/ownership contract with an identity transform and a scalar
  * checksum — a production codec swaps the C body, the JNI shape and
  * this loading discipline stay.
  *
  * Loading is behind a BUILD FLAG: set `GRAFT_NATIVE_LIB` to the
  * compiled library's absolute path (scripts/build_native.sh emits
  * it). Absent the flag nothing loads, nothing references this class
  * at runtime, and decode remains a loud throw toward the seam
  * ([[Multimodal.RealDecoder]]).
  */
final class NativeCodecHandle private[multimodal] () {
  /** Round-trip: payload copied into native memory, a FRESH JVM-owned
    * array copied back; the input is never mutated (JNI_ABORT).
    */
  @native def identity(payload: Array[Byte]): Array[Byte]

  /** FNV-1a 32-bit over the payload, computed natively — must agree
    * bit-for-bit with [[NativeCodec.fnv1aRef]].
    */
  @native def fnv1a(payload: Array[Byte]): Int

  /** A REAL codec across the seam: native QOI decode, returning
    * [width, height, px...] (px = 0xRRGGBB top-down row-major — the
    * exact [[Qoi.decode]] convention, so the contract spec can demand
    * bit-identical pixels). Malformed streams throw
    * IllegalArgumentException across the ABI, matching the JVM
    * decoder's loud-on-malformation discipline.
    */
  @native def decodeQoi(payload: Array[Byte]): Array[Int]

  /** The seam's first AUDIO codec: RIFF/WAVE PCM16 sample extraction
    * — returns the data chunk's little-endian s16 samples, verified
    * against a PCM(1)/16-bit fmt chunk. The caller's s/32768 fold
    * makes the features bit-identical to the JVM AudioSystem path
    * (NativeSeamSpec pins it). Malformed/truncated chunks and non-
    * PCM16 formats throw IllegalArgumentException across the ABI.
    */
  @native def decodeWavPcm16(payload: Array[Byte]): Array[Short]

  /** The second audio codec family (round 15): a complete native FLAC
    * decoder — CONSTANT/VERBATIM/FIXED/LPC subframes, both rice
    * residual methods with escapes, wasted bits, all four channel
    * assignments — returning interleaved s16 samples, STREAMINFO-
    * verified (16-bit contract, declared-total agreement, frame-header
    * CRC-8). Must be bit-identical to the JVM [[Flac]] twin on every
    * payload and throw IllegalArgumentException on the same
    * malformations (NativeSeamSpec pins both).
    */
  @native def decodeFlacPcm16(payload: Array[Byte]): Array[Short]

  /** The seam's second IMAGE codec (round 15): a complete native WebP
    * LOSSLESS (VP8L) decoder — simple/normal prefix codes, color
    * cache, LZ77 through the distance map and the direct form, meta
    * prefix groups, and all four transforms applied inverse in
    * reverse bitstream order — returning [width, height, px...] with
    * px = 0xAARRGGBB top-down row-major (the [[Webp.decode]]
    * convention plus the leading dims, mirroring [[decodeQoi]]). Must
    * be bit-identical to the JVM [[Webp]] twin on every payload and
    * throw IllegalArgumentException on the same malformations
    * (NativeSeamSpec pins both).
    */
  @native def decodeWebpArgb(payload: Array[Byte]): Array[Int]
}

object NativeCodec {
  /** Env var naming the compiled shared library (the build flag). */
  val LibEnv = "GRAFT_NATIVE_LIB"

  // System.load is process-global and loading two paths that define
  // the same symbols is UB — remember the first and refuse a second
  @volatile private var loadedFrom: Option[String] = None

  /** Load the library at `path` (idempotent for the same path; a
    * DIFFERENT path rejects loudly) and hand back a method handle.
    */
  def load(path: String): NativeCodecHandle = synchronized {
    loadedFrom match {
      case Some(p) =>
        require(p == path,
          s"native codec already loaded from $p; refusing second load " +
            s"of $path (duplicate JNI symbols are undefined behavior)")
      case None =>
        System.load(path)
        loadedFrom = Some(path)
    }
    new NativeCodecHandle
  }

  /** The flag-gated entry: None when GRAFT_NATIVE_LIB is unset — the
    * caller falls back to JVM-only behavior.
    */
  def fromEnv(): Option[NativeCodecHandle] = sys.env.get(LibEnv).map(load)

  /** Scala reference twin of the native fnv1a — the executable
    * contract both sides of the ABI must satisfy on the same bytes.
    */
  def fnv1aRef(payload: Array[Byte]): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xff)) * 0x01000193
      i += 1
    }
    h
  }
}
