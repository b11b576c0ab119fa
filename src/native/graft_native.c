/* The JNI seam prototype for graft's multimodal decode boundary.
 *
 * Container METADATA walks are pure JVM (Mp4/Containers/Qoi); actual
 * sample DECODE needs a native codec. This file proves the seam's
 * memory/ownership contract with the smallest possible surface:
 *
 *  - identity(): a byte payload crosses INTO native memory and a fresh
 *    JVM-owned jbyteArray crosses back. A real decoder replaces the
 *    copy with a codec call; the ownership shape stays exactly this —
 *    GetByteArrayElements (pinned or copied view, released with
 *    JNI_ABORT because the input is never mutated), NewByteArray +
 *    SetByteArrayRegion for the output (the JVM owns it, native keeps
 *    no reference).
 *  - fnv1a(): one scalar computed natively from the bytes, so the
 *    contract spec can prove VALUES cross the boundary, not just
 *    buffers (the Scala twin NativeCodec.fnv1aRef must agree bit-for-
 *    bit).
 *
 * Build: scripts/build_native.sh (gcc -shared -fPIC against the JDK's
 * jni.h). Loaded behind the GRAFT_NATIVE_LIB flag — absent flag, the
 * JVM walks keep working and decode stays a loud throw.
 */
#include <jni.h>
#include <stdlib.h>

JNIEXPORT jbyteArray JNICALL
Java_graft_multimodal_NativeCodecHandle_identity(JNIEnv *env, jobject self,
                                                 jbyteArray payload) {
  if (payload == NULL) { /* JVM-parity: NPE, never a SIGSEGV */
    jclass c = (*env)->FindClass(env, "java/lang/NullPointerException");
    if (c != NULL) (*env)->ThrowNew(env, c, "null payload");
    return NULL;
  }
  jsize n = (*env)->GetArrayLength(env, payload);
  jbyte *in = (*env)->GetByteArrayElements(env, payload, NULL);
  if (in == NULL) return NULL; /* OutOfMemoryError already pending */
  jbyteArray out = (*env)->NewByteArray(env, n);
  if (out != NULL) (*env)->SetByteArrayRegion(env, out, 0, n, in);
  /* JNI_ABORT: the input view is read-only here — the JVM's array is
   * never written back, which is the no-mutation half of the contract */
  (*env)->ReleaseByteArrayElements(env, payload, in, JNI_ABORT);
  return out;
}

/* A REAL codec across the seam: QOI decode (the public qoiformat.org
 * spec), the C twin of the JVM decoder (multimodal/Qoi.scala) — the
 * contract spec proves both produce bit-identical pixels on the same
 * payloads AND throw on the same malformed streams. Output layout:
 * jintArray [width, height, px...] with px = 0xRRGGBB top-down
 * row-major (alpha feeds the index hash but is not returned — exactly
 * the JVM decoder's convention). Malformed input throws
 * IllegalArgumentException ACROSS the ABI: loud-on-malformation is
 * part of the seam contract, not just a JVM-side nicety. */
static void throw_iae(JNIEnv *env, const char *msg) {
  jclass c = (*env)->FindClass(env, "java/lang/IllegalArgumentException");
  if (c != NULL) (*env)->ThrowNew(env, c, msg);
}

JNIEXPORT jintArray JNICALL
Java_graft_multimodal_NativeCodecHandle_decodeQoi(JNIEnv *env, jobject self,
                                                  jbyteArray payload) {
  if (payload == NULL) { /* JVM-parity: NPE, never a SIGSEGV */
    jclass c = (*env)->FindClass(env, "java/lang/NullPointerException");
    if (c != NULL) (*env)->ThrowNew(env, c, "null payload");
    return NULL;
  }
  jsize len = (*env)->GetArrayLength(env, payload);
  jbyte *raw = (*env)->GetByteArrayElements(env, payload, NULL);
  if (raw == NULL) return NULL;
  const unsigned char *b = (const unsigned char *)raw;
  jintArray out = NULL;
  jint *px = NULL;
  const char *err = NULL;

  if (len < 14 + 8 || b[0] != 'q' || b[1] != 'o' || b[2] != 'i' ||
      b[3] != 'f') { err = "not a QOI payload"; goto done; }
  {
    long w = ((long)b[4] << 24) | ((long)b[5] << 16) | ((long)b[6] << 8) | b[7];
    long h = ((long)b[8] << 24) | ((long)b[9] << 16) | ((long)b[10] << 8) | b[11];
    int channels = b[12], colorspace = b[13];
    if (channels != 3 && channels != 4) { err = "QOI channels must be 3 or 4"; goto done; }
    if (colorspace > 1) { err = "QOI colorspace must be 0 or 1"; goto done; }
    /* bound each dimension BEFORE multiplying: w,h parse as unsigned
     * 32-bit, so an unchecked w*h could overflow signed long (UB) and
     * a wrapped-negative product would slip past the area check —
     * with both sides <= 2^31-1 the product tops out at ~2^62, safely
     * inside signed long (the JVM twin's w.toLong * h shape) */
    if (w <= 0 || h <= 0 || w > 0x7fffffffL || h > 0x7fffffffL ||
        w * h > (0x7fffffffL >> 2)) {
      err = "bad QOI dimensions"; goto done; }
    long n = w * h;
    px = (jint *)malloc((size_t)n * sizeof(jint));
    if (px == NULL) { err = "QOI pixel buffer allocation failed"; goto done; }
    int r = 0, g = 0, bl = 0, a = 255;
    unsigned int index[64] = {0}; /* packed RGBA, zero = (0,0,0,0) */
    long end = len - 8; /* ops end where the 8-byte end marker starts */
    long p = 14, i = 0;
    while (i < n) {
      if (p >= end) { err = "truncated QOI stream"; goto done; }
      int tag = b[p];
      long run = 1;
      if (tag == 0xFE) { /* QOI_OP_RGB */
        if (p + 4 > end) { err = "truncated QOI_OP_RGB"; goto done; }
        r = b[p + 1]; g = b[p + 2]; bl = b[p + 3]; p += 4;
      } else if (tag == 0xFF) { /* QOI_OP_RGBA */
        if (p + 5 > end) { err = "truncated QOI_OP_RGBA"; goto done; }
        r = b[p + 1]; g = b[p + 2]; bl = b[p + 3]; a = b[p + 4]; p += 5;
      } else switch (tag >> 6) {
        case 0: { /* QOI_OP_INDEX */
          unsigned int v = index[tag & 0x3f];
          r = (v >> 24) & 0xff; g = (v >> 16) & 0xff;
          bl = (v >> 8) & 0xff; a = v & 0xff; p += 1;
          break; }
        case 1: /* QOI_OP_DIFF: 2-bit deltas, bias 2, wrapping */
          r = (r + ((tag >> 4) & 3) - 2) & 0xff;
          g = (g + ((tag >> 2) & 3) - 2) & 0xff;
          bl = (bl + (tag & 3) - 2) & 0xff;
          p += 1;
          break;
        case 2: { /* QOI_OP_LUMA */
          if (p + 2 > end) { err = "truncated QOI_OP_LUMA"; goto done; }
          int dg = (tag & 0x3f) - 32, b2 = b[p + 1];
          r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff;
          g = (g + dg) & 0xff;
          bl = (bl + dg + (b2 & 0xf) - 8) & 0xff;
          p += 2;
          break; }
        default: /* QOI_OP_RUN (0xFE/0xFF taken above): length 1..62 */
          run = (tag & 0x3f) + 1;
          p += 1;
      }
      index[(3 * r + 5 * g + 7 * bl + 11 * a) % 64] =
        ((unsigned int)r << 24) | ((unsigned int)g << 16) |
        ((unsigned int)bl << 8) | (unsigned int)a;
      if (i + run > n) { err = "QOI run overflows the pixel count"; goto done; }
      jint packed = (jint)((r << 16) | (g << 8) | bl);
      while (run-- > 0) px[i++] = packed;
    }
    out = (*env)->NewIntArray(env, (jsize)(n + 2));
    if (out != NULL) {
      jint wh[2] = {(jint)w, (jint)h};
      (*env)->SetIntArrayRegion(env, out, 0, 2, wh);
      (*env)->SetIntArrayRegion(env, out, 2, (jsize)n, px);
    }
  }
done:
  if (px != NULL) free(px);
  (*env)->ReleaseByteArrayElements(env, payload, raw, JNI_ABORT);
  if (err != NULL) { throw_iae(env, err); return NULL; }
  return out;
}

/* The seam's first AUDIO codec: RIFF/WAVE PCM16 sample extraction,
 * the C twin of the JVM walks (UncompressedDecoder's chunk walk +
 * RealDecoder's AudioSystem contract). Walks the chunk list, verifies
 * the fmt chunk declares PCM (format code 1) at 16 bits/sample, and
 * returns the data chunk's little-endian s16 samples as a jshortArray
 * — the caller folds s/32768 exactly as the JVM path does, so the
 * features are bit-identical (NativeSeamSpec pins this). Same
 * corrupt-size discipline as the JVM walk: a chunk size that runs
 * past the buffer throws instead of reading wild. */
JNIEXPORT jshortArray JNICALL
Java_graft_multimodal_NativeCodecHandle_decodeWavPcm16(JNIEnv *env,
                                                       jobject self,
                                                       jbyteArray payload) {
  if (payload == NULL) { /* JVM-parity: NPE, never a SIGSEGV */
    jclass c = (*env)->FindClass(env, "java/lang/NullPointerException");
    if (c != NULL) (*env)->ThrowNew(env, c, "null payload");
    return NULL;
  }
  jsize len = (*env)->GetArrayLength(env, payload);
  jbyte *raw = (*env)->GetByteArrayElements(env, payload, NULL);
  if (raw == NULL) return NULL;
  const unsigned char *b = (const unsigned char *)raw;
  jshortArray out = NULL;
  jshort *samples = NULL;
  const char *err = NULL;
  int fmt_seen = 0;

  if (len < 12 || b[0] != 'R' || b[1] != 'I' || b[2] != 'F' ||
      b[3] != 'F' || b[8] != 'W' || b[9] != 'A' || b[10] != 'V' ||
      b[11] != 'E') { err = "not a RIFF/WAVE payload"; goto done; }
  {
    long p = 12;
    while (p + 8 <= (long)len) {
      /* chunk sizes are unsigned 32-bit; assemble in long so a size
       * with the high bit set can't wrap negative and pass the bound */
      long sz = (long)b[p + 4] | ((long)b[p + 5] << 8) |
                ((long)b[p + 6] << 16) | ((long)b[p + 7] << 24);
      if (p + 8 + sz > (long)len) { err = "corrupt or truncated WAV chunk"; goto done; }
      if (b[p] == 'f' && b[p + 1] == 'm' && b[p + 2] == 't' &&
          b[p + 3] == ' ') {
        if (sz < 16) { err = "truncated WAV fmt chunk"; goto done; }
        int code = b[p + 8] | (b[p + 9] << 8);
        int bits = b[p + 22] | (b[p + 23] << 8);
        if (code != 1 || bits != 16) {
          err = "contract covers PCM16 WAV"; goto done; }
        fmt_seen = 1;
      } else if (b[p] == 'd' && b[p + 1] == 'a' && b[p + 2] == 't' &&
                 b[p + 3] == 'a') {
        if (!fmt_seen) { err = "WAV data chunk before fmt"; goto done; }
        long n = sz / 2;
        samples = (jshort *)malloc((size_t)(n > 0 ? n : 1) * sizeof(jshort));
        if (samples == NULL) { err = "WAV sample buffer allocation failed"; goto done; }
        for (long i = 0; i < n; i++)
          samples[i] = (jshort)(b[p + 8 + 2 * i] | (b[p + 9 + 2 * i] << 8));
        out = (*env)->NewShortArray(env, (jsize)n);
        if (out != NULL)
          (*env)->SetShortArrayRegion(env, out, 0, (jsize)n, samples);
        goto done;
      }
      p += 8 + sz + (sz & 1); /* chunks are word-aligned */
    }
    err = "no data chunk in WAV payload";
  }
done:
  if (samples != NULL) free(samples);
  (*env)->ReleaseByteArrayElements(env, payload, raw, JNI_ABORT);
  if (err != NULL) { throw_iae(env, err); return NULL; }
  return out;
}

JNIEXPORT jint JNICALL
Java_graft_multimodal_NativeCodecHandle_fnv1a(JNIEnv *env, jobject self,
                                              jbyteArray payload) {
  if (payload == NULL) { /* JVM-parity: NPE, never a SIGSEGV */
    jclass c = (*env)->FindClass(env, "java/lang/NullPointerException");
    if (c != NULL) (*env)->ThrowNew(env, c, "null payload");
    return 0;
  }
  jsize n = (*env)->GetArrayLength(env, payload);
  jbyte *in = (*env)->GetByteArrayElements(env, payload, NULL);
  if (in == NULL) return 0;
  unsigned int h = 2166136261u; /* FNV-1a 32-bit offset basis */
  for (jsize i = 0; i < n; i++) {
    h ^= (unsigned char)in[i];
    h *= 16777619u; /* FNV prime */
  }
  (*env)->ReleaseByteArrayElements(env, payload, in, JNI_ABORT);
  return (jint)h;
}
