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
