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
        if (code == 0xFFFE) {
          /* WAVE_FORMAT_EXTENSIBLE: PCM16 when the subformat GUID is
           * KSDATAFORMAT_SUBTYPE_PCM (00000001-0000-0010-8000-
           * 00AA00389B71, bytes below in on-disk order). The JVM
           * AudioSystem path normalizes these to PCM_SIGNED 16-bit, so
           * accepting them here keeps the two sides of the seam
           * agreeing on the SAME payload set (advice r14) — an
           * extensible non-PCM subformat still rejects. */
          static const unsigned char pcm_guid[16] = {
            0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
            0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71 };
          int g;
          if (sz < 40) { err = "truncated WAV extensible fmt chunk"; goto done; }
          for (g = 0; g < 16; g++)
            if (b[p + 32 + g] != pcm_guid[g]) {
              err = "contract covers PCM16 WAV"; goto done; }
          if (bits != 16) { err = "contract covers PCM16 WAV"; goto done; }
        } else if (code != 1 || bits != 16) {
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

/* The second audio codec family across the seam: a complete FLAC
 * decoder (public xiph.org format spec), the C twin of the JVM
 * decoder (multimodal/Flac.scala) — CONSTANT/VERBATIM/FIXED(0-4)/
 * LPC(1-32) subframes, both rice residual methods with escape
 * partitions, wasted bits, UTF-8 frame numbers, and all four channel
 * assignments. 16-bit contract like the WAV walk; STREAMINFO-verified
 * (declared bit depth, per-frame agreement, total-sample count);
 * frame-header CRC-8 checked. Bit-identical samples to the JVM twin
 * and the same loud-on-malformation discipline (NativeSeamSpec pins
 * both). */
typedef struct {
  const unsigned char *b;
  long len;
  long pos;
  int bit;
  const char *err;
} fbits;

static int fb_bit(fbits *r) {
  int v;
  if (r->err) return 0;
  if (r->pos >= r->len) { r->err = "truncated FLAC stream"; return 0; }
  v = (r->b[r->pos] >> (7 - r->bit)) & 1;
  if (++r->bit == 8) { r->bit = 0; r->pos++; }
  return v;
}

static unsigned long long fb_read(fbits *r, int n) {
  unsigned long long v = 0;
  int i;
  for (i = 0; i < n; i++) v = (v << 1) | (unsigned)fb_bit(r);
  return v;
}

static long long fb_signed(fbits *r, int n) {
  unsigned long long u;
  if (n == 0) return 0;
  u = fb_read(r, n);
  if (n < 64 && (u & (1ULL << (n - 1)))) u |= ~((1ULL << n) - 1);
  return (long long)u;
}

static long long fb_unary(fbits *r) {
  long long q = 0;
  while (!r->err && fb_bit(r) == 0) q++;
  return q;
}

static void fb_align(fbits *r) { if (r->bit) { r->bit = 0; r->pos++; } }

/* CRC-8, polynomial 0x07, init 0 — the frame-header checksum. */
static int flac_crc8(const unsigned char *b, long from, long until) {
  int crc = 0;
  long i;
  int k;
  for (i = from; i < until; i++) {
    crc ^= b[i];
    for (k = 0; k < 8; k++)
      crc = (crc & 0x80) ? ((crc << 1) ^ 0x07) & 0xff : (crc << 1) & 0xff;
  }
  return crc;
}

static void flac_residual(fbits *r, long n, int order, long long *out) {
  int method = (int)fb_read(r, 2);
  int pbits, escape, partOrder, part;
  long parts, perPart;
  long i = order;
  if (method > 1) { r->err = "reserved FLAC residual method"; return; }
  pbits = method == 0 ? 4 : 5;
  escape = (1 << pbits) - 1;
  partOrder = (int)fb_read(r, 4);
  parts = 1L << partOrder;
  if (n & (parts - 1)) {
    r->err = "FLAC partition order does not divide the block size"; return; }
  perPart = n >> partOrder;
  if (perPart < order) {
    r->err = "FLAC predictor order exceeds the partition"; return; }
  for (part = 0; part < parts && !r->err; part++) {
    long count = part == 0 ? perPart - order : perPart;
    int param = (int)fb_read(r, pbits);
    long k;
    if (param == escape) {
      int raw = (int)fb_read(r, 5);
      for (k = 0; k < count && !r->err; k++) out[i++] = fb_signed(r, raw);
    } else {
      for (k = 0; k < count && !r->err; k++) {
        unsigned long long q = (unsigned long long)fb_unary(r);
        unsigned long long u = (q << param) | fb_read(r, param);
        out[i++] = (long long)(u >> 1) ^ -(long long)(u & 1);
      }
    }
  }
}

static void flac_subframe(fbits *r, long n, int bps, long long *out) {
  int tpe, wasted = 0, eff;
  long i;
  if (fb_bit(r) != 0) {
    if (!r->err) r->err = "FLAC subframe padding bit set";
    return;
  }
  tpe = (int)fb_read(r, 6);
  if (fb_bit(r) == 1) wasted = (int)fb_unary(r) + 1;
  if (r->err) return;
  eff = bps - wasted;
  if (eff <= 0) { r->err = "FLAC wasted bits exceed the sample size"; return; }
  if (tpe == 0) { /* CONSTANT */
    long long v = fb_signed(r, eff);
    for (i = 0; i < n; i++) out[i] = v;
  } else if (tpe == 1) { /* VERBATIM */
    for (i = 0; i < n && !r->err; i++) out[i] = fb_signed(r, eff);
  } else if ((tpe & 0x38) == 0x08 && (tpe & 7) <= 4) { /* FIXED */
    int order = tpe & 7;
    for (i = 0; i < order; i++) out[i] = fb_signed(r, eff);
    flac_residual(r, n, order, out);
    if (r->err) return;
    for (i = order; i < n; i++) {
      long long p;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        default: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
          out[i - 4];
      }
      out[i] += p;
    }
  } else if (tpe & 0x20) { /* LPC, order 1..32 */
    int order = (tpe & 0x1f) + 1;
    int precision, shift, j;
    long long coef[32];
    if (order > n) {
      r->err = "FLAC predictor order exceeds the block size"; return; }
    for (i = 0; i < order; i++) out[i] = fb_signed(r, eff);
    precision = (int)fb_read(r, 4) + 1;
    if (precision == 16) { r->err = "invalid FLAC LPC precision code"; return; }
    shift = (int)fb_signed(r, 5);
    if (r->err) return;
    if (shift < 0) { r->err = "negative FLAC LPC shift"; return; }
    for (j = 0; j < order; j++) coef[j] = fb_signed(r, precision);
    flac_residual(r, n, order, out);
    if (r->err) return;
    for (i = order; i < n; i++) {
      long long acc = 0;
      for (j = 0; j < order; j++) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    r->err = "reserved FLAC subframe type";
    return;
  }
  if (wasted > 0)
    for (i = 0; i < n; i++) out[i] <<= wasted;
}

JNIEXPORT jshortArray JNICALL
Java_graft_multimodal_NativeCodecHandle_decodeFlacPcm16(JNIEnv *env,
                                                        jobject self,
                                                        jbyteArray payload) {
  jsize len;
  jbyte *raw;
  const unsigned char *b;
  jshortArray res = NULL;
  jshort *out = NULL;
  long long *ch = NULL;
  const char *err = NULL;
  long rate, silen, p;
  int channels, bps, last;
  long long total, expected, cap, nOut = 0;

  if (payload == NULL) { /* JVM-parity: NPE, never a SIGSEGV */
    jclass c = (*env)->FindClass(env, "java/lang/NullPointerException");
    if (c != NULL) (*env)->ThrowNew(env, c, "null payload");
    return NULL;
  }
  len = (*env)->GetArrayLength(env, payload);
  raw = (*env)->GetByteArrayElements(env, payload, NULL);
  if (raw == NULL) return NULL;
  b = (const unsigned char *)raw;

  if (len < 42 || b[0] != 'f' || b[1] != 'L' || b[2] != 'a' || b[3] != 'C') {
    err = "not a FLAC payload (fLaC magic missing)"; goto done; }
  if ((b[4] & 0x7f) != 0) {
    err = "first metadata block is not STREAMINFO"; goto done; }
  silen = ((long)b[5] << 16) | ((long)b[6] << 8) | b[7];
  if (silen < 34 || 8 + silen > (long)len) {
    err = "truncated or short STREAMINFO"; goto done; }
  rate = ((long)b[18] << 12) | ((long)b[19] << 4) | (b[20] >> 4);
  if (rate == 0) { err = "STREAMINFO sample rate 0"; goto done; }
  channels = ((b[20] >> 1) & 7) + 1;
  bps = (((b[20] & 1) << 4) | (b[21] >> 4)) + 1;
  total = ((long long)(b[21] & 0x0f) << 32) | ((long long)b[22] << 24) |
    ((long long)b[23] << 16) | ((long long)b[24] << 8) | b[25];
  if (bps != 16) { err = "contract covers 16-bit FLAC"; goto done; }
  p = 4;
  last = 0;
  while (!last) {
    long blen;
    if (p + 4 > (long)len) {
      err = "truncated FLAC metadata block header"; goto done; }
    last = b[p] & 0x80;
    blen = ((long)b[p + 1] << 16) | ((long)b[p + 2] << 8) | b[p + 3];
    p += 4 + blen;
    if (p > (long)len) { err = "truncated FLAC metadata block"; goto done; }
  }
  expected = total > 0 ? total * channels : -1;
  if (expected > 0x3fffffffLL) {
    err = "FLAC declares more samples than a single payload can hold";
    goto done; }
  cap = expected >= 0 ? (expected > 0 ? expected : 1) : 65536;
  out = (jshort *)malloc((size_t)cap * sizeof(jshort));
  if (out == NULL) { err = "FLAC sample buffer allocation failed"; goto done; }

#define FLAC_EMIT(v) do { \
    long long _v = (v); \
    if (_v < -32768 || _v > 32767) { \
      err = "decoded sample exceeds the 16-bit range"; goto done; } \
    if (nOut == cap) { \
      jshort *_nw; \
      if (expected >= 0) { \
        err = "decoded sample count disagrees with what STREAMINFO " \
              "declares"; goto done; } \
      cap *= 2; \
      _nw = (jshort *)realloc(out, (size_t)cap * sizeof(jshort)); \
      if (_nw == NULL) { \
        err = "FLAC sample buffer allocation failed"; goto done; } \
      out = _nw; \
    } \
    out[nOut++] = (jshort)_v; \
  } while (0)

  while (p < (long)len) {
    long frameStart = p;
    int bsCode, rateCode, chanAsgn, sizeCode, lead, extra, i, nch, frameBps;
    int c;
    long blockSize, s;
    fbits r;
    if (p + 4 > (long)len) { err = "truncated FLAC frame header"; goto done; }
    if (b[p] != 0xff || (b[p + 1] & 0xfc) != 0xf8) {
      err = "bad FLAC frame sync"; goto done; }
    bsCode = b[p + 2] >> 4;
    rateCode = b[p + 2] & 0x0f;
    chanAsgn = b[p + 3] >> 4;
    sizeCode = (b[p + 3] >> 1) & 7;
    if (b[p + 3] & 1) { err = "reserved FLAC frame-header bit set"; goto done; }
    p += 4;
    if (p >= (long)len) { err = "truncated FLAC frame number"; goto done; }
    lead = b[p];
    if ((lead & 0x80) == 0) extra = 0;
    else if ((lead & 0xe0) == 0xc0) extra = 1;
    else if ((lead & 0xf0) == 0xe0) extra = 2;
    else if ((lead & 0xf8) == 0xf0) extra = 3;
    else if ((lead & 0xfc) == 0xf8) extra = 4;
    else if ((lead & 0xfe) == 0xfc) extra = 5;
    else if (lead == 0xfe) extra = 6;
    else { err = "bad FLAC frame-number coding"; goto done; }
    if (p + 1 + extra > (long)len) {
      err = "truncated FLAC frame number"; goto done; }
    for (i = 0; i < extra; i++)
      if ((b[p + 1 + i] & 0xc0) != 0x80) {
        err = "bad FLAC frame-number coding"; goto done; }
    p += 1 + extra;
    if (bsCode == 0) { err = "reserved FLAC block-size code"; goto done; }
    else if (bsCode == 1) blockSize = 192;
    else if (bsCode <= 5) blockSize = 576L << (bsCode - 2);
    else if (bsCode == 6) {
      if (p >= (long)len) { err = "truncated FLAC block size"; goto done; }
      blockSize = (long)b[p] + 1; p += 1;
    } else if (bsCode == 7) {
      if (p + 2 > (long)len) { err = "truncated FLAC block size"; goto done; }
      blockSize = (((long)b[p] << 8) | b[p + 1]) + 1; p += 2;
    } else blockSize = 256L << (bsCode - 8);
    if (rateCode == 15) { err = "invalid FLAC sample-rate code"; goto done; }
    else if (rateCode == 12) {
      if (p + 1 > (long)len) { err = "truncated FLAC sample rate"; goto done; }
      p += 1;
    } else if (rateCode == 13 || rateCode == 14) {
      if (p + 2 > (long)len) { err = "truncated FLAC sample rate"; goto done; }
      p += 2;
    }
    if (p >= (long)len) {
      err = "truncated FLAC frame header (no CRC-8)"; goto done; }
    if (flac_crc8(b, frameStart, p) != b[p]) {
      err = "FLAC frame-header CRC-8 mismatch"; goto done; }
    p += 1;
    if (chanAsgn <= 7) nch = chanAsgn + 1;
    else if (chanAsgn <= 10) nch = 2;
    else { err = "reserved FLAC channel assignment"; goto done; }
    if (nch != channels) {
      err = "frame channel count differs from STREAMINFO"; goto done; }
    switch (sizeCode) {
      case 0: frameBps = bps; break;
      case 1: frameBps = 8; break;
      case 2: frameBps = 12; break;
      case 4: frameBps = 16; break;
      case 5: frameBps = 20; break;
      case 6: frameBps = 24; break;
      case 7: frameBps = 32; break;
      default: err = "reserved FLAC sample-size code"; goto done;
    }
    if (frameBps != 16) { err = "contract covers 16-bit FLAC"; goto done; }
    ch = (long long *)malloc((size_t)nch * (size_t)blockSize *
      sizeof(long long));
    if (ch == NULL) {
      err = "FLAC channel buffer allocation failed"; goto done; }
    r.b = b; r.len = len; r.pos = p; r.bit = 0; r.err = NULL;
    for (c = 0; c < nch && !r.err; c++) {
      int sidebit = (chanAsgn == 8 && c == 1) || (chanAsgn == 9 && c == 0) ||
        (chanAsgn == 10 && c == 1);
      flac_subframe(&r, blockSize, frameBps + sidebit, ch + c * blockSize);
    }
    if (r.err) { err = r.err; goto done; }
    fb_align(&r);
    if (r.pos + 2 > (long)len) { err = "truncated FLAC frame CRC-16"; goto done; }
    for (s = 0; s < blockSize; s++) {
      if (chanAsgn == 8) { /* left/side: R = L - S */
        FLAC_EMIT(ch[s]);
        FLAC_EMIT(ch[s] - ch[blockSize + s]);
      } else if (chanAsgn == 9) { /* right/side (side first): L = R + S */
        FLAC_EMIT(ch[blockSize + s] + ch[s]);
        FLAC_EMIT(ch[blockSize + s]);
      } else if (chanAsgn == 10) { /* mid/side */
        long long mid = (ch[s] << 1) | (ch[blockSize + s] & 1);
        FLAC_EMIT((mid + ch[blockSize + s]) >> 1);
        FLAC_EMIT((mid - ch[blockSize + s]) >> 1);
      } else {
        for (c = 0; c < nch; c++) FLAC_EMIT(ch[c * blockSize + s]);
      }
    }
    free(ch);
    ch = NULL;
    p = r.pos + 2;
  }
#undef FLAC_EMIT
  if (expected >= 0 && nOut != expected) {
    err = "decoded sample count disagrees with what STREAMINFO declares";
    goto done; }
  res = (*env)->NewShortArray(env, (jsize)nOut);
  if (res != NULL)
    (*env)->SetShortArrayRegion(env, res, 0, (jsize)nOut, out);
done:
  if (ch != NULL) free(ch);
  if (out != NULL) free(out);
  (*env)->ReleaseByteArrayElements(env, payload, raw, JNI_ABORT);
  if (err != NULL) { throw_iae(env, err); return NULL; }
  return res;
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

/* The seam's second IMAGE codec: WebP LOSSLESS (VP8L) decode — the C
 * twin of the JVM decoder (multimodal/Webp.scala), written to the
 * public WebP Lossless Bitstream Specification. Complete support:
 * LSB-first bit reading, simple and normal prefix codes (repeats,
 * zero-runs, max-symbol cap, degenerate single-symbol trees), color
 * cache, LZ77 through both the 120-entry distance map and the direct
 * form, meta prefix groups, and all four transforms (predictor 0-13
 * with border rules and the top-right wraparound, cross-channel color
 * transform against the reconstructed red, subtract-green, color
 * indexing with sub-byte bundling) applied inverse in reverse
 * bitstream order. Output: jintArray [width, height, px...] with
 * px = 0xAARRGGBB top-down row-major — Webp.decode's convention, so
 * NativeSeamSpec can demand bit-identical pixels. Malformed streams
 * throw IllegalArgumentException across the ABI with the same
 * classifications as the JVM twin. */

typedef struct {
  const unsigned char *b;
  long pos;
  long end;
  int bit;
  const char *err;
} wbits;

static int wb_bit(wbits *r) {
  int v;
  if (r->err) return 0;
  if (r->pos >= r->end) { r->err = "truncated VP8L stream"; return 0; }
  v = (r->b[r->pos] >> r->bit) & 1;
  if (++r->bit == 8) { r->bit = 0; r->pos++; }
  return v;
}

static unsigned wb_read(wbits *r, int n) {
  unsigned v = 0;
  int i;
  for (i = 0; i < n; i++) v |= (unsigned)wb_bit(r) << i;
  return v;
}

#define WMAXLEN 15

typedef struct {
  int single;                /* >= 0: degenerate zero-bit tree */
  int count[WMAXLEN + 1];
  int first[WMAXLEN + 1];
  int offs[WMAXLEN + 1];
  int *syms;                 /* owned */
} whuff;

static void whuff_free(whuff *h) {
  if (h->syms != NULL) { free(h->syms); h->syms = NULL; }
}

static int whuff_init(whuff *h, const int *lengths, int n,
                      const char **err) {
  int i, l, nz = 0, lastSym = -1, run = 0, code = 0;
  long kraft = 0;
  int cursor[WMAXLEN + 1];
  h->single = -1;
  h->syms = NULL;
  for (i = 0; i <= WMAXLEN; i++) h->count[i] = 0;
  for (i = 0; i < n; i++) {
    l = lengths[i];
    if (l < 0 || l > WMAXLEN) { *err = "prefix code length out of range"; return 0; }
    if (l > 0) { nz++; lastSym = i; h->count[l]++; }
  }
  if (nz == 0) { *err = "empty prefix code (no symbol has a length)"; return 0; }
  if (nz == 1) { h->single = lastSym; return 1; }
  for (l = 1; l <= WMAXLEN; l++) kraft += (long)h->count[l] << (WMAXLEN - l);
  if (kraft > (1L << WMAXLEN)) {
    *err = "over-subscribed prefix code lengths"; return 0; }
  for (l = 1; l <= WMAXLEN; l++) {
    h->first[l] = code;
    h->offs[l] = run;
    code = (code + h->count[l]) << 1;
    run += h->count[l];
  }
  h->syms = (int *)malloc((size_t)run * sizeof(int));
  if (h->syms == NULL) { *err = "prefix code allocation failed"; return 0; }
  for (l = 1; l <= WMAXLEN; l++) cursor[l] = h->offs[l];
  for (i = 0; i < n; i++) {
    l = lengths[i];
    if (l > 0) h->syms[cursor[l]++] = i;
  }
  return 1;
}

static int whuff_read(whuff *h, wbits *r) {
  int code = 0, len = 0;
  if (h->single >= 0) return h->single;
  while (len < WMAXLEN) {
    code = (code << 1) | wb_bit(r);
    len++;
    if (r->err) return 0;
    if (h->count[len] > 0 && code >= h->first[len] &&
        code - h->first[len] < h->count[len])
      return h->syms[h->offs[len] + code - h->first[len]];
  }
  r->err = "invalid prefix-coded stream (no symbol within 15 bits)";
  return 0;
}

/* the spec's code-length-code symbol order */
static const int wp_cl_order[19] =
  {17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15};

/* (dx, dy) pairs of the 120-entry close-neighborhood distance map (the
 * spec's generative rule: dy 0..7, dx 1..8 when dy = 0 else -7..8,
 * sorted by dx*dx + dy*dy, ties by larger dy then positive dx first) */
static const short wp_dist_map[240] = {
  0, 1, 1, 0, 1, 1, -1, 1, 0, 2, 2, 0,
  1, 2, -1, 2, 2, 1, -2, 1, 2, 2, -2, 2,
  0, 3, 3, 0, 1, 3, -1, 3, 3, 1, -3, 1,
  2, 3, -2, 3, 3, 2, -3, 2, 0, 4, 4, 0,
  1, 4, -1, 4, 4, 1, -4, 1, 3, 3, -3, 3,
  2, 4, -2, 4, 4, 2, -4, 2, 0, 5, 3, 4,
  -3, 4, 4, 3, -4, 3, 5, 0, 1, 5, -1, 5,
  5, 1, -5, 1, 2, 5, -2, 5, 5, 2, -5, 2,
  4, 4, -4, 4, 3, 5, -3, 5, 5, 3, -5, 3,
  0, 6, 6, 0, 1, 6, -1, 6, 6, 1, -6, 1,
  2, 6, -2, 6, 6, 2, -6, 2, 4, 5, -4, 5,
  5, 4, -5, 4, 3, 6, -3, 6, 6, 3, -6, 3,
  0, 7, 7, 0, 1, 7, -1, 7, 5, 5, -5, 5,
  7, 1, -7, 1, 4, 6, -4, 6, 6, 4, -6, 4,
  2, 7, -2, 7, 7, 2, -7, 2, 3, 7, -3, 7,
  7, 3, -7, 3, 5, 6, -5, 6, 6, 5, -6, 5,
  8, 0, 4, 7, -4, 7, 7, 4, -7, 4, 8, 1,
  8, 2, 6, 6, -6, 6, 8, 3, 5, 7, -5, 7,
  7, 5, -7, 5, 8, 4, 6, 7, -6, 7, 7, 6,
  -7, 6, 8, 5, 7, 7, -7, 7, 8, 6, 8, 7};

static int wp_div_up(int a, int b) { return (a + b - 1) / b; }

/* one prefix code: simple or normal (code-length-coded) form */
static int wp_read_code(wbits *r, int alphabet, whuff *out,
                        const char **err) {
  int *lengths = (int *)calloc((size_t)alphabet, sizeof(int));
  int ok = 0;
  if (lengths == NULL) { *err = "code-length allocation failed"; return 0; }
  if (wb_bit(r) == 1) { /* simple */
    int nSym = wb_bit(r) + 1;
    int first8 = wb_bit(r);
    int s0 = (int)wb_read(r, first8 ? 8 : 1);
    if (r->err) goto done;
    if (s0 >= alphabet) { *err = "VP8L simple-code symbol out of the alphabet"; goto done; }
    lengths[s0] = 1;
    if (nSym == 2) {
      int s1 = (int)wb_read(r, 8);
      if (r->err) goto done;
      if (s1 >= alphabet) { *err = "VP8L simple-code symbol out of the alphabet"; goto done; }
      if (s1 == s0) { *err = "VP8L simple code repeats a symbol"; goto done; }
      lengths[s1] = 1;
    }
    ok = whuff_init(out, lengths, alphabet, err);
  } else { /* normal */
    int clLens[19] = {0};
    int ncl = 4 + (int)wb_read(r, 4);
    int i, sym = 0, prev = 8, brk = 0;
    long maxSymbol;
    whuff clTree;
    for (i = 0; i < ncl; i++) clLens[wp_cl_order[i]] = (int)wb_read(r, 3);
    if (r->err) goto done;
    if (!whuff_init(&clTree, clLens, 19, err)) goto done;
    if (wb_bit(r) == 1) {
      int nb = 2 + 2 * (int)wb_read(r, 3);
      maxSymbol = 2 + (long)wb_read(r, nb);
    } else maxSymbol = alphabet;
    while (sym < alphabet && !brk && !r->err && *err == NULL) {
      int cl;
      if (maxSymbol == 0) { brk = 1; continue; }
      maxSymbol--;
      cl = whuff_read(&clTree, r);
      if (r->err) break;
      if (cl < 16) {
        lengths[sym++] = cl;
        if (cl != 0) prev = cl;
      } else {
        int extra = cl == 16 ? 2 : (cl == 17 ? 3 : 7);
        int offset = cl == 18 ? 11 : 3;
        int v = cl == 16 ? prev : 0;
        int rep = (int)wb_read(r, extra) + offset;
        if (sym + rep > alphabet) {
          *err = "VP8L code-length repeat overruns the alphabet"; break; }
        while (rep-- > 0) lengths[sym++] = v;
      }
    }
    whuff_free(&clTree);
    if (!r->err && *err == NULL) ok = whuff_init(out, lengths, alphabet, err);
  }
done:
  free(lengths);
  if (r->err && *err == NULL) *err = r->err;
  return ok;
}

/* LZ77 length/distance prefix decoding */
static int wp_prefix_value(int code, wbits *r) {
  int extra, base;
  if (code < 4) return code + 1;
  extra = (code - 2) >> 1;
  base = (2 + (code & 1)) << extra;
  return base + (int)wb_read(r, extra) + 1;
}

static jint *wp_decode_image(wbits *r, int w, int h, int level0,
                             const char **err);

/* the spatially-coded image: cache, meta groups (level 0), pixels */
static jint *wp_decode_spatial(wbits *r, int w, int h, int level0,
                               const char **err) {
  int cacheBits = 0, hb = 0, ew = 0, nGroups = 1, g;
  long n = (long)w * h, i = 0;
  jint *entropy = NULL, *px = NULL;
  jint *cache = NULL;
  whuff *trees = NULL; /* 5 per group: green, red, blue, alpha, dist */
  int nTrees = 0;

  if (wb_bit(r) == 1) {
    cacheBits = (int)wb_read(r, 4);
    if (cacheBits < 1 || cacheBits > 11) {
      *err = "VP8L color-cache bits out of 1..11"; return NULL; }
  }
  if (level0 && wb_bit(r) == 1) {
    hb = (int)wb_read(r, 3) + 2;
    ew = wp_div_up(w, 1 << hb);
    entropy = wp_decode_spatial(r, ew, wp_div_up(h, 1 << hb), 0, err);
    if (entropy == NULL) return NULL;
    {
      long m = 0, k;
      long en = (long)ew * wp_div_up(h, 1 << hb);
      for (k = 0; k < en; k++) {
        long gi = (entropy[k] >> 8) & 0xffff;
        if (gi > m) m = gi;
      }
      nGroups = (int)m + 1;
    }
  }
  if (r->err) goto fail;
  trees = (whuff *)calloc((size_t)nGroups * 5, sizeof(whuff));
  if (trees == NULL) { *err = "prefix group allocation failed"; goto fail; }
  for (g = 0; g < nGroups; g++) {
    int cacheSize = cacheBits > 0 ? (1 << cacheBits) : 0;
    if (!wp_read_code(r, 256 + 24 + cacheSize, &trees[g * 5 + 0], err)) goto fail;
    nTrees = g * 5 + 1;
    if (!wp_read_code(r, 256, &trees[g * 5 + 1], err)) goto fail;
    nTrees = g * 5 + 2;
    if (!wp_read_code(r, 256, &trees[g * 5 + 2], err)) goto fail;
    nTrees = g * 5 + 3;
    if (!wp_read_code(r, 256, &trees[g * 5 + 3], err)) goto fail;
    nTrees = g * 5 + 4;
    if (!wp_read_code(r, 40, &trees[g * 5 + 4], err)) goto fail;
    nTrees = g * 5 + 5;
  }
  px = (jint *)malloc((size_t)n * sizeof(jint));
  if (px == NULL) { *err = "pixel allocation failed"; goto fail; }
  if (cacheBits > 0) {
    cache = (jint *)calloc((size_t)1 << cacheBits, sizeof(jint));
    if (cache == NULL) { *err = "color-cache allocation failed"; goto fail; }
  }
  while (i < n && !r->err && *err == NULL) {
    whuff *grp = trees;
    int s;
    if (entropy != NULL) {
      long y = i / w, x = i % w;
      long gi = (entropy[(y >> hb) * ew + (x >> hb)] >> 8) & 0xffff;
      grp = trees + gi * 5;
    }
    s = whuff_read(&grp[0], r);
    if (r->err) break;
    if (s < 256) {
      int red = whuff_read(&grp[1], r);
      int blue = whuff_read(&grp[2], r);
      int alpha = whuff_read(&grp[3], r);
      jint v = ((jint)alpha << 24) | (red << 16) | (s << 8) | blue;
      px[i++] = v;
      if (cache != NULL)
        cache[(unsigned)(0x1e35a7bd * (unsigned)v) >> (32 - cacheBits)] = v;
    } else if (s < 280) {
      int lenv = wp_prefix_value(s - 256, r);
      int dsym = whuff_read(&grp[4], r);
      int dcode, dist;
      long k;
      if (r->err) break;
      dcode = wp_prefix_value(dsym, r);
      if (r->err) break;
      if (dcode > 120) dist = dcode - 120;
      else {
        int dx = wp_dist_map[(dcode - 1) * 2];
        int dy = wp_dist_map[(dcode - 1) * 2 + 1];
        dist = dy * w + dx;
        if (dist < 1) dist = 1;
      }
      if (dist > i) { *err = "VP8L back-reference before the image start"; break; }
      if (i + lenv > n) { *err = "VP8L back-reference overruns the image"; break; }
      for (k = 0; k < lenv; k++) {
        jint v = px[i - dist];
        px[i++] = v;
        if (cache != NULL)
          cache[(unsigned)(0x1e35a7bd * (unsigned)v) >> (32 - cacheBits)] = v;
      }
    } else {
      int idx = s - 280;
      if (cacheBits == 0) { *err = "VP8L color-cache symbol without a cache"; break; }
      if (idx >= (1 << cacheBits)) { *err = "VP8L color-cache index out of range"; break; }
      px[i++] = cache[idx];
    }
  }
  if (r->err && *err == NULL) *err = r->err;
  if (*err != NULL) goto fail;
  goto done;
fail:
  if (px != NULL) { free(px); px = NULL; }
done:
  if (cache != NULL) free(cache);
  if (entropy != NULL) free(entropy);
  if (trees != NULL) {
    int t;
    for (t = 0; t < nTrees; t++) whuff_free(&trees[t]);
    free(trees);
  }
  return px;
}

/* ---- inverse transforms ---- */

static jint wp_add_px(jint a, jint b) {
  int aa = ((((unsigned)a >> 24) & 0xff) + (((unsigned)b >> 24) & 0xff)) & 0xff;
  int rr = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff;
  int gg = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff;
  int bb = ((a & 0xff) + (b & 0xff)) & 0xff;
  return ((jint)aa << 24) | (rr << 16) | (gg << 8) | bb;
}

static jint wp_avg2(jint a, jint b) {
  int aa = ((((unsigned)a >> 24) & 0xff) + (((unsigned)b >> 24) & 0xff)) >> 1;
  int rr = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1;
  int gg = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1;
  int bb = ((a & 0xff) + (b & 0xff)) >> 1;
  return ((jint)aa << 24) | (rr << 16) | (gg << 8) | bb;
}

static int wp_clamp255(int v) { return v < 0 ? 0 : (v > 255 ? 255 : v); }

static jint wp_select(jint l, jint t, jint tl) {
  int pL = 0, pT = 0, s;
  for (s = 0; s < 32; s += 8) {
    int cl = ((unsigned)l >> s) & 0xff, ct = ((unsigned)t >> s) & 0xff;
    int ctl = ((unsigned)tl >> s) & 0xff;
    int p = cl + ct - ctl;
    pL += p > cl ? p - cl : cl - p;
    pT += p > ct ? p - ct : ct - p;
  }
  return pL < pT ? l : t;
}

static jint wp_cas_full(jint l, jint t, jint tl) {
  jint out = 0;
  int s;
  for (s = 0; s < 32; s += 8) {
    int v = (((unsigned)l >> s) & 0xff) + (((unsigned)t >> s) & 0xff) -
            (((unsigned)tl >> s) & 0xff);
    out |= (jint)wp_clamp255(v) << s;
  }
  return out;
}

static jint wp_cas_half(jint ave, jint tl) {
  jint out = 0;
  int s;
  for (s = 0; s < 32; s += 8) {
    int a = ((unsigned)ave >> s) & 0xff;
    out |= (jint)wp_clamp255(a + (a - (int)(((unsigned)tl >> s) & 0xff)) / 2) << s;
  }
  return out;
}

static jint wp_predict(int mode, jint l, jint t, jint tl, jint tr,
                       const char **err) {
  switch (mode) {
    case 0: return (jint)0xff000000;
    case 1: return l;
    case 2: return t;
    case 3: return tr;
    case 4: return tl;
    case 5: return wp_avg2(wp_avg2(l, tr), t);
    case 6: return wp_avg2(l, tl);
    case 7: return wp_avg2(l, t);
    case 8: return wp_avg2(tl, t);
    case 9: return wp_avg2(t, tr);
    case 10: return wp_avg2(wp_avg2(l, tl), wp_avg2(t, tr));
    case 11: return wp_select(l, t, tl);
    case 12: return wp_cas_full(l, t, tl);
    case 13: return wp_cas_half(wp_avg2(l, t), tl);
    default: *err = "VP8L predictor mode out of 0..13"; return 0;
  }
}

/* 3.5 signed fixed-point cross-channel delta */
static int wp_ct_delta(int t, int c) {
  return ((int)(signed char)t * (int)(signed char)c) >> 5;
}

JNIEXPORT jintArray JNICALL
Java_graft_multimodal_NativeCodecHandle_decodeWebpArgb(JNIEnv *env,
                                                       jobject self,
                                                       jbyteArray payload) {
  jsize len;
  jbyte *raw;
  const unsigned char *b;
  jintArray res = NULL;
  jint *px = NULL;
  const char *err = NULL;
  long i, s = -1, e = -1, riffEnd;
  int w, h, curW;
  wbits r;
  struct { int tpe; int bits; jint *data; int srcW; } tf[4];
  int nTf = 0, ti;

  if (payload == NULL) { /* JVM-parity: NPE, never a SIGSEGV */
    jclass c = (*env)->FindClass(env, "java/lang/NullPointerException");
    if (c != NULL) (*env)->ThrowNew(env, c, "null payload");
    return NULL;
  }
  len = (*env)->GetArrayLength(env, payload);
  raw = (*env)->GetByteArrayElements(env, payload, NULL);
  if (raw == NULL) return NULL;
  b = (const unsigned char *)raw;

  if (len < 12 || b[0] != 'R' || b[1] != 'I' || b[2] != 'F' || b[3] != 'F' ||
      b[8] != 'W' || b[9] != 'E' || b[10] != 'B' || b[11] != 'P') {
    err = "not a WebP payload (RIFF....WEBP magic missing)"; goto done; }
  riffEnd = 8 + ((long)b[4] | ((long)b[5] << 8) | ((long)b[6] << 16) |
                 ((long)b[7] << 24));
  if (riffEnd > len) { err = "RIFF size overruns the buffer"; goto done; }
  i = 12;
  while (s < 0 && i + 8 <= riffEnd) {
    long size = (long)b[i + 4] | ((long)b[i + 5] << 8) |
                ((long)b[i + 6] << 16) | ((long)b[i + 7] << 24);
    if (i + 8 + size > riffEnd) { err = "chunk overruns the RIFF payload"; goto done; }
    if (b[i] == 'V' && b[i + 1] == 'P' && b[i + 2] == '8' && b[i + 3] == 'L') {
      s = i + 8; e = s + size;
    } else i += 8 + size + (size & 1);
  }
  if (s < 0) { err = "VP8L chunk missing or truncated"; goto done; }
  if (s >= e || b[s] != 0x2f) { err = "VP8L signature missing"; goto done; }

  r.b = b; r.pos = s + 1; r.end = e; r.bit = 0; r.err = NULL;
  w = (int)wb_read(&r, 14) + 1;
  h = (int)wb_read(&r, 14) + 1;
  wb_bit(&r); /* alpha-is-used hint */
  if (wb_read(&r, 3) != 0) { err = "unsupported VP8L version"; goto done; }
  if (r.err) { err = r.err; goto done; }

  /* transforms (level 0 only) */
  curW = w;
  {
    int seen = 0;
    while (wb_bit(&r) == 1 && !r.err && err == NULL) {
      int t = (int)wb_read(&r, 2);
      if (seen & (1 << t)) { err = "VP8L transform appears twice"; goto done; }
      seen |= 1 << t;
      if (t == 0 || t == 1) {
        int sb = (int)wb_read(&r, 3) + 2;
        jint *data = wp_decode_image(&r, wp_div_up(curW, 1 << sb),
                                     wp_div_up(h, 1 << sb), 0, &err);
        if (data == NULL) goto done;
        tf[nTf].tpe = t; tf[nTf].bits = sb; tf[nTf].data = data;
        tf[nTf].srcW = curW; nTf++;
      } else if (t == 2) {
        tf[nTf].tpe = 2; tf[nTf].bits = 0; tf[nTf].data = NULL;
        tf[nTf].srcW = curW; nTf++;
      } else {
        int np = (int)wb_read(&r, 8) + 1;
        int k, widthBits;
        jint *pal = wp_decode_image(&r, np, 1, 0, &err);
        if (pal == NULL) goto done;
        for (k = 1; k < np; k++) pal[k] = wp_add_px(pal[k], pal[k - 1]);
        widthBits = np <= 2 ? 3 : (np <= 4 ? 2 : (np <= 16 ? 1 : 0));
        tf[nTf].tpe = 3; tf[nTf].bits = widthBits; tf[nTf].data = pal;
        /* srcW doubles as the palette size via data length — store
         * width; palette size rides in a parallel slot (bits<<16) is
         * ugly, keep np in the unused high bits of bits instead */
        tf[nTf].bits = widthBits | (np << 4);
        tf[nTf].srcW = curW; nTf++;
        curW = wp_div_up(curW, 1 << widthBits);
      }
    }
  }
  if (r.err) { err = r.err; goto done; }

  px = wp_decode_spatial(&r, curW, h, 1, &err);
  if (px == NULL) goto done;

  /* inverse transforms, newest-read first */
  for (ti = nTf - 1; ti >= 0 && err == NULL; ti--) {
    int t = tf[ti].tpe;
    if (t == 0) { /* predictor */
      int sb = tf[ti].bits, ww = tf[ti].srcW;
      int tw = wp_div_up(ww, 1 << sb);
      int x, y;
      for (y = 0; y < h && err == NULL; y++)
        for (x = 0; x < ww; x++) {
          long idx = (long)y * ww + x;
          jint pred;
          if (x == 0 && y == 0) pred = (jint)0xff000000;
          else if (y == 0) pred = px[idx - 1];
          else if (x == 0) pred = px[idx - ww];
          else {
            int mode = (tf[ti].data[((long)(y >> sb)) * tw + (x >> sb)] >> 8) & 0xff;
            pred = wp_predict(mode, px[idx - 1], px[idx - ww],
                              px[idx - ww - 1], px[idx - ww + 1], &err);
            if (err != NULL) break;
          }
          px[idx] = wp_add_px(px[idx], pred);
        }
      curW = ww;
    } else if (t == 1) { /* color transform */
      int sb = tf[ti].bits, ww = tf[ti].srcW;
      int tw = wp_div_up(ww, 1 << sb);
      int x, y;
      for (y = 0; y < h; y++)
        for (x = 0; x < ww; x++) {
          long idx = (long)y * ww + x;
          jint el = tf[ti].data[((long)(y >> sb)) * tw + (x >> sb)];
          int g2r = el & 0xff, g2b = (el >> 8) & 0xff, r2b = (el >> 16) & 0xff;
          jint v = px[idx];
          int gg = (v >> 8) & 0xff;
          int rr = (v >> 16) & 0xff;
          int bb = v & 0xff;
          rr = (rr + wp_ct_delta(g2r, gg)) & 0xff;
          bb = (bb + wp_ct_delta(g2b, gg)) & 0xff;
          bb = (bb + wp_ct_delta(r2b, rr)) & 0xff;
          px[idx] = (v & (jint)0xff00ff00) | (rr << 16) | bb;
        }
      curW = ww;
    } else if (t == 2) { /* subtract-green */
      long k, n = (long)tf[ti].srcW * h;
      for (k = 0; k < n; k++) {
        jint v = px[k];
        int gg = (v >> 8) & 0xff;
        int rr = (((v >> 16) & 0xff) + gg) & 0xff;
        int bb = ((v & 0xff) + gg) & 0xff;
        px[k] = (v & (jint)0xff00ff00) | (rr << 16) | bb;
      }
      curW = tf[ti].srcW;
    } else { /* color indexing */
      int widthBits = tf[ti].bits & 0xf;
      int np = tf[ti].bits >> 4;
      int ww = tf[ti].srcW;
      int packedW = curW;
      int xcount = 1 << widthBits;
      int bitsPer = 8 >> widthBits;
      int mask = (1 << bitsPer) - 1;
      int x, y;
      jint *out2 = (jint *)malloc((size_t)ww * h * sizeof(jint));
      if (out2 == NULL) { err = "unbundle allocation failed"; break; }
      for (y = 0; y < h && err == NULL; y++)
        for (x = 0; x < ww; x++) {
          jint packed = px[(long)y * packedW + (x >> widthBits)];
          int j = x & (xcount - 1);
          int idx = (((unsigned)packed >> 8) >> (j * bitsPer)) & mask;
          if (idx >= np) { err = "VP8L palette index out of range"; break; }
          out2[(long)y * ww + x] = tf[ti].data[idx];
        }
      if (err != NULL) { free(out2); break; }
      free(px);
      px = out2;
      curW = ww;
    }
  }
  if (err != NULL) goto done;
  if (curW != w) { err = "VP8L transform chain does not restore the width"; goto done; }

  res = (*env)->NewIntArray(env, (jsize)(2 + (long)w * h));
  if (res != NULL) {
    jint wh[2];
    wh[0] = w; wh[1] = h;
    (*env)->SetIntArrayRegion(env, res, 0, 2, wh);
    (*env)->SetIntArrayRegion(env, res, 2, (jsize)((long)w * h), px);
  }

done:
  for (ti = 0; ti < nTf; ti++)
    if (tf[ti].data != NULL) free(tf[ti].data);
  if (px != NULL) free(px);
  (*env)->ReleaseByteArrayElements(env, payload, raw, JNI_ABORT);
  if (err != NULL) { throw_iae(env, err); return NULL; }
  return res;
}

static jint *wp_decode_image(wbits *r, int w, int h, int level0,
                             const char **err) {
  /* subimages carry no transforms — the JNI entry handles level 0 */
  (void)level0;
  return wp_decode_spatial(r, w, h, 0, err);
}
