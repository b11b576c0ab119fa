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

JNIEXPORT jbyteArray JNICALL
Java_graft_multimodal_NativeCodecHandle_identity(JNIEnv *env, jobject self,
                                                 jbyteArray payload) {
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

JNIEXPORT jint JNICALL
Java_graft_multimodal_NativeCodecHandle_fnv1a(JNIEnv *env, jobject self,
                                              jbyteArray payload) {
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
