#!/bin/sh
# Build the JNI seam prototype (src/native/graft_native.c) into a
# shared library, printing its path — export that as GRAFT_NATIVE_LIB
# to enable the native path (NativeCodec.fromEnv / NativeSeamSpec).
set -e
JAVA_HOME="${JAVA_HOME:-$(dirname "$(dirname "$(readlink -f "$(command -v java)")")")}"
OUT_DIR="${1:-target/native}"
mkdir -p "$OUT_DIR"
OUT="$OUT_DIR/libgraftnative.so"
gcc -shared -fPIC -O2 -Werror=implicit-function-declaration \
  -I"$JAVA_HOME/include" -I"$JAVA_HOME/include/linux" \
  src/native/graft_native.c -o "$OUT"
echo "$OUT"
