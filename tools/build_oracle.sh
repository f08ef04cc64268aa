#!/bin/sh
# Build reference-implementation test oracles out-of-tree into .ref_build/.
# The reference at /root/reference is read-only; we only compile from it.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
BUILD="$REPO/.ref_build"
mkdir -p "$BUILD/oracle_inc"
touch "$BUILD/oracle_inc/config.h"

# Entropy layer oracle (range coder + laplace)
gcc -O2 -fPIC -shared \
    -I"$BUILD/oracle_inc" -I"$REF/include" -I"$REF/celt" -I"$REF/src" \
    "$REF/celt/entenc.c" "$REF/celt/entdec.c" "$REF/celt/entcode.c" \
    "$REF/celt/laplace.c" \
    -o "$BUILD/libentropy_oracle.so"

# Full library + opus_demo for end-to-end vectors (cmake, static)
if [ ! -x "$BUILD/opus_demo" ]; then
    cmake -S "$REF" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release \
        -DOPUS_BUILD_PROGRAMS=ON -DOPUS_BUILD_TESTING=ON \
        -DOPUS_CUSTOM_MODES=ON -G Ninja > "$BUILD/cfg.log" 2>&1
    ninja -C "$BUILD" > "$BUILD/build.log" 2>&1
fi
echo "oracle build ok"
