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

# Packet/extensions oracle
printf 'int opus_limit2_checkwithin1_c(float *s, int n){(void)s;(void)n;return 0;}\n' \
    > "$BUILD/oracle_inc/stub_limit2.c"
gcc -O2 -fPIC -shared \
    -I"$BUILD/oracle_inc" -I"$REF/include" -I"$REF/celt" -I"$REF/src" \
    "$REF/src/extensions.c" "$REF/src/opus.c" "$BUILD/oracle_inc/stub_limit2.c" \
    -o "$BUILD/libpacket_oracle.so"

# MDCT oracle
gcc -O2 -fPIC -shared -DCUSTOM_MODES -DVAR_ARRAYS \
    -I"$BUILD/oracle_inc" -I"$REF/include" -I"$REF/celt" -I"$REF/src" \
    "$REPO/tools/mdct_oracle_shim.c" "$REF/celt/mdct.c" "$REF/celt/kiss_fft.c" \
    -o "$BUILD/libmdct_oracle.so"

# Full library + opus_demo for end-to-end vectors (cmake, static)
if [ ! -x "$BUILD/opus_demo" ]; then
    cmake -S "$REF" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release \
        -DOPUS_BUILD_PROGRAMS=ON -DOPUS_BUILD_TESTING=ON \
        -DOPUS_CUSTOM_MODES=ON -G Ninja > "$BUILD/cfg.log" 2>&1
    ninja -C "$BUILD" > "$BUILD/build.log" 2>&1
fi

# PIC build of the full library for linking test shims
if [ ! -f "$REPO/.ref_build_pic/libopus.a" ]; then
    mkdir -p "$REPO/.ref_build_pic"
    cmake -S "$REF" -B "$REPO/.ref_build_pic" -DCMAKE_BUILD_TYPE=Release \
        -DCMAKE_POSITION_INDEPENDENT_CODE=ON -DOPUS_CUSTOM_MODES=ON \
        -G Ninja > "$REPO/.ref_build_pic/cfg.log" 2>&1 || true
    ninja -C "$REPO/.ref_build_pic" > "$REPO/.ref_build_pic/build.log" 2>&1
fi

# SILK decoder oracle (linked against the PIC lib)
gcc -O2 -fPIC -shared -DHAVE_CONFIG_H=0 -DVAR_ARRAYS \
    -I"$BUILD/oracle_inc" -I"$REF/include" -I"$REF/celt" -I"$REF/silk" \
    -I"$REF/silk/fixed" -I"$REF/src" \
    "$REPO/tools/silk_oracle_shim.c" "$REPO/tools/silk_oracle_shim2.c" \
    "$REPO/tools/silk_oracle_shim3.c" "$REPO/tools/silk_oracle_shim4.c" \
    -o "$BUILD/libsilk_oracle.so" \
    -L"$REPO/.ref_build_pic" -Wl,--whole-archive "$REPO/.ref_build_pic/libopus.a" \
    -Wl,--no-whole-archive -lm 2>/dev/null

# Full libopus as a shared lib for ctypes end-to-end tests
gcc -shared -o "$BUILD/libopus_full.so" \
    -Wl,--whole-archive "$REPO/.ref_build_pic/libopus.a" \
    -Wl,--no-whole-archive -lm



# NN runtime oracle (layer zoo + weight-blob parser, generic C kernels;
# -U__SSE2__ forces the portable vec.h path so results match the spec'd
# scalar semantics; -DFARGAN_H skips the tarball-dependent fargan header)
gcc -O2 -fPIC -shared -DVAR_ARRAYS -U__AVX__ -U__SSE2__ -U__SSE__ \
    -DFARGAN_H -DFARGAN_MAX_RNN_NEURONS=1536 \
    -I"$REPO/tools/nnet_oracle_inc" -I"$BUILD/oracle_inc" \
    -I"$REF/include" -I"$REF/celt" -I"$REF/dnn" -I"$REF/src" \
    "$REF/dnn/nnet.c" "$REF/dnn/nnet_default.c" \
    "$REF/dnn/parse_lpcnet_weights.c" \
    -o "$BUILD/libnnet_oracle.so" -lm

echo "oracle build ok"

# RDOVAE oracle (DRED encoder/decoder networks, random-weight parity)
gcc -O2 -fPIC -shared -DVAR_ARRAYS -U__AVX__ -U__SSE2__ -U__SSE__ \
    -DFARGAN_H -DFARGAN_MAX_RNN_NEURONS=1536 \
    -I"$REPO/tools/rdovae_oracle_inc" -I"$REPO/tools/nnet_oracle_inc" -I"$BUILD/oracle_inc" \
    -I"$REF/include" -I"$REF/celt" -I"$REF/dnn" -I"$REF/src" \
    "$REPO/tools/rdovae_oracle_shim.c" \
    "$REF/dnn/dred_rdovae_enc.c" "$REF/dnn/dred_rdovae_dec.c" \
    "$REF/dnn/nnet.c" "$REF/dnn/nnet_default.c" \
    "$REF/dnn/parse_lpcnet_weights.c" \
    -o "$BUILD/librdovae_oracle.so" -lm

# LPCNet features + pitch DNN + FARGAN oracle
gcc -O2 -fPIC -shared -DVAR_ARRAYS -U__AVX__ -U__SSE2__ -U__SSE__ -DUSE_WEIGHTS_FILE \
    -I"$REPO/tools/dnn_oracle_inc" -I"$REPO/tools/rdovae_oracle_inc" -I"$BUILD/oracle_inc" \
    -I"$REF/include" -I"$REF/celt" -I"$REF/dnn" -I"$REF/src" \
    "$REPO/tools/dnn_oracle_shim.c" \
    "$REF/dnn/lpcnet_enc.c" "$REF/dnn/freq.c" "$REF/dnn/burg.c" "$REF/dnn/lpcnet_plc.c" \
    "$REF/dnn/pitchdnn.c" "$REF/dnn/lpcnet_tables.c" "$REF/dnn/fargan.c" "$REF/dnn/nndsp.c" \
    "$REF/celt/kiss_fft.c" "$REF/celt/celt_lpc.c" "$REF/celt/pitch.c" "$REF/celt/mathops.c" \
    "$REF/dnn/nnet.c" "$REF/dnn/nnet_default.c" "$REF/dnn/parse_lpcnet_weights.c" \
    -o "$BUILD/libdnn_oracle.so" -lm

# OSCE oracle (LACE/NoLACE enhancers; includes osce.c as one TU so the
# static process functions are callable; silk/celt deps from libopus)
gcc -O2 -fPIC -shared -DVAR_ARRAYS -U__AVX__ -U__SSE2__ -U__SSE__ -DUSE_WEIGHTS_FILE -DDISABLE_BBWENET -DENABLE_OSCE \
    -I"$REPO/tools/osce_oracle_inc" -I"$REPO/tools/dnn_oracle_inc" -I"$REPO/tools/rdovae_oracle_inc" -I"$BUILD/oracle_inc" \
    -I"$REF/include" -I"$REF/celt" -I"$REF/dnn" -I"$REF/silk" -I"$REF/silk/float" -I"$REF/src" \
    "$REPO/tools/osce_oracle_shim.c" \
    "$REF/dnn/freq.c" "$REF/dnn/burg.c" "$REF/dnn/lpcnet_tables.c" \
    "$REF/dnn/nndsp.c" "$REF/dnn/nnet.c" "$REF/dnn/nnet_default.c" "$REF/dnn/parse_lpcnet_weights.c" \
    -o "$BUILD/libosce_oracle.so" -lm -L"$REPO/.ref_build_pic" -lopus

# QEXT-enabled reference (96 kHz modes + quality extensions): opus_demo +
# shared libopus with the custom API exported, used by the 96k decode tests
if [ ! -f "$REPO/.ref_build_qext/libopus.so" ]; then
    cmake -S "$REF" -B "$REPO/.ref_build_qext" -G Ninja \
        -DCMAKE_BUILD_TYPE=Release -DBUILD_SHARED_LIBS=ON \
        -DOPUS_CUSTOM_MODES=ON -DENABLE_QEXT=ON \
        -DCMAKE_C_FLAGS="-DENABLE_QEXT" \
        -DOPUS_BUILD_PROGRAMS=ON > /dev/null
    cmake --build "$REPO/.ref_build_qext" -j"$(nproc)" \
        --target opus opus_demo > /dev/null
fi

# QEXT conformance comparator
if [ ! -f "$REPO/.ref_build_qext/qext_compare" ]; then
    gcc -O2 -o "$REPO/.ref_build_qext/qext_compare" \
        "$REF/src/qext_compare.c" -I"$REF/celt" -lm
fi

# NSQ oracle (silk_NSQ_c / silk_NSQ_del_dec_c with caller-driven state)
gcc -O2 -fPIC -shared -DVAR_ARRAYS \
    -I"$BUILD/oracle_inc" -I"$REF/include" -I"$REF/celt" -I"$REF/silk" \
    -I"$REF/silk/fixed" -I"$REF/src" \
    "$REPO/tools/nsq_oracle_shim.c" \
    -o "$BUILD/libnsq_oracle.so" \
    -L"$REPO/.ref_build_pic" -Wl,--whole-archive "$REPO/.ref_build_pic/libopus.a" \
    -Wl,--no-whole-archive -lm
