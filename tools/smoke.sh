#!/bin/sh
# Smoke tier: the load-bearing differential gates in < 15 min on a
# warm compile cache (tests/conftest.py persists XLA-CPU compiles under
# .jax_cache, so the first run pays compile cost once per machine).
#
#   sh tools/smoke.sh            # run the smoke tier
#
# Coverage: entropy layer (scalar + vectorized + kernel-form range
# coders), one compiled fused decode path end-to-end (CELT 2.5 ms:
# packets -> PCM in one jit), the fused SILK decoder, the fused CELT
# encoder's numpy twin (reference-decodable streams + final_range
# parity), the tracked-config int16 parity gate, and the hybrid fused
# decoder.  The full suite stays the merge gate; this is the
# edit-compile-test loop tier.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest -x -q \
    tests/test_range_coder.py \
    tests/test_rc_kernel.py \
    tests/test_range_vec.py \
    tests/test_celt_dec_fused.py \
    tests/test_celt_enc_fused_np.py \
    tests/test_fused_silk_dec.py \
    tests/test_hybrid_dec_fused.py \
    tests/test_tracked_configs.py \
    "$@"
