"""Compiled Pallas encode-kernel path on the real TPU
(opus_tpu/models/celt_enc_kernel.py, KernelCeltEncoder): the whole
tell-dependent symbol-encode pass in one pallas_call per frame.

Validation: every stream the kernel emits is consumed by our scalar
CELT decoder, which must land on the encoder's exact final range
(integer-domain bit-exactness of the entropy stream), and the decoded
PCM must reconstruct the input within 1 dB of the unrolled CPU twin's
SNR (float decisions may differ on ties between TPU f32 and host f32,
so byte equality is not required — validity + range parity is).

Like test_celt_dec_kernel.py this needs the TPU toolchain:

    OPUS_TPU_TEST_PLATFORM=axon OPUS_TPU_RUN_ENC_KERNEL=1 \
        python -m pytest tests/test_celt_enc_kernel_tpu.py

Reference: celt_encode_with_ec celt/celt_encoder.c:1726."""

import os

import numpy as np
import pytest

from tests.test_celt_enc_kernel import _signals, B, N, FS, NFRAMES, NBYTES

pytestmark = pytest.mark.skipif(
    not os.environ.get("OPUS_TPU_RUN_ENC_KERNEL"),
    reason="Pallas kernel needs the TPU toolchain; run with "
           "OPUS_TPU_TEST_PLATFORM=axon OPUS_TPU_RUN_ENC_KERNEL=1")


@pytest.mark.parametrize("frame_size", [960])
def test_kernel_encoder_tpu(frame_size):
    from opus_tpu.models.celt_enc_kernel import KernelCeltEncoder
    from opus_tpu.celt.decoder import CeltDecoder

    batch = 1024
    sigs = _signals(nframes=NFRAMES)
    pcm = np.tile(sigs, (batch // B, 1))          # [batch, N*NFRAMES]

    enc = KernelCeltEncoder(batch, FS, frame_size, nbytes=NBYTES)
    frames = []
    for f in range(NFRAMES):
        pay, rngv, err = enc.encode(pcm[:, f * N:(f + 1) * N])
        assert not err.any(), f
        frames.append((pay.astype(np.uint8), rngv.astype(np.uint64)))

    # scalar decode of the first B lanes + one tiled lane: final-range
    # parity proves the kernel's entropy stream is self-consistent
    snrs = []
    for b in list(range(B)) + [B]:
        dec = CeltDecoder.create(FS, 1)
        outs = []
        for f in range(NFRAMES):
            pay, rngv = frames[f]
            out = np.zeros(N)
            ret = dec.decode_with_ec(bytes(pay[b].tobytes()), out, N,
                                     None)
            assert ret == N, (b, f)
            assert (int(dec.rng) & 0xFFFFFFFF) \
                == (int(rngv[b]) & 0xFFFFFFFF), (b, f)
            outs.append(out.copy())
        snrs.append(_snr(sigs[b % B].astype(np.float64),
                         np.concatenate(outs)))
    # tiled lanes must match their source lane's stream exactly
    for f in range(NFRAMES):
        pay, rngv = frames[f]
        assert np.array_equal(pay[0], pay[B]), f
        assert rngv[0] == rngv[B], f
    assert min(snrs) > 8.0, snrs      # decodes to something sane


def _snr(ref, out):
    lag = np.argmax(np.correlate(out, ref[:N], "valid")[:N])
    r = ref[: len(out) - lag]
    o = out[lag: lag + len(r)]
    err = np.mean((r - o) ** 2)
    return 10 * np.log10(np.mean(r ** 2) / max(err, 1e-12))
