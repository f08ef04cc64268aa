"""End-to-end DRED integration tests (reference: ENABLE_DRED paths in
src/opus_encoder.c and src/opus_decoder.c).

Contract: an encoder with DRED enabled emits packets whose extension-126
payload our DRED decoder parses back to exactly the quantized latents;
the full recovery path (parse -> process -> deep-PLC synthesis) yields
audio.  Models are random (the released weights ship separately); the
bitstream layer is exercised for real."""

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.dnn import rdovae, dred as dredmod, plc as plcmod
from opus_tpu.dnn import pitchdnn as pdnn, fargan as fg
from opus_tpu.dnn.dred_dec import OpusDREDDecoder, dred_find_payload


def _speech(fs, seconds, seed=1):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    phase = np.cumsum(120 * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))) / fs
    return np.clip(
        0.25 * (np.sin(2 * np.pi * phase)
                + 0.5 * np.sin(4 * np.pi * phase))
        + 0.01 * rng.standard_normal(n), -1, 1)


@pytest.fixture(scope="module")
def models():
    return dict(enc=rdovae.random_enc_model(31),
                dec=rdovae.random_dec_model(32),
                stats=dredmod.random_stats(33),
                plc=plcmod.random_model(34),
                pitch=pdnn.random_model(35),
                fargan=fg.random_model(36))


def test_dred_packet_roundtrip(models):
    fs, frame = 16000, 320   # 20 ms at 16 kHz keeps the test quick
    enc = OpusEncoder(fs, 1, "voip")
    enc.set_bitrate(32000)
    enc.enable_dred(models["enc"], models["pitch"], models["stats"],
                    duration_frames_10ms=40)
    dec = OpusDecoder(fs, 1)
    ddec = OpusDREDDecoder(models["dec"], models["stats"])
    pcm = _speech(fs, 1.0)
    got_dred = 0
    for i in range(0, len(pcm) - frame + 1, frame):
        p = enc.encode(pcm[i:i + frame], frame)
        if not p:
            continue
        dec.decode(p)     # packets must stay decodable with DRED inside
        found = dred_find_payload(p)
        if found is None:
            continue
        got_dred += 1
        d, dred_end = ddec.parse(p, max_dred_samples=fs // 2, fs=fs)
        if d is None:
            continue
        assert d.process_stage == 1 and d.nb_latents >= 1
        d = ddec.process(d)
        assert d.process_stage == 2
        assert d.fec_features.shape == (4 * d.nb_latents, 20)
    assert got_dred >= 5, f"only {got_dred} packets carried DRED"


def test_dred_latent_exactness(models):
    """The decoder must recover exactly the encoder's quantized
    latents from the packet (range-coder symbol exactness)."""
    fs, frame = 16000, 320
    enc = OpusEncoder(fs, 1, "voip")
    enc.set_bitrate(32000)
    enc.enable_dred(models["enc"], models["pitch"], models["stats"],
                    duration_frames_10ms=20)
    ddec = OpusDREDDecoder(models["dec"], models["stats"])
    pcm = _speech(fs, 0.6, seed=2)
    last = None
    for i in range(0, len(pcm) - frame + 1, frame):
        p = enc.encode(pcm[i:i + frame], frame)
        if p and dred_find_payload(p) is not None:
            last = p
    assert last is not None
    d, _ = ddec.parse(last, max_dred_samples=fs // 2, fs=fs)
    assert d is not None
    stats = models["stats"]
    st = enc.dred
    # encoder latents buffer is newest-first; chunk k coded latents[2k]
    q0 = min(15, max(4, 51 - 3 * max(1, 32000 - 12000).bit_length()))
    for k in range(d.nb_latents):
        q_level = dredmod.compute_quantizer(q0, 5, 15, k)
        ql = dredmod.quantize_latents(st.latents[2 * k],
                                      stats.latent_scale[q_level],
                                      stats.latent_dead_zone[q_level])
        mask = (stats.latent_r[q_level] != 0) \
            & (stats.latent_p0[q_level] != 255)
        sc = stats.latent_scale[q_level].astype(np.float32)
        expect = np.where(mask, ql * 256.0 / np.maximum(sc, 1), 0.0)
        np.testing.assert_allclose(d.latents[k, :-1], expect, rtol=1e-6,
                                   err_msg=f"chunk {k}")


def test_dred_recovery_synthesis(models):
    fs, frame = 48000, 960
    enc = OpusEncoder(fs, 1, "voip")
    enc.set_bitrate(32000)
    enc.enable_dred(models["enc"], models["pitch"], models["stats"],
                    duration_frames_10ms=40)
    dec = OpusDecoder(fs, 1)
    dec.load_deep_plc(models["plc"], models["pitch"], models["fargan"])
    ddec = OpusDREDDecoder(models["dec"], models["stats"])
    pcm = _speech(fs, 0.8, seed=3)
    last = None
    for i in range(0, len(pcm) - frame + 1, frame):
        p = enc.encode(pcm[i:i + frame], frame)
        if p:
            dec.decode(p)
            if dred_find_payload(p) is not None:
                last = p
    assert last is not None
    d, _ = ddec.parse(last, max_dred_samples=fs // 2, fs=fs)
    d = ddec.process(d)
    out = dec.dred_decode(d, dred_offset=0, frame_size=frame)
    assert out.shape == (frame,) and out.dtype == np.int16
    assert np.isfinite(out.astype(np.float64)).all()
