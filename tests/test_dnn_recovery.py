"""Batched neural loss-recovery pipeline (tracked config 5): DRED
payloads from the real encoder -> one fused device program (RDOVAE
decode + FARGAN cont + synthesis) -> concealment PCM, exact vs the
per-stream scalar composition of the same stages (reference chain:
src/opus_decoder.c:1551/1588/735-760 + dnn/fargan.c:142/200)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.dnn_recovery import (BatchedDREDRecovery,
                                          parse_batch, playback_rows)
from opus_tpu.dnn import dred as dredmod, fargan as fg, rdovae
from opus_tpu.dnn import pitchdnn as pdnn


def _speech(fs, seconds, seed):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 100 + 40 * (seed % 3)
    phase = np.cumsum(f0 * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))) / fs
    return np.clip(
        0.25 * (np.sin(2 * np.pi * phase)
                + 0.5 * np.sin(4 * np.pi * phase))
        + 0.01 * rng.standard_normal(n), -1, 1)


@pytest.fixture(scope="module")
def models():
    return dict(enc=rdovae.random_enc_model(41),
                dec=rdovae.random_dec_model(42),
                stats=dredmod.random_stats(43),
                pitch=pdnn.random_model(45),
                fargan=fg.random_model(46))


@pytest.fixture(scope="module")
def dred_packets(models):
    """Real DRED-bearing packets from B independent encoder streams."""
    fs, frame = 16000, 320
    packets = []
    for s in range(4):
        enc = OpusEncoder(fs, 1, "voip")
        enc.set_bitrate(32000)
        enc.enable_dred(models["enc"], models["pitch"],
                        models["stats"], duration_frames_10ms=24)
        pcm = _speech(fs, 1.0, seed=s + 1)
        last = None
        for i in range(len(pcm) // frame):
            p = enc.encode(pcm[i * frame:(i + 1) * frame], frame)
            if len(p) > 2:
                last = p
        assert last is not None
        packets.append(last)
    return packets


def test_parse_batch_matches_scalar(models, dred_packets):
    from opus_tpu.dnn.dred_dec import OpusDREDDecoder
    parsed = parse_batch(models["stats"], dred_packets,
                         max_dred_samples=16000, fs=16000)
    ddec = OpusDREDDecoder(models["dec"], models["stats"])
    n_with = 0
    for i, data in enumerate(dred_packets):
        d, _ = ddec.parse(data, 16000, 16000)
        if d is None:
            assert not parsed.has_dred[i]
            continue
        n_with += 1
        assert parsed.has_dred[i]
        assert parsed.nb_latents[i] == d.nb_latents
        assert parsed.dred_offset[i] == d.dred_offset
        np.testing.assert_array_equal(parsed.state0[i], d.state)
        np.testing.assert_array_equal(
            parsed.latents[:d.nb_latents, i], d.latents)
        assert not parsed.latents[d.nb_latents:, i].any()
    assert n_with >= 2      # the fixture must actually exercise DRED


def _feed_dred_fec_rows(dred_offset, nb_latents, loss_off_frames,
                        n_frames):
    """Independent transliteration of the reference row schedule
    (feed_dred_fec, src/opus_decoder.c:752) with init_frames == 2
    (blend == 0), extended to the 5 fargan_cont priming frames by the
    same formula.  Deliberately does NOT call playback_rows so the
    parity test below actually checks the pipeline's index math."""
    hi = 4 * nb_latents - 1

    def row(i):
        # feature_offset = init_frames - i - 2
        #                  + floor((loss_samples + d*F10/4)/F10)
        f10 = 160
        off = 2 - i - 2 + int(np.floor(
            (loss_off_frames * f10 + dred_offset * f10 / 4) / f10))
        return off if 0 <= off <= hi else -1

    # i = 0, 1 are the two init rows; i = 2 + t plays frame t.  The
    # five cont rows (oldest first) are i = -3..1.
    cont = [row(i) for i in range(-3, 2)]
    play = [row(2 + t) for t in range(n_frames)]
    return np.asarray(cont, np.int32), np.asarray(play, np.int32)


def test_batched_recovery_matches_scalar(models, dred_packets):
    fs, n_frames = 16000, 6
    b = len(dred_packets)
    parsed = parse_batch(models["stats"], dred_packets, fs, fs)
    rng = np.random.default_rng(7)
    pcm0 = np.clip(0.2 * rng.standard_normal((b, 320)),
                   -1, 1).astype(np.float32)
    loss_off = np.array([2 + (i % 3) for i in range(b)], np.int32)

    pipe = BatchedDREDRecovery(models["dec"], models["stats"],
                               models["fargan"])
    out = np.asarray(pipe.recover(parsed, pcm0, loss_off, n_frames))
    assert out.shape == (b, n_frames * 160)
    assert np.isfinite(out).all()

    # the schedule must route REAL decoded rows (not only the -1 zero
    # rows) for these offsets, and must match the reference row logic
    cont_idx, play_idx = playback_rows(parsed, loss_off, n_frames)
    n_real = 0
    for i in range(b):
        if not parsed.has_dred[i]:
            continue
        cont_ref, play_ref = _feed_dred_fec_rows(
            int(parsed.dred_offset[i]), int(parsed.nb_latents[i]),
            int(loss_off[i]), n_frames)
        np.testing.assert_array_equal(play_idx[i], play_ref)
        np.testing.assert_array_equal(cont_idx[i], cont_ref)
        n_real += int((play_ref >= 0).sum() > 0)
    assert n_real >= 2, "fixture must exercise real DRED playback rows"

    # scalar composition, one stream at a time through the SAME
    # public single-stream primitives, with independently derived rows
    for i in range(b):
        if parsed.has_dred[i]:
            cont_i, play_i = _feed_dred_fec_rows(
                int(parsed.dred_offset[i]), int(parsed.nb_latents[i]),
                int(loss_off[i]), n_frames)
        else:
            cont_i = np.full(5, -1, np.int32)
            play_i = np.full(n_frames, -1, np.int32)
        cont_idx_i, play_idx_i = cont_i, play_i
        feats = np.asarray(rdovae.decode_all(
            models["dec"], jnp.asarray(parsed.state0[i]),
            jnp.asarray(parsed.latents[:, i])))
        zrow = np.zeros(rdovae.DRED_NUM_FEATURES, np.float32)
        f_cont = np.stack([feats[r] if r >= 0 else zrow
                           for r in cont_idx_i])
        st = fg.init_state(())
        st = fg.cont(models["fargan"], st, jnp.asarray(pcm0[i]),
                     jnp.asarray(f_cont))
        chunks = []
        for t in range(n_frames):
            r = play_idx_i[t]
            f = feats[r] if r >= 0 else zrow
            st, p = fg.synthesize_frame(models["fargan"], st,
                                        jnp.asarray(f))
            chunks.append(np.asarray(p))
        ref = np.concatenate(chunks)
        np.testing.assert_allclose(out[i], ref, rtol=2e-4, atol=2e-5)


def test_playback_rows_no_dred_streams(models, dred_packets):
    """A stream with no DRED payload gets all-(-1) schedules (zero
    features), not garbage indices."""
    packets = [dred_packets[0], None]
    parsed = parse_batch(models["stats"], packets, 16000, 16000)
    assert not parsed.has_dred[1]
    cont_idx, play_idx = playback_rows(
        parsed, np.array([2, 2], np.int32), 4)
    assert (play_idx[1] == -1).all() and (cont_idx[1] == -1).all()
