"""Training-data generator: the dump_data twin (reference:
dnn/dump_data.c) producing (features, pcm) pairs for vocoder/feature
model training from 16 kHz speech, with the reference's augmentation
pipeline — random spectral-response biquads, HP filter, per-sequence
speech/noise gains with the reference distributions, weighted-RMS
level normalization, optional clipping and 16-bit quantization — in
vectorized numpy with a seeded generator instead of C rand().

Outputs match the reference formats: features as float32
[T, NB_TOTAL_FEATURES], PCM as int16 delayed by half a frame so the
features are centered on the frames (dump_data.c:470).
"""

from __future__ import annotations

import numpy as np

from ..dnn import features as FE
from ..dnn import pitchdnn as pdnn

FRAME_SIZE = 160
SEQUENCE_LENGTH = 2000
NB_TOTAL_FEATURES = 36
TRAINING_OFFSET = 80           # FRAME_SIZE - TRAINING_OFFSET shift
PREEMPHASIS = 0.85

_A_HP = (-1.99599, 0.99600)    # dump_data.c:243
_B_HP = (-2.0, 1.0)
_WEIGHT_B = (-2.0, 1.0)        # weighted_rms (dump_data.c:217)
_WEIGHT_A = (-1.89, 0.895)


def biquad(x: np.ndarray, b, a) -> np.ndarray:
    """Direct-form-II biquad matching dump_data.c:168 (zero state)."""
    y = np.empty_like(x, dtype=np.float64)
    m0 = m1 = 0.0
    for i in range(len(x)):
        xi = float(x[i])
        yi = xi + m0
        m0 = m1 + (b[0] * xi - a[0] * yi)
        m1 = b[1] * xi - a[1] * yi
        y[i] = yi
    return y


def rand_filt(rng) -> tuple[float, float]:
    """One random 2nd-order response (dump_data.c rand_filt)."""
    if rng.integers(0, 3) != 0:
        return (0.0, 0.0)
    if rng.random() - 0.5 > 0:
        r = rng.random()
        r = 0.7 * r * r
        theta = rng.random()
        theta = np.pi * theta * theta
        return (-2 * r * np.cos(theta), r * r)
    r0 = 1.4 * (rng.random() - 0.5)
    r1 = 1.4 * (rng.random() - 0.5)
    return (-r0 - r1, r0 * r1)


def weighted_rms(x: np.ndarray) -> float:
    tmp = biquad(x, _WEIGHT_B, _WEIGHT_A)
    return 0.9506 * np.sqrt((tmp * tmp).mean() + 1e-15 / len(x))


def augment_sequence(speech: np.ndarray, noise: np.ndarray | None,
                     rng) -> np.ndarray:
    """One training sequence of augmentation (dump_data.c:348-447):
    speech/noise int16-valued float arrays of equal length."""
    x = np.asarray(speech, np.float64).copy()
    n = np.zeros_like(x) if noise is None \
        else np.asarray(noise, np.float64).copy()

    speech_gain = 10.0 ** ((-30 + int(rng.integers(0, 40))) / 20.0)
    if rng.integers(0, 2):
        speech_gain = -speech_gain
    if rng.integers(0, 20) == 0:
        speech_gain *= 0.01
    if rng.integers(0, 100) == 0:
        speech_gain = 0.0
    noise_gain = 10.0 ** ((-40 + 25 * rng.random()
                           + 15 * rng.random()) / 20.0)
    if rng.integers(0, 2) != 0:
        noise_gain = 0.0
    noise_gain *= speech_gain

    a_noise = rand_filt(rng)
    b_noise = rand_filt(rng)
    a_sig = rand_filt(rng)
    b_sig = rand_filt(rng)

    x = biquad(x, _B_HP, _A_HP)
    x = biquad(x, b_sig, a_sig)
    n = biquad(n, _B_HP, _A_HP)
    n = biquad(n, b_noise, a_noise)

    speech_gain *= 3000.0 / (1.0 + weighted_rms(x))
    noise_gain *= 3000.0 / (1.0 + weighted_rms(n))
    xn = x * speech_gain + n * noise_gain

    if rng.integers(0, 4) == 0:
        xn = np.clip(xn, -32767.0, 32767.0)
    if rng.integers(0, 2) == 0:
        xn = np.floor(0.5 + xn)
    return xn


def dump_features(xn: np.ndarray, burg: bool = False):
    """Feature + delayed-PCM extraction loop (dump_data.c:461-488).

    Returns (features [T, 36] f32 — or [T, 36+36] with the Burg
    cepstra prepended when burg=True — and pcm int16 [T*160])."""
    nframes = len(xn) // FRAME_SIZE
    st = FE.init_state()
    model = pdnn.random_model(0)
    feats = []
    pcm = np.zeros(nframes * FRAME_SIZE, np.int16)
    mem_preemph = 0.0
    prev_tail = np.zeros(TRAINING_OFFSET)
    for t in range(nframes):
        xf = xn[t * FRAME_SIZE:(t + 1) * FRAME_SIZE].astype(np.float64)
        row = []
        if burg:
            row.append(FE.burg_cepstral_analysis(xf))
        st, f36 = FE.compute_frame_features(st, xf, model)
        row.append(np.asarray(f36, np.float32))
        feats.append(np.concatenate(row))
        # preemphasized PCM delayed by half a frame (dump_data.c:468)
        pre = np.empty(FRAME_SIZE)
        m = mem_preemph
        for i in range(FRAME_SIZE):
            pre[i] = xf[i] + m
            m = -PREEMPHASIS * xf[i]
        mem_preemph = m
        quant = np.clip(np.floor(0.5 + pre), -32767, 32767)
        pcm[t * FRAME_SIZE:t * FRAME_SIZE + TRAINING_OFFSET] = prev_tail
        pcm[t * FRAME_SIZE + TRAINING_OFFSET:(t + 1) * FRAME_SIZE] = \
            quant[:FRAME_SIZE - TRAINING_OFFSET]
        prev_tail = quant[FRAME_SIZE - TRAINING_OFFSET:]
    return np.stack(feats), pcm


def dump_data(speech: np.ndarray, noise: np.ndarray | None = None,
              seed: int = 0, train: bool = True, burg: bool = False,
              sequence_length: int = SEQUENCE_LENGTH):
    """Full generator: yields (features, pcm) per sequence (the
    -train/-test modes of dump_data.c)."""
    rng = np.random.default_rng(seed)
    seq_samples = sequence_length * FRAME_SIZE
    speech = np.asarray(speech)
    nseq = len(speech) // seq_samples
    for s in range(nseq):
        chunk = speech[s * seq_samples:(s + 1) * seq_samples]
        if train:
            if noise is not None and len(noise) >= seq_samples:
                pos = int(rng.integers(0, len(noise) - seq_samples + 1))
                nz = noise[pos:pos + seq_samples]
            else:
                nz = None
            xn = augment_sequence(chunk, nz, rng)
            # random sequence truncation (dump_data.c:459)
            length = min(sequence_length, sequence_length // 2
                         + int(rng.integers(0, sequence_length // 2 + 1)))
            xn = xn[:length * FRAME_SIZE]
        else:
            xn = np.asarray(chunk, np.float64)
        yield dump_features(xn, burg=burg)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="dump_data twin: features + pcm training pairs")
    p.add_argument("--train", action="store_true")
    p.add_argument("--burg", action="store_true")
    p.add_argument("--noise")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("speech", help="16 kHz s16le raw input")
    p.add_argument("features_out")
    p.add_argument("pcm_out", nargs="?")
    args = p.parse_args(argv)

    speech = np.fromfile(args.speech, np.int16)
    noise = np.fromfile(args.noise, np.int16) if args.noise else None
    ffeat = open(args.features_out, "wb")
    fpcm = open(args.pcm_out, "wb") if args.pcm_out else None
    for feats, pcm in dump_data(speech, noise, seed=args.seed,
                                train=args.train, burg=args.burg):
        feats.astype(np.float32).tofile(ffeat)
        if fpcm:
            pcm.tofile(fpcm)
    ffeat.close()
    if fpcm:
        fpcm.close()


if __name__ == "__main__":
    main()
