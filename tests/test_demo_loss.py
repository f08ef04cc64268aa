"""opus_demo loss-simulation options (-loss/-lossfile/-inbandfec),
mirroring the reference demo channel (src/opus_demo.c:143-154)."""

import numpy as np

from opus_tpu.tools import opus_demo


def _make_stream(tmp_path, fs=16000, seconds=0.6, fec=False):
    rng = np.random.default_rng(1)
    t = np.arange(int(fs * seconds)) / fs
    sig = np.clip(0.3 * np.sin(2 * np.pi * 220 * t)
                  + 0.02 * rng.standard_normal(len(t)), -1, 1)
    inp = tmp_path / "in.pcm"
    np.clip(np.floor(sig * 32768 + .5), -32768,
            32767).astype("<i2").tofile(inp)
    bit = tmp_path / "o.bit"
    args = ["-e", "voip", str(fs), "1", "24000"]
    if fec:
        args += ["-inbandfec", "-loss", "20"]
    args += [str(inp), str(bit)]
    assert opus_demo.main(args) == 0
    return inp, bit


def test_decode_with_iid_loss(tmp_path):
    inp, bit = _make_stream(tmp_path)
    out = tmp_path / "out.pcm"
    assert opus_demo.main(["-d", "-loss", "30", "16000", "1",
                           str(bit), str(out)]) == 0
    pcm = np.fromfile(out, "<i2")
    assert len(pcm) == 16000 * 6 // 10
    assert np.all(np.isfinite(pcm.astype(np.float64)))


def test_decode_with_lossfile_and_fec(tmp_path):
    inp, bit = _make_stream(tmp_path, fec=True)
    lf = tmp_path / "loss.txt"
    lf.write_text("0\n0\n0\n1\n0\n1\n1\n0\n")
    out = tmp_path / "out.pcm"
    assert opus_demo.main(["-d", "-lossfile", str(lf), "-inbandfec",
                           "16000", "1", str(bit), str(out)]) == 0
    pcm = np.fromfile(out, "<i2")
    assert len(pcm) == 16000 * 6 // 10

    # lossfile pattern must change the output vs clean decode
    clean = tmp_path / "clean.pcm"
    assert opus_demo.main(["-d", "16000", "1", str(bit),
                           str(clean)]) == 0
    assert not np.array_equal(pcm, np.fromfile(clean, "<i2"))


def test_decode_clean_matches_final_range(tmp_path):
    inp, bit = _make_stream(tmp_path, fec=True)
    out = tmp_path / "out.pcm"
    # rc 0 means every packet kept encoder/decoder final-range agreement
    assert opus_demo.main(["-d", "16000", "1", str(bit),
                           str(out)]) == 0
