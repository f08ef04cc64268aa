

def test_inband_fec_decode_parity(tmp_path):
    """decode_fec=True must decode the next packet's LBRR data bit-exact
    vs the reference opus_decode(..., decode_fec=1)
    (reference: opus_decode_native src/opus_decoder.c:800-834,
    silk lost_flag=FLAG_DECODE_LBRR :469)."""
    import ctypes
    import os
    import struct
    import subprocess
    import numpy as np
    import pytest
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.utils.soft_clip import float2int16
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    demo = os.path.join(repo, ".ref_build", "opus_demo")
    solib = os.path.join(repo, ".ref_build_qext", "libopus.so")
    if not (os.path.exists(demo) and os.path.exists(solib)):
        pytest.skip("reference builds missing")
    rng = np.random.default_rng(15)
    t = np.arange(48000 * 2) / 48000.0
    sig = (0.3 * np.sin(2 * np.pi * 280 * t)
           * (1 + 0.3 * np.sin(2 * np.pi * 2.5 * t))
           + 0.02 * rng.standard_normal(len(t)))
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e", "voip", "48000", "1", "32000",
                    "-inbandfec", "-loss", "20", str(inp), str(bit)],
                   check=True, capture_output=True)
    data = bit.read_bytes()
    pkts = []
    off = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkts.append(data[off:off + ln])
        off += ln
    # losses at arbitrary positions: FEC decodes LBRR when the next
    # packet carries it and falls back to (bit-matched) concealment
    # otherwise
    lost = [12, 20, 30, 44]
    lib = ctypes.CDLL(solib)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    rdec = lib.opus_decoder_create(48000, 1, ctypes.byref(err))
    dec = OpusDecoder(48000, 1)
    for i, p in enumerate(pkts):
        buf = (ctypes.c_int16 * 960)()
        if i in lost:   # lost: recover from the next packet's LBRR
            n = lib.opus_decode(ctypes.c_void_p(rdec), pkts[i + 1],
                                len(pkts[i + 1]), buf, 960, 1)
            ours = float2int16(dec.decode(pkts[i + 1], 960,
                                          decode_fec=True))
            assert n == 960
            ref = np.asarray(buf[:], np.int64)
            assert np.abs(ours.astype(np.int64) - ref).max() <= 1,                 f"FEC frame {i}"
        else:
            n = lib.opus_decode(ctypes.c_void_p(rdec), p, len(p),
                                buf, 960, 0)
            float2int16(dec.decode(p, 960))


def test_silk_plc_bit_exact_at_internal_rate(tmp_path):
    """SILK classic concealment (silk_PLC_conceal + CNG loss branch)
    must be bit-exact vs the reference when the API rate matches the
    internal rate (16 kHz WB), across isolated and burst losses."""
    import ctypes
    import os
    import struct
    import subprocess
    import numpy as np
    import pytest
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.utils.soft_clip import float2int16
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    demo = os.path.join(repo, ".ref_build", "opus_demo")
    solib = os.path.join(repo, ".ref_build_qext", "libopus.so")
    if not (os.path.exists(demo) and os.path.exists(solib)):
        pytest.skip("reference builds missing")
    rng = np.random.default_rng(33)
    fs = 48000
    t = np.arange(fs) / fs
    sig = (0.3 * np.sin(2 * np.pi * 280 * t)
           * (1 + 0.3 * np.sin(2 * np.pi * 2.5 * t))
           + 0.02 * rng.standard_normal(fs))
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e", "voip", "48000", "1", "24000",
                    str(inp), str(bit)], check=True, capture_output=True)
    data = bit.read_bytes()
    pkts = []
    off = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkts.append(data[off:off + ln])
        off += ln
    lib = ctypes.CDLL(solib)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    lost = {20, 21, 35}
    for api_fs, tol in ((16000, 0), (48000, 1)):
        fsz = api_fs // 50
        rdec = lib.opus_decoder_create(api_fs, 1, ctypes.byref(err))
        dec = OpusDecoder(api_fs, 1)
        for i, p in enumerate(pkts[:45]):
            buf = (ctypes.c_int16 * fsz)()
            if i in lost:
                n = lib.opus_decode(ctypes.c_void_p(rdec), None, 0, buf,
                                    fsz, 0)
                ours = float2int16(dec.decode(None, fsz))
            else:
                n = lib.opus_decode(ctypes.c_void_p(rdec), p, len(p),
                                    buf, fsz, 0)
                ours = float2int16(dec.decode(p, fsz))
            assert n == fsz
            ref = np.asarray(buf[:], np.int64)
            assert np.abs(ours.astype(np.int64) - ref).max() <= tol, \
                f"fs={api_fs} frame {i}"


def _demo_packets(tmp_path, sig, args):
    """Encode sig via the reference opus_demo; return the packet list."""
    import os
    import struct
    import subprocess
    import pytest
    from opus_tpu.utils.soft_clip import float2int16
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    demo = os.path.join(repo, ".ref_build", "opus_demo")
    solib = os.path.join(repo, ".ref_build_qext", "libopus.so")
    if not (os.path.exists(demo) and os.path.exists(solib)):
        pytest.skip("reference builds missing")
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e"] + args + [str(inp), str(bit)],
                   check=True, capture_output=True)
    data = bit.read_bytes()
    pkts = []
    off = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkts.append(data[off:off + ln])
        off += ln
    return pkts, solib


def _ref_decoder(solib, fs, ch):
    import ctypes
    lib = ctypes.CDLL(solib)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    return lib, lib.opus_decoder_create(fs, ch, ctypes.byref(err))


def test_dtx_toc_only_packet_routes_to_plc(tmp_path):
    """Packets whose frame payload is empty (TOC-only, as DTX emits) must
    run the PLC, not be range-decoded as data (reference: payloads of
    0/1 bytes trigger PLC, src/opus_decoder.c:316-321)."""
    import ctypes
    import numpy as np
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.utils.soft_clip import float2int16
    rng = np.random.default_rng(7)
    fs = 48000
    t = np.arange(fs) / fs
    sig = 0.3 * np.sin(2 * np.pi * 300 * t) + 0.02 * rng.standard_normal(fs)
    pkts, solib = _demo_packets(
        tmp_path, sig, ["restricted-lowdelay", "48000", "1", "64000"])
    lib, rdec = _ref_decoder(solib, fs, 1)
    dec = OpusDecoder(fs, 1)
    fsz = fs // 50
    for i, p in enumerate(pkts[:12]):
        stream = [p] if i % 4 != 3 else [p, p[:1]]  # inject TOC-only DTX
        for q in stream:
            buf = (ctypes.c_int16 * fsz)()
            n = lib.opus_decode(ctypes.c_void_p(rdec), q, len(q), buf,
                                fsz, 0)
            ours = float2int16(dec.decode(q, fsz))
            assert n == fsz
            ref = np.asarray(buf[:], np.int64)
            assert np.abs(ours.astype(np.int64) - ref).max() <= 2, \
                f"frame {i} len={len(q)}"
    # before any packet: TOC-only must yield silence and rangeFinal=0
    fresh = OpusDecoder(16000, 1)
    out = float2int16(fresh.decode(b"\x78"))
    assert not np.any(out)
    assert fresh.rangeFinal == 0


def test_long_loss_plc_parity(tmp_path):
    """PLC for losses > 20 ms must chunk concealment like the reference
    (src/opus_decoder.c:343-358) instead of returning silence."""
    import ctypes
    import numpy as np
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.utils.soft_clip import float2int16
    rng = np.random.default_rng(11)
    fs = 48000
    t = np.arange(fs) / fs
    sig = (0.3 * np.sin(2 * np.pi * 350 * t)
           * (1 + 0.3 * np.sin(2 * np.pi * 3.0 * t))
           + 0.02 * rng.standard_normal(fs))
    pkts, solib = _demo_packets(
        tmp_path, sig, ["restricted-lowdelay", "48000", "1", "64000"])
    lib, rdec = _ref_decoder(solib, fs, 1)
    dec = OpusDecoder(fs, 1)
    for p in pkts[:10]:
        buf = (ctypes.c_int16 * 960)()
        lib.opus_decode(ctypes.c_void_p(rdec), p, len(p), buf, 960, 0)
        float2int16(dec.decode(p, 960))
    for loss_ms in (40, 60):
        fsz = fs * loss_ms // 1000
        buf = (ctypes.c_int16 * fsz)()
        n = lib.opus_decode(ctypes.c_void_p(rdec), None, 0, buf, fsz, 0)
        ours = float2int16(dec.decode(None, fsz))
        assert n == fsz
        ref = np.asarray(buf[:], np.int64)
        assert np.any(ref != 0) and np.any(ours != 0)
        assert np.abs(ours.astype(np.int64) - ref).max() <= 2, loss_ms
    # stream must continue cleanly after the long loss
    buf = (ctypes.c_int16 * 960)()
    p = pkts[10]
    lib.opus_decode(ctypes.c_void_p(rdec), p, len(p), buf, 960, 0)
    ours = float2int16(dec.decode(p, 960))
    ref = np.asarray(buf[:], np.int64)
    assert np.abs(ours.astype(np.int64) - ref).max() <= 2


def test_lbrr_encode_fec_burst_parity():
    """Our encoder's in-band FEC (LBRR) streams must decode bit-exactly
    in the reference decoder, including FEC recovery after burst losses
    (encoder: silk_LBRR_encode_FLP encode_frame_FLP.c:361 + emission
    enc_API.c:363-405; decoder: opus_decode_native FEC branch
    src/opus_decoder.c:800-834).  Also regression-tests the rounded
    MUL32_FRAC_Q in silk_LPC_inverse_pred_gain (LPC_inv_pred_gain.c:60),
    which only shows up in consecutive-concealment state."""
    import ctypes
    import os
    import numpy as np
    import pytest
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    solib = os.path.join(repo, ".ref_build", "libopus_full.so")
    if not os.path.exists(solib):
        pytest.skip("reference build missing")
    lib = ctypes.CDLL(solib)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int16),
                                ctypes.c_int, ctypes.c_int]
    err = ctypes.c_int()
    fs = 16000
    rng = np.random.default_rng(7)
    t = np.arange(fs * 2) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    sig = np.clip(0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
                  * (0.4 + 0.6 * (np.sin(2 * np.pi * 1.3 * t) > 0))
                  + 0.02 * rng.standard_normal(len(t)), -1, 1)
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(24000)
    enc.set_inband_fec(True)
    enc.set_packet_loss_perc(20)
    n = fs // 50
    pkts = [enc.encode(sig[i * n:(i + 1) * n], n)
            for i in range(len(sig) // n)]
    # at 24 kb/s with 20% loss the FEC decision must actually code LBRR
    assert enc.lbrr_coded

    rdec = lib.opus_decoder_create(fs, 1, ctypes.byref(err))
    ours = OpusDecoder(fs, 1)
    buf = (ctypes.c_int16 * n)()
    lost = {13, 27, 28, 60, 61, 62, 75}   # isolated + bursts of 2 and 3
    nfec = 0
    for i, p in enumerate(pkts):
        if i in lost and i + 1 < len(pkts) and (i + 1) not in lost:
            o = ours.decode_int16(pkts[i + 1], n, decode_fec=True)
            lib.opus_decode(rdec, pkts[i + 1], len(pkts[i + 1]),
                            buf, n, 1)
            nfec += 1
        elif i in lost:
            o = ours.decode_int16(None, n)
            lib.opus_decode(rdec, None, 0, buf, n, 0)
        else:
            o = ours.decode_int16(p, n)
            lib.opus_decode(rdec, p, len(p), buf, n, 0)
        ref = np.ctypeslib.as_array(buf)[:n]
        assert np.array_equal(o.astype(int), ref.astype(int)), f"pkt {i}"
    assert nfec >= 3
