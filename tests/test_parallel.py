"""Sharding tests on the virtual 8-device CPU mesh + batched-vs-scalar
synthesis equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from opus_tpu.models.batched_celt import synthesis_step, init_state
from opus_tpu.celt.decoder import CeltDecoder, DECODE_BUFFER_SIZE
from opus_tpu.celt.modes import mode_create


def test_batched_synthesis_matches_scalar_decoder():
    mode = mode_create(48000, 960)
    rs = np.random.RandomState(0)
    bt = 4
    st = init_state(bt)
    dec = CeltDecoder.create(48000, 1)
    nb = mode.nbEBands
    n = 960
    ov = mode.overlap
    for _ in range(4):
        x = rs.randn(bt, n).astype(np.float32)
        log_e = (2 * rs.randn(bt, nb)).astype(np.float32)
        pcm_b, st = synthesis_step(jnp.asarray(x), jnp.asarray(log_e), st)
        buf = dec.decode_mem[0]
        buf[:DECODE_BUFFER_SIZE - n + ov] = buf[n:DECODE_BUFFER_SIZE + ov]
        dec._synthesis(x[0].astype(np.float64),
                       np.concatenate([log_e[0], log_e[0]]),
                       0, 21, 1, 1, False, 3, 0)
        out = np.zeros(n)
        dec._deemphasis(out, DECODE_BUFFER_SIZE - n, n, 1, False)
        np.testing.assert_allclose(np.asarray(pcm_b)[0], out, atol=2e-5)


def test_dryrun_multichip_8dev():
    assert len(jax.devices()) >= 8
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    pcm, state = jax.jit(fn)(*args)
    assert pcm.shape[0] == args[0].shape[0]
    assert np.all(np.isfinite(np.asarray(pcm)))
