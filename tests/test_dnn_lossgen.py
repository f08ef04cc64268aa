"""Loss generator tests (reference: dnn/lossgen.c)."""

import numpy as np

from opus_tpu.dnn import lossgen


def test_lossgen_mechanics():
    g = lossgen.LossGen(lossgen.random_model(1), seed=2)
    seq = [g.sample(0.2) for _ in range(200)]
    assert set(seq) <= {0, 1}
    assert g.used
    # deterministic given the same seed/model
    g2 = lossgen.LossGen(lossgen.random_model(1), seed=2)
    assert [g2.sample(0.2) for _ in range(200)] == seq
    # state carries across calls (bursty, not iid): last_loss feeds back
    assert g.last_loss in (0.0, 1)
