"""Vectorized host builder (`ops/host_build.py`) vs the per-position oracle.

The vec builder backs `backend='numpy'` (and the 171-genome golden gate,
where the oracle's Python loops are impractical); this differential fuzz is
the link in the exactness chain: device engine == vec builder == oracle ==
btllib-simulation (`test_engine.py`).
"""
import numpy as np
import pytest

from seqwin_tpu.ops.host_build import build_graph_vec, minimize_record
from seqwin_tpu.ops.oracle import build_graph as oracle_build
from seqwin_tpu.ops.oracle import minimize as oracle_minimize


@pytest.mark.parametrize('seed', range(12))
def test_build_graph_vec_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 24))
    w = int(rng.integers(1, 40))
    seqs, tgts = [], []
    for _ in range(int(rng.integers(1, 5))):
        recs = []
        for _ in range(int(rng.integers(1, 3))):
            n = int(rng.integers(1, 600))
            c = rng.integers(0, 4, size=n).astype(np.uint8)
            c[rng.integers(0, n, size=int(rng.integers(0, max(1, n // 10))))] = 255
            recs.append(c)
        seqs.append(recs)
        tgts.append(bool(rng.integers(0, 2)))

    a_k, a_n, a_e, a_o = oracle_build(seqs, k, w, tgts)
    b_k, b_n, b_e, b_o = build_graph_vec(seqs, k, w, tgts)
    np.testing.assert_array_equal(a_o, b_o)
    np.testing.assert_array_equal(a_k, b_k)
    for f in a_n.dtype.names:
        np.testing.assert_array_equal(a_n[f], b_n[f])
    np.testing.assert_array_equal(a_e, b_e)


@pytest.mark.parametrize('k,w', [(5, 1), (7, 3), (21, 200), (31, 512), (3, 700)])
def test_minimize_record_matches_oracle(k, w):
    rng = np.random.default_rng(k * 1000 + w)
    n = 4000
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    c[rng.integers(0, n, size=40)] = 255
    expected = oracle_minimize(c, k, w)
    oh, pos = minimize_record(c, k, w)
    assert [(o, p) for o, p in zip(oh.tolist(), pos.tolist())] == \
        [(o, p) for _, o, p in expected]
