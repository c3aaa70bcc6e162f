"""Multi-device build: output must be invariant to the device count
(TPU analog of the reference's thread-count equivalence tests,
`/root/reference/tests/smoke/test_graph.py:59-121`)."""
import numpy as np
import pytest

import jax

from seqwin_tpu.engine.minimizer import scan_records_host
from seqwin_tpu.graph import build
from seqwin_tpu.parallel.distributed import build_distributed, make_mesh, sharded_scan


def _random_records(rng, sizes, n_frac=0.01):
    out = []
    for n in sizes:
        c = rng.integers(0, 4, size=n).astype(np.uint8)
        mask = rng.random(n) < n_frac
        c[mask] = 255
        out.append(c)
    return out


@pytest.mark.parametrize('n_dev', [1, 2, 8])
def test_sharded_scan_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(42)
    records = _random_records(rng, [700, 1200, 150, 950, 2000, 64, 800, 500, 300])
    k, w = 9, 12

    ref_oh, ref_pos, ref_rec = scan_records_host(records, k, w)
    mesh = make_mesh(n_dev)
    (m_oh, m_pos, m_rec), (r_oh, r_pos, r_rec) = sharded_scan(records, k, w, mesh)

    # raw streams equal the single-device scan exactly (global scan order)
    np.testing.assert_array_equal(r_oh, ref_oh)
    np.testing.assert_array_equal(r_pos, ref_pos)
    np.testing.assert_array_equal(r_rec, ref_rec)

    # merged = stable hash sort of the stream
    order = np.argsort(ref_oh, kind='stable')
    np.testing.assert_array_equal(m_oh, ref_oh[order])
    np.testing.assert_array_equal(m_pos, ref_pos[order])
    np.testing.assert_array_equal(m_rec, ref_rec[order])


def test_build_distributed_matches_build(fixture_paths):
    if len(jax.devices()) < 8:
        pytest.skip('not enough devices')
    targets = [True, True, False, False]
    ref = build(fixture_paths, 17, 10, targets)
    mesh = make_mesh(8)
    got = build_distributed(fixture_paths, 17, 10, targets, mesh=mesh)
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(a, b)
    assert ref[4] == got[4]


def test_multihost_partition_contiguous_and_balanced():
    from seqwin_tpu.parallel.multihost import partition_paths

    paths = [f'g{i}' for i in range(10)]
    sizes = [100, 50, 200, 10, 10, 300, 100, 100, 40, 90]
    parts = [partition_paths(paths, sizes, 3, pid) for pid in range(3)]
    # disjoint cover, contiguous
    flat = [p for part in parts for p in part]
    assert flat == paths
    for part in parts:
        idxs = [paths.index(p) for p in part]
        assert idxs == list(range(min(idxs), max(idxs) + 1)) if idxs else True
