"""Fused Pallas scan kernel vs the XLA phase-1 reference (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from seqwin_tpu.engine import hybrid
from seqwin_tpu.engine.pallas_scan import HALO_FETCH, pallas_phase1, phase1_shapes


def _layout(records, k, w, tb=128):
    total = sum(len(c) for c in records) + w  # records start at offset w
    rtotal, n = phase1_shapes(total, k, w, tb)
    codes = np.full(n, 255, dtype=np.uint8)
    starts = []
    off = w
    for c in records:
        codes[off:off + len(c)] = c
        starts.append(off)
        off += len(c)
    aug = codes.copy()
    for s in starts:
        aug[s] |= 64
    return codes, aug.reshape(rtotal, w), np.array(starts, np.int64), n


def _xla_ref(codes, starts, k, w, n):
    scap = 1 << max(6, (len(starts)).bit_length())
    starts_a = np.full(scap, n, dtype=np.int32)
    starts_a[:len(starts)] = starts
    z, canon = hybrid.scan_phase1(jnp.asarray(codes), jnp.asarray(starts_a), k, w)
    return np.asarray(z), np.asarray(canon)


@pytest.mark.parametrize('k,w', [(7, 10), (21, 200), (4, 3), (1, 4), (31, 16), (5, 128)])
def test_pallas_phase1_matches_xla(k, w):
    rng = np.random.default_rng(k * 7 + w)
    records = []
    for n_rec, frac in [(900, 0.0), (2500, 0.02), (40, 0.0), (1300, 0.1)]:
        c = rng.integers(0, 4, size=n_rec).astype(np.uint8)
        c[rng.random(n_rec) < frac] = 255
        records.append(c)
    codes, aug2d, starts, n = _layout(records, k, w)
    z_ref, canon_ref = _xla_ref(codes, starts, k, w, n)
    z, lo, hi = pallas_phase1(aug2d, k, w, interpret=True)
    z = np.asarray(z)
    canon = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
    # the pallas output omits the trailing halo rows (pure padding)
    m = len(z)
    assert np.all(z_ref[m:] == -1)
    np.testing.assert_array_equal(z, z_ref[:m])
    sel = z_ref[:m] >= 0
    candidates = np.unique(z_ref[:m][sel])
    np.testing.assert_array_equal(canon[candidates], canon_ref[candidates])


def test_pallas_phase1_all_clean_long():
    k, w = 21, 64
    rng = np.random.default_rng(0)
    records = [rng.integers(0, 4, size=60_000).astype(np.uint8)]
    codes, aug2d, starts, n = _layout(records, k, w)
    z_ref, canon_ref = _xla_ref(codes, starts, k, w, n)
    z, lo, hi = pallas_phase1(aug2d, k, w, interpret=True)
    z = np.asarray(z)
    np.testing.assert_array_equal(z, z_ref[:len(z)])
    assert np.all(z_ref[len(z):] == -1)
