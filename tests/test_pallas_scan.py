"""Fused Pallas scan kernel vs the XLA phase-1 reference (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from seqwin_tpu.engine import hybrid
from seqwin_tpu.engine.pallas_scan import L, pallas_phase1, phase1_shapes


def _layout(records, k, w):
    total = sum(len(c) for c in records)
    rtotal, n, offset = phase1_shapes(total, k, w)
    codes = np.full(n, 255, dtype=np.uint8)
    starts = []
    off = offset
    for c in records:
        codes[off:off + len(c)] = c
        starts.append(off)
        off += len(c)
    for s in starts:
        codes[s] |= 64
    return codes.reshape(rtotal, L), np.array(starts, np.int64), n


def _xla_ref(aug_codes_flat, k, w):
    z, c_lo, c_hi = hybrid.scan_phase1(jnp.asarray(aug_codes_flat), k, w)
    canon = np.asarray(c_lo).astype(np.uint64) | (
        np.asarray(c_hi).astype(np.uint64) << np.uint64(32))
    return np.asarray(z), canon


@pytest.mark.parametrize('k,w', [(7, 10), (21, 200), (4, 3), (1, 4), (31, 16), (5, 128), (9, 1), (13, 256)])
def test_pallas_phase1_matches_xla(k, w):
    rng = np.random.default_rng(k * 7 + w)
    records = []
    for n_rec, frac in [(900, 0.0), (2500, 0.02), (40, 0.0), (1300, 0.1)]:
        c = rng.integers(0, 4, size=n_rec).astype(np.uint8)
        c[rng.random(n_rec) < frac] = 255
        records.append(c)
    aug2d, starts, n = _layout(records, k, w)
    z_ref, canon_ref = _xla_ref(aug2d.reshape(-1), k, w)
    z, lo, hi = pallas_phase1(aug2d, k, w, interpret=True)
    z = np.asarray(z)
    canon = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(z, z_ref)
    sel = z_ref >= 0
    candidates = np.unique(z_ref[sel]).astype(np.int64)
    np.testing.assert_array_equal(canon[candidates], canon_ref[candidates])


def test_pallas_phase1_all_clean_long():
    k, w = 21, 64
    rng = np.random.default_rng(0)
    records = [rng.integers(0, 4, size=60_000).astype(np.uint8)]
    aug2d, starts, n = _layout(records, k, w)
    z_ref, _ = _xla_ref(aug2d.reshape(-1), k, w)
    z, lo, hi = pallas_phase1(aug2d, k, w, interpret=True)
    np.testing.assert_array_equal(np.asarray(z), z_ref)


@pytest.mark.parametrize('k,w', [(7, 10), (21, 200), (13, 256)])
@pytest.mark.parametrize('out', ['z', 'pfx'])
def test_pallas_roll_variant_matches_default(k, w, out):
    """SEQWIN_TPU_ROLL lane shifts (pltpu.roll + row shift + lane select)
    must be byte-equal to the slice+concat shifts on every output mode."""
    rng = np.random.default_rng(k + w)
    records = []
    for n_rec, frac in [(900, 0.0), (2500, 0.02), (1300, 0.1)]:
        c = rng.integers(0, 4, size=n_rec).astype(np.uint8)
        c[rng.random(n_rec) < frac] = 255
        records.append(c)
    aug2d, starts, n = _layout(records, k, w)
    wh = out == 'z'
    a = pallas_phase1(aug2d, k, w, interpret=True, with_hashes=wh, out=out,
                      use_roll=False)
    b = pallas_phase1(aug2d, k, w, interpret=True, with_hashes=wh, out=out,
                      use_roll=True)
    for x, y in zip(a, b):
        if x is None:
            assert y is None
            continue
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pallas_z_only_matches_with_hashes():
    """The hot path's z-only kernel variant (phase 2 recomputes hashes at
    emitted positions) must produce the same z stream."""
    rng = np.random.default_rng(11)
    k, w = 17, 10
    codes = rng.integers(0, 4, size=3000).astype(np.uint8)
    codes[rng.integers(0, 3000, size=40)] = 255
    rtotal, n, offset = phase1_shapes(len(codes), k, w)
    aug = np.full(n, 255, dtype=np.uint8)
    aug[offset:offset + len(codes)] = codes
    aug[offset] |= 64
    aug2d = jnp.asarray(aug.reshape(rtotal, L))
    z_full, lo, hi = pallas_phase1(aug2d, k, w, interpret=True)
    z_only, no_lo, no_hi = pallas_phase1(aug2d, k, w, interpret=True,
                                         with_hashes=False)
    assert no_lo is None and no_hi is None
    np.testing.assert_array_equal(np.asarray(z_only), np.asarray(z_full))
