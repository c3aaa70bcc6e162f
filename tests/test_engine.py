"""Differential tests: XLA engine vs the NumPy oracle vs golden files."""
import numpy as np
import pytest

from seqwin_tpu.ops import oracle
from seqwin_tpu.engine.minimizer import scan_records_host


def _random_codes(rng, n, n_frac=0.0):
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    if n_frac > 0:
        mask = rng.random(n) < n_frac
        codes[mask] = 255
    return codes


def _oracle_stream(records, k, w):
    oh, pos, rec = [], [], []
    for ri, codes in enumerate(records):
        for _, o, p in oracle.minimize(codes, k, w):
            oh.append(o)
            pos.append(p)
            rec.append(ri)
    return (
        np.array(oh, dtype=np.uint64),
        np.array(pos, dtype=np.uint32),
        np.array(rec, dtype=np.int32),
    )


@pytest.mark.parametrize('k,w', [(7, 10), (17, 10), (21, 200), (4, 3), (1, 1), (8, 1)])
def test_scan_matches_oracle_random(k, w):
    rng = np.random.default_rng(k * 1000 + w)
    records = [
        _random_codes(rng, n, f)
        for n, f in [(500, 0.0), (1500, 0.02), (30, 0.0), (k + w - 2, 0.0), (2048, 0.1)]
    ]
    e_oh, e_pos, e_rec = _oracle_stream(records, k, w)
    oh, pos, rec = scan_records_host(records, k, w)
    np.testing.assert_array_equal(oh, e_oh)
    np.testing.assert_array_equal(pos, e_pos)
    np.testing.assert_array_equal(rec, e_rec)


def test_scan_heavy_ties():
    """Low-entropy sequences (AAAA... / ATATAT...) stress tie-breaking."""
    k, w = 5, 8
    base = np.zeros(400, dtype=np.uint8)  # all A
    alt = np.tile(np.array([0, 3], dtype=np.uint8), 300)  # ATAT...
    rng = np.random.default_rng(0)
    noisy = np.where(rng.random(500) < 0.9, 0, rng.integers(0, 4, 500)).astype(np.uint8)
    records = [base, alt, noisy]
    e = _oracle_stream(records, k, w)
    got = scan_records_host(records, k, w)
    for a, b in zip(got, e):
        np.testing.assert_array_equal(a, b)


def test_scan_n_runs_and_short_records():
    k, w = 11, 4
    rng = np.random.default_rng(7)
    records = []
    # dense N runs, N at record edges, records shorter than k
    for n in (5, 10, 11, 12, 200):
        c = _random_codes(rng, n, 0.15)
        records.append(c)
    c = _random_codes(rng, 300)
    c[:20] = 255
    c[-20:] = 255
    c[100:180] = 255
    records.append(c)
    e = _oracle_stream(records, k, w)
    got = scan_records_host(records, k, w)
    for a, b in zip(got, e):
        np.testing.assert_array_equal(a, b)


def test_oracle_distilled_equals_btllib_simulation():
    """The distilled emission rule must equal the literal ring-buffer replay."""
    rng = np.random.default_rng(3)
    for k, w in [(5, 4), (9, 16), (3, 2)]:
        for trial in range(5):
            codes = _random_codes(rng, 600, 0.05 * (trial % 3))
            a = oracle.minimize(codes, k, w)
            b = oracle.minimize_btllib_style(codes, k, w)
            assert a == b


def test_emit_cap_retry():
    """Strictly decreasing hash streams emit ~1 minimizer/kmer; the driver
    must retry with a larger capacity and stay exact."""
    k, w = 3, 2
    rng = np.random.default_rng(11)
    records = [_random_codes(rng, 5000)]
    e = _oracle_stream(records, k, w)
    got = scan_records_host(records, k, w)
    for a, b in zip(got, e):
        np.testing.assert_array_equal(a, b)
