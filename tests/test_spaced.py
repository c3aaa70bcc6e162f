"""Spaced-seed ntHash (`ops/spaced.py`) differentials.

The reference vendors btllib `SeedNtHash` but never calls it (SURVEY.md
§2.2); this extension is validated against a per-position simulation of the
`ntmsm64` formula, cross-checked against the contiguous-k-mer hash on the
all-ones pattern, and exercised through the device MinHash sketcher.
"""
import numpy as np
import pytest

from seqwin_tpu.ops.host_hash import canon_at
from seqwin_tpu.ops.spaced import (
    parse_seed,
    spaced_hashes_device,
    spaced_hashes_host,
    spaced_oracle,
)

PATTERNS = ['1', '11011', '101101101', '1100110011', '110000000011', '10101']


@pytest.mark.parametrize('pattern', PATTERNS)
def test_host_and_device_match_oracle(pattern):
    rng = np.random.default_rng(hash(pattern) % (1 << 32))
    n = int(rng.integers(len(pattern) + 1, 500))
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    codes[rng.integers(0, n, size=max(1, n // 12))] = 255

    ho, po = spaced_oracle(codes, pattern, n_hashes=3)
    hh, ph = spaced_hashes_host(codes, pattern, n_hashes=3)
    np.testing.assert_array_equal(ph, po)
    np.testing.assert_array_equal(hh, ho)

    hd, pd, cnt = spaced_hashes_device(codes, pattern, n_hashes=3)
    cnt = int(cnt)
    assert cnt == len(po)
    np.testing.assert_array_equal(np.asarray(pd)[:cnt], po)
    np.testing.assert_array_equal(np.asarray(hd)[:cnt], ho)


def test_all_ones_pattern_is_the_kmer_hash():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=400).astype(np.uint8)
    k = 21
    h, p = spaced_hashes_host(codes, '1' * k, n_hashes=1)
    np.testing.assert_array_equal(h[:, 0], canon_at(codes, p, k))


def test_parse_seed_validation():
    with pytest.raises(ValueError):
        parse_seed('0110')
    with pytest.raises(ValueError):
        parse_seed('1x1')
    with pytest.raises(ValueError):
        parse_seed('')
    mask, blocks = parse_seed('1101011')
    assert mask.tolist() == [True, True, False, True, False, True, True]
    assert blocks == [(0, 2), (3, 4), (5, 7)]


def test_short_sequence_and_all_invalid():
    codes = np.full(4, 255, dtype=np.uint8)
    h, p = spaced_hashes_host(codes, '10101', n_hashes=2)
    assert len(p) == 0 and h.shape == (0, 2)
    h, p, cnt = spaced_hashes_device(np.zeros(3, np.uint8), '10101')
    assert int(cnt) == 0


@pytest.mark.parametrize('sketchsize', [64, 4096])
def test_device_sketch_with_spaced_seed(sketchsize):
    """Spaced-seed device MinHash: bottom-k of the distinct spaced hashes.

    The 4096 case is a FULL-size sketch (>= total windows), so a single
    phantom cross-record hash fails the equality -- it pins the separator-run
    fix in `mash._separator_run` (a lone 255 on a don't-care position used to
    let windows straddle record junctions).
    """
    from seqwin_tpu.mash import device_sketches

    rng = np.random.default_rng(9)
    pattern = '110101011'
    recs = [
        [rng.integers(0, 4, size=700).astype(np.uint8),
         rng.integers(0, 4, size=300).astype(np.uint8)],
        [rng.integers(0, 4, size=900).astype(np.uint8)],
    ]
    sketches = device_sketches(recs, kmerlen=0, sketchsize=sketchsize,
                               seed_pattern=pattern)
    for recs_a, sk in zip(recs, sketches):
        want = set()
        for c in recs_a:
            h, _ = spaced_hashes_host(c, pattern, n_hashes=1)
            want.update(h[:, 0].tolist())
        expected = np.array(sorted(want)[:sketchsize], dtype=np.uint64)
        np.testing.assert_array_equal(sk, expected)


def test_device_sketch_separator_runs():
    """Many short records with a seed whose zero-gaps exceed 1: the sketch
    must contain exactly the per-record hash union, never junction hashes."""
    from seqwin_tpu.mash import device_sketches

    rng = np.random.default_rng(17)
    pattern = '110000000011'
    recs = [[rng.integers(0, 4, size=40).astype(np.uint8) for _ in range(8)]]
    sketches = device_sketches(recs, kmerlen=0, sketchsize=1024,
                               seed_pattern=pattern)
    want = set()
    for c in recs[0]:
        h, _ = spaced_hashes_host(c, pattern, n_hashes=1)
        want.update(h[:, 0].tolist())
    np.testing.assert_array_equal(
        sketches[0], np.array(sorted(want), dtype=np.uint64))
