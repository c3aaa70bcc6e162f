"""Records larger than the chunk budget: exact halo'd block scanning.

Sequence-length scaling (SURVEY.md §2.3): the reference streams an entire
record through one thread (`cpp/src/seqwin/graph.cpp:106-110`); here a long
record is split into device-budget blocks with w-1 valid-kmer halos and an
emission carry. Every output byte -- kmers, nodes (incl. once-per-assembly
counts), and especially edges spanning block junctions -- must match the
oracle exactly.
"""
import importlib

import numpy as np
import pytest

from seqwin_tpu.graph import build

build_mod = importlib.import_module('seqwin_tpu.graph.build')


def _rand_genome(rng, L, n_frac=0.0, n_runs=0):
    alphabet = np.array(list('ACGT'))
    seq = rng.choice(alphabet, L)
    if n_frac:
        idx = rng.integers(0, L, size=int(L * n_frac))
        seq[idx] = 'N'
    for _ in range(n_runs):
        s = int(rng.integers(0, max(1, L - 500)))
        seq[s:s + int(rng.integers(50, 500))] = 'N'
    return ''.join(seq)


def _assert_equal(got, ref):
    np.testing.assert_array_equal(got[0], ref[0])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(got[1][f], ref[1][f])
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(got[3], ref[3])


def _write(tmp_path, name, records):
    p = tmp_path / name
    p.write_text(''.join(f'>r{i}\n{s}\n' for i, s in enumerate(records)))
    return p


@pytest.mark.parametrize('k,w', [(17, 10), (7, 32), (11, 1)])
def test_long_record_blocks_match_oracle(tmp_path, monkeypatch, k, w):
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 14)
    rng = np.random.default_rng(7)
    paths = [
        _write(tmp_path, 'jumbo.fasta', [_rand_genome(rng, 120_000, n_runs=3)]),
        _write(tmp_path, 'small.fasta', [_rand_genome(rng, 5_000), _rand_genome(rng, 3_000)]),
    ]
    got = build(paths, k, w, [True, False])
    ref = build(paths, k, w, [True, False], backend='numpy')
    _assert_equal(got, ref)


def test_long_record_n_desert_at_boundary(tmp_path, monkeypatch):
    """An N desert wider than a block forces the halo to reach far back."""
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 13)
    rng = np.random.default_rng(8)
    left = _rand_genome(rng, 9_000)
    right = _rand_genome(rng, 9_000)
    seq = left + 'N' * 20_000 + right  # desert spans multiple block budgets
    p = _write(tmp_path, 'desert.fasta', [seq])
    q = _write(tmp_path, 'other.fasta', [_rand_genome(rng, 4_000)])
    got = build([p, q], 17, 10, [True, False])
    ref = build([p, q], 17, 10, [True, False], backend='numpy')
    _assert_equal(got, ref)


def test_long_record_shared_hashes_across_assemblies(tmp_path, monkeypatch):
    """Mutated clones of one long genome: node n_tar/n_neg dedup and edge
    weights must count each assembly once even when a record spans blocks."""
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 14)
    rng = np.random.default_rng(9)
    alphabet = np.array(list('ACGT'))
    base = rng.choice(alphabet, 60_000)
    paths, targets = [], []
    for i in range(3):
        g = base.copy()
        idx = rng.integers(0, len(g), size=len(g) // 300)
        g[idx] = alphabet[(np.searchsorted(alphabet, g[idx]) + 1) % 4]
        paths.append(_write(tmp_path, f'clone{i}.fasta', [''.join(g)]))
        targets.append(i < 2)
    got = build(paths, 17, 10, targets)
    ref = build(paths, 17, 10, targets, backend='numpy')
    _assert_equal(got, ref)
    # sanity: shared content => many nodes present in multiple assemblies
    assert int((got[1]['n_tar'] == 2).sum()) > 100


@pytest.mark.parametrize('seed', range(3))
def test_long_record_fuzz(tmp_path, monkeypatch, seed):
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 13)
    rng = np.random.default_rng(40 + seed)
    k = int(rng.integers(3, 28))
    w = int(rng.integers(1, 48))
    paths, targets = [], []
    for i in range(2):
        recs = [_rand_genome(rng, int(rng.integers(20_000, 60_000)),
                             n_frac=0.01, n_runs=2)]
        if i == 1:
            recs.append(_rand_genome(rng, 2_000))
        paths.append(_write(tmp_path, f'f{seed}_{i}.fasta', recs))
        targets.append(i == 0)
    got = build(paths, k, w, targets)
    ref = build(paths, k, w, targets, backend='numpy')
    _assert_equal(got, ref)
