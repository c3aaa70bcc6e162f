"""Aggregation capacity-retry paths + randomized build-vs-oracle sweep."""
import numpy as np
import pytest

from seqwin_tpu.graph import build


def test_node_and_edge_cap_retry(tmp_path):
    """A mostly-unique-hash stream (random genome, tiny w) overflows the
    initial node/edge capacity guesses and must retry correctly."""
    rng = np.random.default_rng(3)
    alphabet = np.array(list('ACGT'))
    paths = []
    for i in range(2):
        seq = ''.join(rng.choice(alphabet, 200_000))
        p = tmp_path / f'g{i}.fasta'
        p.write_text(f'>g{i}\n{seq}\n')
        paths.append(p)
    kmers, nodes, edges, offsets, _ = build(paths, 11, 3, [True, False])
    ref = build(paths, 11, 3, [True, False], backend='numpy')
    np.testing.assert_array_equal(kmers, ref[0])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(nodes[f], ref[1][f])
    np.testing.assert_array_equal(edges, ref[2])
    # sanity: node count is large relative to the stream (near-unique hashes)
    assert len(nodes) > len(kmers) * 0.5


@pytest.mark.parametrize('seed', range(4))
def test_build_fuzz_vs_oracle(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    k = int(rng.integers(3, 28))
    w = int(rng.integers(1, 48))
    alphabet = np.array(list('ACGTN'))
    paths, targets = [], []
    n_asm = int(rng.integers(2, 5))
    for i in range(n_asm):
        n_rec = int(rng.integers(1, 4))
        recs = []
        for r in range(n_rec):
            L = int(rng.integers(10, 4000))
            probs = [0.24, 0.24, 0.24, 0.24, 0.04]
            recs.append(''.join(rng.choice(alphabet, L, p=probs)))
        p = tmp_path / f's{seed}_g{i}.fasta'
        p.write_text(''.join(f'>r{r}\n{s}\n' for r, s in enumerate(recs)))
        paths.append(p)
        targets.append(i % 2 == 0)
    got = build(paths, k, w, targets)
    ref = build(paths, k, w, targets, backend='numpy')
    np.testing.assert_array_equal(got[0], ref[0])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(got[1][f], ref[1][f])
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(got[3], ref[3])


@pytest.mark.parametrize('seed', range(3))
def test_build_fuzz_stress_irregular(tmp_path, seed):
    """Adversarial irregular-window stress: long N runs, IUPAC ambiguity
    letters, records shorter than k, and windows wider than records — every
    case must be host-patched bit-exactly in the hybrid engine."""
    rng = np.random.default_rng(900 + seed)
    k = int(rng.integers(2, 32))
    w = int(rng.integers(1, 65))
    paths, targets = [], []
    for i in range(int(rng.integers(2, 4))):
        recs = []
        for r in range(int(rng.integers(1, 5))):
            parts = []
            for _ in range(int(rng.integers(1, 6))):
                kind = rng.integers(0, 4)
                if kind == 0:  # long N run
                    parts.append('N' * int(rng.integers(1, 300)))
                elif kind == 1:  # IUPAC ambiguity soup (all invalid codes)
                    amb = np.array(list('RYSWKMBDHVN'))
                    parts.append(''.join(rng.choice(amb, int(rng.integers(1, 40)))))
                else:  # clean stretch (possibly shorter than k)
                    acgt = np.array(list('ACGT'))
                    parts.append(''.join(rng.choice(acgt, int(rng.integers(1, 800)))))
            recs.append(''.join(parts))
        p = tmp_path / f'x{seed}_g{i}.fasta'
        p.write_text(''.join(f'>r{r}\n{s}\n' for r, s in enumerate(recs)))
        paths.append(p)
        targets.append(i % 2 == 0)
    got = build(paths, k, w, targets)
    ref = build(paths, k, w, targets, backend='numpy')
    np.testing.assert_array_equal(got[0], ref[0])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(got[1][f], ref[1][f])
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(got[3], ref[3])


def test_compact_transfer_matches_interleaved(tmp_path, monkeypatch):
    """The compact d2h encoding (u16 rec/counts/weights, C expansion) must be
    byte-identical to the interleaved layout, with and without the native
    expansion library."""
    import seqwin_tpu.io.native as native
    from seqwin_tpu.graph.build import build

    rng = np.random.default_rng(5)
    paths, targets = [], []
    alphabet = np.frombuffer(b'ACGT', dtype=np.uint8)
    for i in range(4):
        codes = rng.integers(0, 4, size=5000 + 311 * i).astype(np.uint8)
        seq = alphabet[codes].tobytes().decode()
        p = tmp_path / f'c{i}.fa'
        p.write_text(f'>r{i}a\n{seq[:2000]}\n>r{i}b\n{seq[2000:]}\n')
        paths.append(p)
        targets.append(i % 2 == 0)

    ref = build(paths, 13, 9, targets)  # compact (native expansion)
    assert native.available(), 'native library must be present in this env'

    monkeypatch.setenv('SEQWIN_TPU_COMPACT', '0')
    inter = build(paths, 13, 9, targets)
    monkeypatch.delenv('SEQWIN_TPU_COMPACT')

    # numpy fallback expansion (native library unavailable)
    monkeypatch.setattr(native, 'expand_kmers_nodes', lambda *a, **k: False)
    monkeypatch.setattr(native, 'expand_edges', lambda *a, **k: False)
    fb = build(paths, 13, 9, targets)

    for got in (inter, fb):
        np.testing.assert_array_equal(got[0], ref[0])
        for f in ref[1].dtype.names:
            np.testing.assert_array_equal(got[1][f], ref[1][f])
        np.testing.assert_array_equal(got[2], ref[2])
        np.testing.assert_array_equal(got[3], ref[3])
