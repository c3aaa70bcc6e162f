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


def test_merge_edges_idx_route_matches_hash_route():
    """The packed u32-index-pair edge sort (`_merge_edges` with node_hash)
    must be byte-equal to the u64 hash-key sort, including junction
    (extra-pair) entries, repeated (u, v, asm) triples, and a node hash of
    U64_MAX (which collides with the dead-lane lift value)."""
    import jax.numpy as jnp

    from seqwin_tpu.engine.aggregate import _merge_edges, _merge_nodes

    rng = np.random.default_rng(7)
    m = 700
    cap = 1 << 10
    # small hash universe -> heavy duplication; force a U64_MAX node
    oh = np.zeros(cap, np.uint64)
    oh[:m] = rng.integers(0, 40, size=m).astype(np.uint64) * np.uint64(2**60 // 40)
    oh[5] = np.uint64(0xFFFFFFFFFFFFFFFF)
    pos = np.zeros(cap, np.uint32)
    pos[:m] = np.arange(m)
    rec = np.full(cap, -1, np.int32)
    rec[:m] = np.repeat(np.arange(7), 100)
    asm = np.zeros(cap, np.int32)
    asm[:m] = rec[:m] // 2
    tmask = jnp.asarray(np.array([True, False, True, False]))

    (_, _, node_hash, _, _, _, _, n_nodes) = _merge_nodes(
        jnp.asarray(oh), jnp.asarray(pos), jnp.asarray(rec), jnp.asarray(asm),
        tmask, jnp.int32(m), cap)

    # junction pairs: duplicate an existing stream adjacency (same asm),
    # plus a cross-hash pair; xcap padding beyond xn must be ignored
    xu = np.array([oh[0], oh[200], 0], np.uint64)
    xv = np.array([oh[1], oh[300], 0], np.uint64)
    xa = np.array([0, 1, -1], np.int32)
    args = (jnp.asarray(oh), jnp.asarray(rec), jnp.asarray(asm), 1 << 9,
            jnp.asarray(xu), jnp.asarray(xv), jnp.asarray(xa), jnp.int32(2))
    ref_out = _merge_edges(*args)
    idx_out = _merge_edges(*args, node_hash=node_hash, n_nodes=n_nodes)
    for a, b in zip(ref_out, idx_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fetch_slabbed_exact(monkeypatch):
    """Slabbed concurrent d2h must reassemble byte-identical buffers at
    awkward sizes (overlapping tail slab) and honor the disable knob."""
    import jax.numpy as jnp

    from seqwin_tpu.engine.aggregate import _fetch_slabbed

    for n in (100, 1 << 21, (1 << 21) + 4096, 3 * (1 << 20) + 12288):
        ref = np.arange(n, dtype=np.uint32)
        np.testing.assert_array_equal(_fetch_slabbed(jnp.asarray(ref)), ref)
    monkeypatch.setenv('SEQWIN_TPU_D2H_THREADS', '1')
    ref = np.arange(1 << 21, dtype=np.uint32)
    np.testing.assert_array_equal(_fetch_slabbed(jnp.asarray(ref)), ref)
