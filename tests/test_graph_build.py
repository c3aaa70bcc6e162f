"""Graph build vs the reference's golden graph.npz and contract invariants."""
import numpy as np
import pytest

from seqwin_tpu.graph import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE, build
from seqwin_tpu.graph.build import filter_kmers


def _assert_node_ranges(kmers, nodes):
    total = 0
    for node in nodes:
        start, stop = int(node['start']), int(node['stop'])
        assert 0 <= start <= stop <= len(kmers)
        total += stop - start
    assert total == len(kmers)


def test_dtype_layouts():
    assert KMER_DTYPE.itemsize == 8
    assert KMER_DTYPE.names == ('pos', 'record_idx')
    assert NODE_DTYPE.names == ('hash', 'start', 'stop', 'n_tar', 'n_neg', 'penalty')
    assert NODE_DTYPE.itemsize == 40
    assert EDGE_DTYPE.names == ('first', 'second', 'weight')
    assert EDGE_DTYPE.itemsize == 24


def test_build_matches_golden_graph(ref_fixtures, fixture_paths):
    golden = np.load(ref_fixtures / 'expected' / 'graph.npz')
    kmers, nodes, edges, offsets, record_ids = build(
        fixture_paths, kmerlen=17, windowsize=10,
        is_targets=[True, True, False, False], n_cpu=2,
    )
    np.testing.assert_array_equal(kmers, golden['kmers'])
    np.testing.assert_array_equal(edges, golden['edges'])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(nodes[f], golden['nodes'][f])
    np.testing.assert_array_equal(offsets, golden['record_offsets'])
    # golden penalties were computed with n_tar = n_neg = 2
    pen = np.sqrt((1 - nodes['n_tar'] / 2) ** 2 + (nodes['n_neg'] / 2) ** 2)
    np.testing.assert_allclose(pen, golden['nodes']['penalty'], rtol=0, atol=1e-12)
    _assert_node_ranges(kmers, nodes)
    assert len(record_ids) == 4


@pytest.mark.parametrize('n_cpu', [1, 2, 99])
def test_build_worker_count_invariance(fixture_paths, n_cpu):
    base = build(fixture_paths, 7, 10, [True, True, False, False], n_cpu=1)
    got = build(fixture_paths, 7, 10, [True, True, False, False], n_cpu=n_cpu)
    for a, b in zip(base[:4], got[:4]):
        np.testing.assert_array_equal(a, b)
    assert base[4] == got[4]


def test_build_low_memory_equivalence(fixture_paths):
    std = build(fixture_paths, 7, 10, [True, True, False, False], low_memory=False)
    lm = build(fixture_paths, 7, 10, [True, True, False, False], low_memory=True)
    for a, b in zip(std[:4], lm[:4]):
        np.testing.assert_array_equal(a, b)


def test_build_backend_equivalence(fixture_paths):
    """XLA engine vs the slow NumPy oracle backend."""
    xla = build(fixture_paths, 7, 10, [True, True, False, False], backend='xla')
    ref = build(fixture_paths, 7, 10, [True, True, False, False], backend='numpy')
    for a, b in zip(xla[:4], ref[:4]):
        np.testing.assert_array_equal(a, b)


def test_multi_record_offsets(tmp_path):
    seq = 'ACGT' * 20
    paths = []
    for i, n_records in enumerate([2, 1, 3, 1]):
        p = tmp_path / f'a{i}.fasta'
        p.write_text(''.join(f'>r{j}\n{seq}\n' for j in range(n_records)))
        paths.append(p)
    kmers, _, _, offsets, record_ids = build(paths, 7, 10, [True, True, False, False], n_cpu=2)
    assert [len(ids) for ids in record_ids] == [2, 1, 3, 1]
    np.testing.assert_array_equal(offsets, np.array([0, 2, 3, 6, 7], dtype=np.uintp))
    np.testing.assert_array_equal(np.unique(kmers['record_idx']), np.arange(7, dtype=np.uint32))


def test_filter_kmers_unit():
    kmers = np.array([(10, 0), (11, 0), (20, 1), (30, 2), (31, 2), (32, 2)], dtype=KMER_DTYPE)
    nodes = np.array([
        (10, 0, 2, 1, 0, 0.1),
        (20, 2, 3, 1, 0, 0.2),
        (30, 3, 6, 1, 1, 0.3),
    ], dtype=NODE_DTYPE)
    kmers_new, nodes_new = filter_kmers(kmers, nodes, {30, 10})
    np.testing.assert_array_equal(nodes_new['hash'], np.array([10, 30], dtype=np.uint64))
    np.testing.assert_array_equal(nodes_new['start'], np.array([0, 2], dtype=np.uintp))
    np.testing.assert_array_equal(nodes_new['stop'], np.array([2, 5], dtype=np.uintp))
    expected = np.array([(10, 0), (11, 0), (30, 2), (31, 2), (32, 2)], dtype=KMER_DTYPE)
    np.testing.assert_array_equal(kmers_new, expected)


def test_gzip_and_plain_equal(tmp_path, fixture_paths):
    import gzip as _gzip

    gz_paths = []
    for p in fixture_paths:
        gz = tmp_path / (p.name + '.gz')
        gz.write_bytes(_gzip.compress(p.read_bytes()))
        gz_paths.append(gz)
    a = build(fixture_paths, 7, 10, [True, True, False, False])
    b = build(gz_paths, 7, 10, [True, True, False, False])
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(x, y)


def test_multi_chunk_matches_golden(ref_fixtures, fixture_paths, monkeypatch):
    """Force many tiny chunks: chunk boundaries and cross-chunk aggregation
    must not change any output byte."""
    import importlib

    build_mod = importlib.import_module('seqwin_tpu.graph.build')
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 12)
    golden = np.load(ref_fixtures / 'expected' / 'graph.npz')
    kmers, nodes, edges, offsets, _ = build(
        fixture_paths, 17, 10, [True, True, False, False],
    )
    np.testing.assert_array_equal(kmers, golden['kmers'])
    np.testing.assert_array_equal(edges, golden['edges'])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(nodes[f], golden['nodes'][f])


def test_fused_matches_classic_and_fallback(tmp_path, monkeypatch):
    """The fused one-program build (`engine/fused.py`) must be byte-identical
    to the per-chunk pipeline on a multi-chunk, N-laden input -- and must
    fall back (not crash, not diverge) when a record exceeds the chunk
    budget (halo'd block splitting only exists in the per-chunk path)."""
    import importlib

    build_mod = importlib.import_module('seqwin_tpu.graph.build')
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 15)

    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b'ACGTN', dtype=np.uint8)
    paths, targets = [], []
    for i in range(4):
        n = int(rng.integers(20_000, 60_000))
        g = rng.integers(0, 4, size=n).astype(np.uint8)
        g[rng.random(n) < 0.02] = 4
        p = tmp_path / f'g{i}.fasta'
        cut = n // 3
        p.write_text(
            f'>r{i}a\n' + alpha[g[:cut]].tobytes().decode() + '\n'
            f'>r{i}b\n' + alpha[g[cut:]].tobytes().decode() + '\n'
        )
        paths.append(p)
        targets.append(i < 2)

    monkeypatch.setenv('SEQWIN_TPU_FUSED', '1')
    fused = build(paths, 13, 30, targets)
    monkeypatch.setenv('SEQWIN_TPU_FUSED', '0')
    classic = build(paths, 13, 30, targets)
    for a, b in zip(fused[:4], classic[:4]):
        np.testing.assert_array_equal(a, b)

    # oversized record: fused path must defer to the block-split pipeline
    big = tmp_path / 'big.fasta'
    n = (1 << 15) + 5000
    big.write_text('>big\n' + alpha[
        rng.integers(0, 4, size=n).astype(np.uint8)].tobytes().decode() + '\n')
    paths2 = [*paths, big]
    targets2 = [*targets, True]
    monkeypatch.setenv('SEQWIN_TPU_FUSED', '1')
    f2 = build(paths2, 13, 30, targets2)
    monkeypatch.setenv('SEQWIN_TPU_FUSED', '0')
    c2 = build(paths2, 13, 30, targets2)
    for a, b in zip(f2[:4], c2[:4]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('extract', ['rank', 'pfx'])
def test_fused_extract_variants_match_classic(tmp_path, monkeypatch, extract):
    """The fused one-program build supports every extraction variant
    natively (round 4; previously pfx downgraded to topk with a warning)
    and stays byte-identical to the per-chunk topk build."""
    import importlib

    build_mod = importlib.import_module('seqwin_tpu.graph.build')
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 15)

    rng = np.random.default_rng(23)
    alpha = np.frombuffer(b'ACGTN', dtype=np.uint8)
    paths, targets = [], []
    for i in range(3):
        n = int(rng.integers(15_000, 40_000))
        g = rng.integers(0, 4, size=n).astype(np.uint8)
        g[rng.random(n) < 0.02] = 4
        p = tmp_path / f'g{i}.fasta'
        p.write_text(f'>r{i}\n' + alpha[g].tobytes().decode() + '\n')
        paths.append(p)
        targets.append(i < 2)

    monkeypatch.delenv('SEQWIN_TPU_EXTRACT', raising=False)
    monkeypatch.setenv('SEQWIN_TPU_FUSED', '0')
    classic = build(paths, 13, 30, targets)

    monkeypatch.setenv('SEQWIN_TPU_FUSED', '1')
    monkeypatch.setenv('SEQWIN_TPU_EXTRACT', extract)
    fused = build(paths, 13, 30, targets)
    for a, b in zip(fused[:4], classic[:4]):
        np.testing.assert_array_equal(a, b)
