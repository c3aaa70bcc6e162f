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
