"""Deferred (device-resident) graph differentials.

`build_deferred` keeps the k-mer stream and edges on device
(`engine/aggregate.py::DeviceGraph`); every partial transfer it offers must be
byte-identical to slicing the fully materialized arrays of the plain `build`.
"""
import numpy as np
import pytest

from seqwin_tpu.graph.build import (
    build,
    build_deferred,
    filter_kmers,
    kept_node_layout,
)

K, W = 17, 10


@pytest.fixture(scope='module')
def built(fixture_paths):
    targets = [True, True, False, False]
    full = build(fixture_paths, K, W, targets)
    deferred = build_deferred(fixture_paths, K, W, targets)
    return full, deferred


def test_deferred_counts_and_nodes(built):
    (kmers, nodes, edges, offsets, record_ids), (g, d_offsets, d_record_ids) = built
    assert g.n_kmers == len(kmers)
    assert g.n_nodes == len(nodes)
    assert g.n_edges == len(edges)
    np.testing.assert_array_equal(offsets, d_offsets)
    assert record_ids == d_record_ids
    np.testing.assert_array_equal(g.nodes, nodes)


def test_deferred_materialize_matches_build(built):
    (kmers, nodes, edges, *_), (g, *_rest) = built
    d_kmers, d_edges = g.materialize()
    np.testing.assert_array_equal(d_kmers, kmers)
    np.testing.assert_array_equal(d_edges, edges)


def test_edge_idx_encoding_matches_plain(built, fixture_paths, monkeypatch):
    """The u32-node-index edge d2h encoding (default on) must reproduce the
    exact u64 endpoint hashes of the plain encodings, for both the direct
    build and DeviceGraph.materialize_edges."""
    (kmers, nodes, edges, *_), (g, *_rest) = built  # built with idx default ON
    # exercise the idx route of materialize_edges BEFORE flipping the env --
    # _dispatch_edges reads SEQWIN_TPU_EDGE_IDX at call time
    monkeypatch.setenv('SEQWIN_TPU_EDGE_IDX', '1')
    idx_edges = g.materialize_edges()
    monkeypatch.setenv('SEQWIN_TPU_EDGE_IDX', '0')
    targets = [True, True, False, False]
    kmers0, nodes0, edges0, *_ = build(fixture_paths, K, W, targets)
    np.testing.assert_array_equal(edges, edges0)
    np.testing.assert_array_equal(kmers, kmers0)
    np.testing.assert_array_equal(nodes, nodes0)
    g0, *_ = build_deferred(fixture_paths, K, W, targets)
    np.testing.assert_array_equal(idx_edges, g0.materialize_edges())


@pytest.mark.parametrize('th', [0.0, 1.0, 1.7, 2.0, 3.0, 1000.0])
def test_deferred_filter_edges_matches_host(built, th):
    (kmers, nodes, edges, *_), (g, *_rest) = built
    want = edges[edges['weight'] > np.uintp(th)]
    got = g.filter_edges(th)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('frac', [0.0, 0.01, 0.3, 1.0])
def test_deferred_compact_kmers_matches_filter_kmers(built, frac):
    (kmers, nodes, edges, *_), (g, *_rest) = built
    rng = np.random.default_rng(int(frac * 100))
    n_used = int(len(nodes) * frac)
    used = set(rng.choice(nodes['hash'], size=n_used, replace=False).tolist())
    want_kmers, want_nodes = filter_kmers(kmers, nodes, used)

    keep, out_nodes, total = kept_node_layout(nodes, used)
    got_kmers = g.compact_kmers(keep, total)
    np.testing.assert_array_equal(out_nodes, want_nodes)
    np.testing.assert_array_equal(got_kmers, want_kmers)


def test_host_graph_interface_matches_device(built):
    """The HostGraph fallback (numpy backend / distributed paths) implements
    the same interface with the same bytes."""
    from seqwin_tpu.engine.aggregate import HostGraph

    (kmers, nodes, edges, *_), (g, *_rest) = built
    h = HostGraph(kmers, nodes, edges)
    np.testing.assert_array_equal(h.filter_edges(1.5), g.filter_edges(1.5))
    used = set(nodes['hash'][::3].tolist())
    keep, _, total = kept_node_layout(nodes, used)
    np.testing.assert_array_equal(
        h.compact_kmers(keep, total), g.compact_kmers(keep, total))
    hk, he = h.materialize()
    np.testing.assert_array_equal(hk, kmers)
    np.testing.assert_array_equal(he, edges)


def test_kmers_edges_lazy_access_materializes(fixture_paths):
    """Pre-round-3 API contract: `.kmers`/`.edges` readable right after
    construction. With the deferred build they lazily materialize on first
    access (advisor round-3 finding) instead of silently returning None."""
    from seqwin_tpu.assemblies import Assemblies
    from seqwin_tpu.pipeline.kmers import KmerGraph

    targets = [True, True, False, False]
    kmers, nodes, edges, *_ = build(fixture_paths, K, W, targets)

    asm = Assemblies(fixture_paths[:2], fixture_paths[2:])
    kg = KmerGraph(asm, K, W, n_cpu=2, low_memory=False)
    assert kg._graph is not None  # still deferred
    np.testing.assert_array_equal(kg.kmers, kmers)   # triggers materialize()
    np.testing.assert_array_equal(kg.edges, edges)
    assert kg._graph is None  # device buffers released after materialization


def test_pipeline_deferred_matches_numpy_backend(tmp_path):
    """Full KmerGraph.filter() through the deferred device path vs the
    host-array numpy backend: identical kept kmers/nodes/edges/subgraphs."""
    from random import Random

    from seqwin_tpu.assemblies import Assemblies
    from seqwin_tpu.pipeline.kmers import KmerGraph

    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b'ACGT', dtype=np.uint8)
    base = rng.integers(0, 4, size=20_000).astype(np.uint8)
    paths = []
    for i in range(6):
        gseq = base.copy()
        idx = rng.integers(0, len(gseq), size=len(gseq) // 100)
        gseq[idx] = (gseq[idx] + rng.integers(1, 4, size=idx.size)) % 4
        p = tmp_path / f'g{i}.fasta'
        p.write_text(f'>g{i}\n' + alphabet[gseq].tobytes().decode() + '\n')
        paths.append(p)
    targets = [True] * 3 + [False] * 3

    results = {}
    for backend in ('auto', 'numpy'):
        asm = Assemblies(paths[:3], paths[3:])
        kg = KmerGraph(asm, 17, 40, n_cpu=2, low_memory=False, backend=backend)
        kg.filter(
            penalty_th=0.5, edge_weight_th=1.0, min_nodes=2, max_nodes=50,
            rng=Random(7),
        )
        results[backend] = kg

    a, b = results['auto'], results['numpy']
    np.testing.assert_array_equal(a.kmers, b.kmers)
    np.testing.assert_array_equal(a.nodes, b.nodes)
    np.testing.assert_array_equal(a.edges, b.edges)
    assert a.subgraphs == b.subgraphs
