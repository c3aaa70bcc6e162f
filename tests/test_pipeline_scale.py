"""Host-pipeline smoke at reference scale.

The reference's golden run filters a graph of ~470k nodes / ~700k edges /
8.3M k-mers in ~1 s (`/root/reference/tests/expected-output/seqwin.log:22-33`)
and its README quotes a 15k-genome workload. This test synthesizes a graph at
the golden run's scale and drives `KmerGraph.filter()` end-to-end (edge
filter, HashGraph build, greedy subgraph expansion, k-mer compaction) with a
wall-clock bound, so host-side scalability regressions are caught without a
67 Gbp genome build.
"""
import time
from random import Random

import numpy as np
import pytest

from seqwin_tpu.graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE
from seqwin_tpu.pipeline.kmers import KmerGraph

N_NODES = 500_000
N_KMERS = 8_000_000
N_ASM = 171


def _synth_graph(rng: np.random.Generator) -> KmerGraph:
    hashes = np.unique(rng.integers(0, 1 << 63, size=N_NODES + 4096, dtype=np.uint64))[:N_NODES]
    hashes.sort()

    sizes = rng.poisson(N_KMERS / N_NODES, size=N_NODES).astype(np.int64) + 1
    stops = np.cumsum(sizes)
    starts = stops - sizes

    nodes = np.zeros(N_NODES, dtype=NODE_DTYPE)
    nodes['hash'] = hashes
    nodes['start'] = starts
    nodes['stop'] = stops
    nodes['n_tar'] = rng.integers(1, 73, size=N_NODES)
    nodes['n_neg'] = rng.integers(0, 100, size=N_NODES)
    nodes['penalty'] = np.sqrt(
        (1.0 - nodes['n_tar'] / 72) ** 2 + (nodes['n_neg'] / 99) ** 2
    )

    total = int(stops[-1])
    kmers = np.zeros(total, dtype=KMER_DTYPE)
    kmers['pos'] = rng.integers(0, 4_700_000, size=total)
    kmers['record_idx'] = rng.integers(0, N_ASM, size=total)

    # a mostly-chain adjacency (consecutive minimizers) plus random chords --
    # the shape get_subgraphs actually walks
    m = N_NODES - 1
    first = hashes[:-1].copy()
    second = hashes[1:].copy()
    chord_u = hashes[rng.integers(0, N_NODES, size=m // 2)]
    chord_v = hashes[rng.integers(0, N_NODES, size=m // 2)]
    u = np.concatenate([np.minimum(first, second), np.minimum(chord_u, chord_v)])
    v = np.concatenate([np.maximum(first, second), np.maximum(chord_u, chord_v)])
    keep = u != v
    u, v = u[keep], v[keep]
    edges = np.zeros(len(u), dtype=EDGE_DTYPE)
    edges['first'] = u
    edges['second'] = v
    edges['weight'] = rng.integers(1, N_ASM, size=len(u))
    edges.sort(order=['first', 'second'])

    kg = KmerGraph.__new__(KmerGraph)
    kg.kmers = kmers
    kg.nodes = nodes
    kg.edges = edges
    kg.record_offsets = np.arange(N_ASM + 1, dtype=np.uintp) * 2
    kg.graph = None
    kg.node_penalty = None
    kg.subgraphs = None
    kg._is_filtered = False
    return kg


def test_filter_at_reference_scale():
    rng = np.random.default_rng(3)
    kg = _synth_graph(rng)

    t0 = time.time()
    kg.filter(
        penalty_th=0.15,
        edge_weight_th=0.3 * (1 - 0.15) * 72,
        min_nodes=4,
        max_nodes=60,
        rng=Random(42),
    )
    dt = time.time() - t0

    assert kg._is_filtered
    assert kg.subgraphs is not None and len(kg.subgraphs) > 0
    # every kept k-mer segment must be consistent
    assert len(kg.nodes) > 0
    assert int(kg.nodes['stop'][-1]) == len(kg.kmers)
    starts = kg.nodes['start'].astype(np.int64)
    stops = kg.nodes['stop'].astype(np.int64)
    assert np.all(stops[:-1] == starts[1:]) and starts[0] == 0
    # host pipeline at golden-run scale must stay within an order of
    # magnitude of the reference's ~1 s (generous bound for CI variance)
    assert dt < 120, f'filter() took {dt:.1f}s at reference scale'
