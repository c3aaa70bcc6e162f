"""HashGraph must reproduce networkx iteration orders (the marker pipeline's
tie-breaks observe them)."""
import numpy as np
import pytest

networkx = pytest.importorskip('networkx')

from seqwin_tpu.graph.hashgraph import HashGraph, OrderedKmers


def _random_edge_list(rng, n_nodes, n_edges):
    edges = set()
    out = []
    while len(out) < n_edges:
        u = int(rng.integers(0, n_nodes))
        v = int(rng.integers(0, n_nodes))
        if u > v:
            u, v = v, u
        if (u, v) in edges:
            continue
        edges.add((u, v))
        out.append((u, v))
    return sorted(out)  # reference adds edges in sorted (first, second) order


@pytest.mark.parametrize('seed', range(8))
def test_node_order_degree_neighbors_match_networkx(seed):
    rng = np.random.default_rng(seed)
    edges = _random_edge_list(rng, 12, 18)

    g = HashGraph()
    g.add_edges(edges)
    nx_g = networkx.Graph()
    nx_g.add_edges_from(edges)

    assert list(g) == list(nx_g)
    for n in g:
        assert list(g.neighbors(n)) == list(nx_g.neighbors(n))
        assert g.degree(n) == nx_g.degree[n]


@pytest.mark.parametrize('seed', range(12))
def test_all_simple_paths_order_matches_networkx(seed):
    rng = np.random.default_rng(100 + seed)
    edges = _random_edge_list(rng, 9, 12)
    g = HashGraph()
    g.add_edges(edges)
    nx_g = networkx.Graph()
    nx_g.add_edges_from(edges)

    nodes = list(g)
    for s in nodes[:4]:
        for t in nodes[-4:]:
            if s == t:
                continue
            mine = list(g.all_simple_paths(s, t))
            ref = list(networkx.all_simple_paths(nx_g, s, t))
            assert mine == ref, (s, t, edges)


def test_subgraph_preserves_parent_orders():
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 5)]
    g = HashGraph()
    g.add_edges(edges)
    nx_g = networkx.Graph()
    nx_g.add_edges_from(edges)
    keep = {4, 2, 5, 3}
    sub = g.subgraph(keep)
    nx_sub = nx_g.subgraph(keep).copy()
    assert list(sub) == list(nx_sub)
    for n in sub:
        assert list(sub.neighbors(n)) == list(nx_sub.neighbors(n))
        assert sub.degree(n) == nx_sub.degree[n]


def test_ordered_kmers_which_strand():
    k = OrderedKmers((1, 2, 3, 3, 4, 5))
    cases = [
        ((1, 2, 3, 3, 4, 5), '+'),
        ((5, 4, 3, 3, 2, 1), '-'),
        ((2,), 'u'),
        ((0,), '?'),
        ((9, 10), '?'),
        ((1, 3, 5), '+'),
        ((5, 3, 1), '-'),
        ((3, 2, 4, 6), '?'),
    ]
    for kmers, expected in cases:
        assert k.which_strand(kmers) == expected, kmers
    k2 = OrderedKmers((1, 2, 3, 4, 5))
    assert not k2.is_dup
    assert k2.which_strand((2, 3, 4)) == '+'
    assert k2.which_strand((4, 3, 2)) == '-'
    assert k2.which_strand((1, 0, 2, 4)) == '+'
    assert k2.which_strand((4, 2, 0, 1)) == '-'
