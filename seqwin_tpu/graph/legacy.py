"""Legacy graph utilities kept for API parity.

Counterparts of `/root/reference/src/seqwin/graph/utils.py:49-311` (unused by
the main pipeline but part of the public surface): a Counter-backed weighted
digraph, composition helpers, and an optional matplotlib drawing routine.
"""
from __future__ import annotations

import logging
from collections import Counter
from collections.abc import Iterable, Sequence
from itertools import chain, tee
from math import sqrt

logger = logging.getLogger(__name__)

EDGE_W: str = 'w'


class WeightedGraph(Counter):
    """Weighted digraph as {(u, v): weight} (edge direction u -> v)."""

    def __init__(self, edges: Iterable[tuple] = ()) -> None:
        super().__init__(edges)

    def add_path(self, nodes: Iterable, cyclic: bool = False) -> None:
        nodes = iter(nodes)
        start_nodes, stop_nodes = tee(nodes, 2)
        try:
            first_node = next(stop_nodes)
        except StopIteration:
            return
        if cyclic:
            stop_nodes = chain(stop_nodes, (first_node,))
        self.update(tuple((u, v)) for u, v in zip(start_nodes, stop_nodes))

    def to_nx_graph(self):
        """Convert to networkx.Graph with weights under EDGE_W."""
        import networkx as nx

        return nx.Graph((*edge, {EDGE_W: weight}) for edge, weight in self.items())


def compose_weighted_graphs(graphs: Iterable[WeightedGraph]) -> WeightedGraph:
    """Sum edge weights across graphs."""
    graphs = iter(graphs)
    try:
        merged = next(graphs)
    except StopIteration:
        raise ValueError('No graph is given to compose.')
    merged = merged.copy()
    for g in graphs:
        merged.update(g)
    return merged


def add_path_weighted(graph, path: Sequence) -> None:
    """Add a path to a weighted nx.Graph, incrementing existing edge weights."""
    for i in range(len(path) - 1):
        u, v = path[i], path[i + 1]
        try:
            graph[u][v]['weight'] += 1
        except KeyError:
            graph.add_edge(u, v, weight=1)


def draw_weighted_graph(
    graph,
    save_path: str | None = None,
    figsize: tuple | None = None,
    node_size: int = 200,
    edge_width: int = 2,
    font_size: int = 8,
    seed: int = 0,
) -> None:
    """Draw a weighted nx.Graph (requires matplotlib)."""
    try:
        from matplotlib import pyplot as plt
    except ImportError:
        raise ImportError('Matplotlib is needed for drawing a graph') from None
    import networkx as nx

    pos = nx.spring_layout(graph, k=2 / sqrt(len(graph)), iterations=5000, weight=None, seed=seed)
    if figsize is not None:
        plt.figure(figsize=figsize)
    nx.draw_networkx_nodes(graph, pos, node_size=node_size)
    nx.draw_networkx_edges(graph, pos, edgelist=graph.edges, width=edge_width)
    edge_labels = nx.get_edge_attributes(graph, 'weight')
    nx.draw_networkx_edge_labels(graph, pos, edge_labels, font_size=font_size)
    ax = plt.gca()
    ax.margins(0.1)
    plt.axis('off')
    plt.tight_layout()
    if save_path is not None:
        plt.savefig(save_path, transparent=True, format='svg')
    plt.show()
