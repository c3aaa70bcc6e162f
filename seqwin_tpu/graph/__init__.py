"""Minimizer-graph public API.

Mirrors the reference facade (`/root/reference/src/seqwin/graph/__init__.py`)
with a TPU-native engine underneath.
"""
from .build import build, filter_kmers as _filter_kmers  # noqa: F401
from .dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE  # noqa: F401
from .hashgraph import HashGraph, OrderedKmers  # noqa: F401
