"""Graph aggregation: minimizer stream -> nodes / edges / grouped k-mers.

TPU-native replacement for the reference's hash-map upserts + parallel LSD
radix sort + run-merge (`/root/reference/cpp/src/seqwin/graph.cpp:127-159`,
`/root/reference/cpp/src/seqwin/helpers.cpp:78-297`). The device does the
heavy O(M log M) work as stable multi-key `lax.sort`s; the host finishes with
vectorized NumPy run-length passes (boundary detection + `add.reduceat`),
preserving the reference output contract exactly:

- nodes sorted by hash ascending; k-mers grouped per node in global
  (assembly, record, pos) scan order (guaranteed by the stable sort over the
  scan-ordered stream);
- per-(hash, assembly) deduplicated n_tar / n_neg counts
  (`graph.cpp:130-137` once-per-assembly semantics);
- undirected edges canonicalized u <= v, weight = number of assemblies where
  the endpoints are adjacent at least once (`graph.cpp:147-159`), sorted by
  (first, second).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE


@functools.partial(jax.jit, static_argnames=())
def _sort_entries(oh, pos, rec, asm):
    """Stable sort of the minimizer stream by hash (scan order preserved)."""
    pad = (rec < 0).astype(jnp.uint8)
    return jax.lax.sort((pad, oh, pos, rec, asm), num_keys=2, is_stable=True)


@functools.partial(jax.jit, static_argnames=())
def _sort_edge_triples(u, v, asm, valid):
    pad = (~valid).astype(jnp.uint8)
    return jax.lax.sort((pad, u, v, asm), num_keys=4, is_stable=False)


def aggregate(
    oh: np.ndarray,
    pos: np.ndarray,
    rec: np.ndarray,
    asm: np.ndarray,
    is_target: np.ndarray,
    device=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Aggregate a scan-ordered minimizer stream into (kmers, nodes, edges).

    Args:
        oh: uint64[M] node hashes (out_hash), genome scan order.
        pos: uint32[M] position within record.
        rec: int32[M] global record index.
        asm: int32[M] assembly index (non-decreasing in scan order).
        is_target: bool[A] per assembly.

    Returns:
        (kmers KMER_DTYPE[M], nodes NODE_DTYPE[U], edges EDGE_DTYPE[E]);
        nodes['penalty'] is left 0 for the caller.
    """
    m = len(oh)
    if m == 0:
        return (np.zeros(0, KMER_DTYPE), np.zeros(0, NODE_DTYPE), np.zeros(0, EDGE_DTYPE))

    # ---- nodes + grouped kmers ----
    # pad to a power of two so jit re-traces stay bounded across datasets
    cap = 1 << max(10, (m - 1).bit_length())
    p_oh = np.zeros(cap, np.uint64)
    p_pos = np.zeros(cap, np.uint32)
    p_rec = np.full(cap, -1, np.int32)
    p_asm = np.zeros(cap, np.int32)
    p_oh[:m], p_pos[:m], p_rec[:m], p_asm[:m] = oh, pos, rec, asm
    _, s_oh, s_pos, s_rec, s_asm = (
        np.asarray(x)[:m] for x in _sort_entries(
            jnp.asarray(p_oh), jnp.asarray(p_pos), jnp.asarray(p_rec), jnp.asarray(p_asm)
        )
    )
    boundary = np.empty(m, dtype=bool)
    boundary[0] = True
    boundary[1:] = s_oh[1:] != s_oh[:-1]
    starts = np.flatnonzero(boundary)
    stops = np.append(starts[1:], m)

    first_occ = boundary.copy()
    first_occ[1:] |= s_asm[1:] != s_asm[:-1]
    tar = first_occ & is_target[s_asm]
    neg = first_occ & ~is_target[s_asm]
    n_tar = np.add.reduceat(tar.astype(np.uint32), starts)
    n_neg = np.add.reduceat(neg.astype(np.uint32), starts)

    kmers = np.zeros(m, dtype=KMER_DTYPE)
    kmers['pos'] = s_pos
    kmers['record_idx'] = s_rec.astype(np.uint32)
    nodes = np.zeros(len(starts), dtype=NODE_DTYPE)
    nodes['hash'] = s_oh[starts]
    nodes['start'] = starts
    nodes['stop'] = stops
    nodes['n_tar'] = n_tar
    nodes['n_neg'] = n_neg

    # ---- edges ----
    if m >= 2:
        ecap = cap
        adj = np.zeros(ecap, bool)
        u = np.zeros(ecap, np.uint64)
        v = np.zeros(ecap, np.uint64)
        ea = np.zeros(ecap, np.int32)
        adj[:m - 1] = rec[:-1] == rec[1:]
        u[:m - 1] = np.minimum(oh[:-1], oh[1:])
        v[:m - 1] = np.maximum(oh[:-1], oh[1:])
        ea[:m - 1] = asm[:-1]
        _, t_u, t_v, t_a = (
            np.asarray(x) for x in _sort_edge_triples(
                jnp.asarray(u), jnp.asarray(v), jnp.asarray(ea), jnp.asarray(adj)
            )
        )
        n_adj = int(adj.sum())
        t_u, t_v, t_a = t_u[:n_adj], t_v[:n_adj], t_a[:n_adj]
        if n_adj:
            new_edge = np.empty(n_adj, dtype=bool)
            new_edge[0] = True
            new_edge[1:] = (t_u[1:] != t_u[:-1]) | (t_v[1:] != t_v[:-1])
            new_triple = new_edge.copy()
            new_triple[1:] |= t_a[1:] != t_a[:-1]
            e_starts = np.flatnonzero(new_edge)
            weights = np.add.reduceat(new_triple.astype(np.uint64), e_starts)
            edges = np.zeros(len(e_starts), dtype=EDGE_DTYPE)
            edges['first'] = t_u[e_starts]
            edges['second'] = t_v[e_starts]
            edges['weight'] = weights
        else:
            edges = np.zeros(0, dtype=EDGE_DTYPE)
    else:
        edges = np.zeros(0, dtype=EDGE_DTYPE)

    return kmers, nodes, edges
