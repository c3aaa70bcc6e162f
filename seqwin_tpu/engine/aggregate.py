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

Inputs may be chunk-padded (rec == -1 entries anywhere in the stream): the
stable pad-key sort moves padding to the tail without disturbing scan order,
and adjacency pairs never span records, so padding gaps are harmless.
"""
from __future__ import annotations



import numpy as np

import jax
import jax.numpy as jnp

from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE


@jax.jit
def _sort_entries(oh, pos, rec, asm):
    """Stable sort of the minimizer stream by hash (scan order preserved)."""
    pad = (rec < 0).astype(jnp.uint8)
    return jax.lax.sort((pad, oh, pos, rec, asm), num_keys=2, is_stable=True)


@jax.jit
def _edge_triples(oh, rec, asm):
    """Adjacent-pair edge triples (u, v, asm) with validity, sorted."""
    adj = (rec[:-1] == rec[1:]) & (rec[:-1] >= 0)
    u = jnp.minimum(oh[:-1], oh[1:])
    v = jnp.maximum(oh[:-1], oh[1:])
    pad = (~adj).astype(jnp.uint8)
    return jax.lax.sort((pad, u, v, asm[:-1]), num_keys=4, is_stable=False)


def _pad_pow2(arrs, m, fills):
    cap = 1 << max(10, (m - 1).bit_length())
    out = []
    for a, fill in zip(arrs, fills):
        buf = np.full(cap, fill, dtype=a.dtype)
        buf[:m] = a
        out.append(buf)
    return out


def aggregate_device(
    chunks,
    record_offsets: np.ndarray,
    is_target: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Aggregate device-resident chunk results into (kmers, nodes, edges).

    Args:
        chunks: list of (e_oh u64, e_pos u32, e_rec i32, count) where arrays
            are device-resident and padded (rec == -1); chunks are in global
            scan order and records never span chunks.
        record_offsets: uintp[A+1] cumulative record counts per assembly.
        is_target: bool[A].
    """
    chunks = [c for c in chunks if c[0] is not None]
    m = int(sum(c[3] for c in chunks))
    if m == 0:
        return (np.zeros(0, KMER_DTYPE), np.zeros(0, NODE_DTYPE), np.zeros(0, EDGE_DTYPE))

    oh = jnp.concatenate([c[0] for c in chunks])
    pos = jnp.concatenate([c[1] for c in chunks])
    rec = jnp.concatenate([c[2] for c in chunks])
    offsets_j = jnp.asarray(np.asarray(record_offsets, dtype=np.int64))
    asm = (jnp.searchsorted(offsets_j, rec.astype(jnp.int64), side='right') - 1).astype(jnp.int32)

    _, s_oh_j, s_pos_j, s_rec_j, s_asm_j = _sort_entries(oh, pos, rec, asm)
    s_oh = np.asarray(s_oh_j[:m])
    s_pos = np.asarray(s_pos_j[:m])
    s_rec = np.asarray(s_rec_j[:m])
    s_asm = np.asarray(s_asm_j[:m])

    is_target = np.asarray(is_target, dtype=bool)
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

    # ---- edges (adjacent pairs; padding gaps never pair: records don't span) ----
    _, t_u_j, t_v_j, t_a_j = _edge_triples(oh, rec, asm)
    # number of adjacent pairs: within each chunk, count-1 per chunk minus
    # record breaks -- cheapest exact source is the sorted pad key itself
    n_adj = int(np.asarray(jnp.sum((rec[:-1] == rec[1:]) & (rec[:-1] >= 0))))
    t_u = np.asarray(t_u_j[:n_adj])
    t_v = np.asarray(t_v_j[:n_adj])
    t_a = np.asarray(t_a_j[:n_adj])
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

    return kmers, nodes, edges


def aggregate(
    oh: np.ndarray,
    pos: np.ndarray,
    rec: np.ndarray,
    asm: np.ndarray,
    is_target: np.ndarray,
    record_offsets: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NumPy-input wrapper around `aggregate_device` (trimmed scan-order
    arrays in, reference-contract structured arrays out)."""
    m = len(oh)
    if m == 0:
        return (np.zeros(0, KMER_DTYPE), np.zeros(0, NODE_DTYPE), np.zeros(0, EDGE_DTYPE))
    if record_offsets is None:
        # fallback: treat every record as its own assembly boundary via asm;
        # offsets must satisfy searchsorted(offsets, rec, 'right')-1 == asm,
        # which holds when each assembly's records are the contiguous range
        # [offsets[a], offsets[a+1]). Reconstruct from the (rec, asm) pairs.
        n_asm = len(is_target)
        record_offsets = np.zeros(n_asm + 1, dtype=np.int64)
        hi = -1
        for a in range(n_asm):
            sel = rec[asm == a]
            if len(sel):
                hi = max(hi, int(sel.max()))
            record_offsets[a + 1] = hi + 1
    p_oh, p_pos, p_rec = _pad_pow2(
        (oh, pos, rec), m, (0, 0, -1)
    )
    chunk = (jnp.asarray(p_oh), jnp.asarray(p_pos), jnp.asarray(p_rec), m)
    return aggregate_device([chunk], np.asarray(record_offsets), is_target)
