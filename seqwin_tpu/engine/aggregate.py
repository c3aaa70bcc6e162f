"""Graph aggregation: minimizer stream -> nodes / edges / grouped k-mers.

TPU-native replacement for the reference's hash-map upserts + parallel LSD
radix sort + run-merge (`/root/reference/cpp/src/seqwin/graph.cpp:127-159`,
`/root/reference/cpp/src/seqwin/helpers.cpp:78-297`). The device does all the
O(M log M) work: stable multi-key `lax.sort`s, run boundaries, cumulative-sum
differences for the per-(hash, assembly)-deduplicated counts, and boundary
extraction via top_k (the host RAM on this machine is far slower than HBM, so
even the run-length merge lives on device). The host only assembles the final
structured arrays. Output contract is exactly the reference's:

- nodes sorted by hash ascending; k-mers grouped per node in global
  (assembly, record, pos) scan order (stable sort over the scan-ordered
  stream);
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

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE

i32 = jnp.int32
i64 = jnp.int64


def _extract_ascending(flags, values, cap: int):
    """Indices (ascending) of set flags, -1-padded at the end, via top_k."""
    n = flags.shape[0]
    z = jnp.where(flags, values, i32(-1))
    cnt = jnp.sum(flags.astype(i32))
    topv, _ = jax.lax.top_k(z, cap)
    asc = topv[::-1]
    n_pad = cap - jnp.minimum(cnt, i32(cap))
    return jnp.roll(asc, -n_pad), cnt


@functools.partial(jax.jit, static_argnames=('node_cap',))
def _merge_nodes(oh, pos, rec, asm, is_target, m, node_cap: int):
    """Sort the stream by hash and reduce runs into node records on device.

    Returns sorted (pos, rec) [the kmers array], per-node
    (hash, start, stop, n_tar, n_neg) padded to node_cap, and counts.
    """
    pad = (rec < 0).astype(jnp.uint8)
    # The payload rides the 5-operand stable sort. A perm-gather variant
    # (sort only (pad, oh, perm), gather the 12 B/row payload) was A/B'd on
    # chip at 8.1 M rows and REFUTED: 0.571 s vs 0.275 s -- three random
    # 8 M-element gathers cost ~2x what they save in sort width on this
    # TPU (PERF.md round 5 "aggregation-tail A/B").
    _, s_oh, s_pos, s_rec, s_asm = jax.lax.sort(
        (pad, oh, pos, rec, asm), num_keys=2, is_stable=True
    )
    n = s_oh.shape[0]
    idx = jnp.arange(n, dtype=i32)
    real = idx < m

    prev_oh = jnp.concatenate([s_oh[:1], s_oh[:-1]])
    prev_asm = jnp.concatenate([jnp.full((1,), i32(-1)), s_asm[:-1]])
    boundary = real & ((idx == 0) | (s_oh != prev_oh))
    first_occ = real & (boundary | (s_asm != prev_asm))

    tgt = is_target[jnp.clip(s_asm, 0, is_target.shape[0] - 1)]
    tar_flag = (first_occ & tgt).astype(i32)
    neg_flag = (first_occ & ~tgt).astype(i32)
    csum_tar = jnp.cumsum(tar_flag)
    csum_neg = jnp.cumsum(neg_flag)

    starts, n_nodes = _extract_ascending(boundary, idx, node_cap)
    live = starts >= 0
    safe = jnp.clip(starts, 0, n - 1)
    stops = jnp.concatenate([safe[1:], jnp.full((1,), i32(0))])
    stops = jnp.where(jnp.concatenate([live[1:], jnp.full((1,), False)]), stops, m)
    stops = jnp.where(live, stops, i32(0))

    node_hash = jnp.where(live, s_oh[safe], jnp.uint64(0))
    # inclusive cumsum diff: sum over [start, stop) = csum[stop-1] - csum[start-1]
    c_at_stop_t = csum_tar[jnp.clip(stops - 1, 0, n - 1)]
    c_at_start_t = jnp.where(safe > 0, csum_tar[jnp.clip(safe - 1, 0, n - 1)], i32(0))
    c_at_stop_n = csum_neg[jnp.clip(stops - 1, 0, n - 1)]
    c_at_start_n = jnp.where(safe > 0, csum_neg[jnp.clip(safe - 1, 0, n - 1)], i32(0))
    n_tar = jnp.where(live, c_at_stop_t - c_at_start_t, i32(0))
    n_neg = jnp.where(live, c_at_stop_n - c_at_start_n, i32(0))

    return s_pos, s_rec, node_hash, jnp.where(live, starts, i32(0)), stops, n_tar, n_neg, n_nodes


@functools.partial(jax.jit, static_argnames=('edge_cap',))
def _merge_edges(oh, rec, asm, edge_cap: int, xu, xv, xa, xn,
                 node_hash=None, n_nodes=None):
    """Canonicalized adjacent-pair edges with per-assembly dedup, on device.

    (xu, xv, xa, xn) are extra out-of-stream pairs -- block-junction edges of
    records split over multiple chunks (`hybrid.scan_record_blocks`); they go
    through the same per-(u, v, assembly) dedup as stream pairs.

    With ``node_hash`` (the sorted node column from `_merge_nodes`) the sort
    runs on u32 NODE-INDEX pairs packed into ONE u64 key instead of two u64
    hash operands (order-isomorphic via `searchsorted`, byte-identical
    output). REFUTED on chip at 8.1 M rows: 4.85 s vs 0.405 s for the hash
    route -- the full-stream binary-search gathers dwarf the 21 -> 13 B/row
    sort-width saving (PERF.md round 5 "aggregation-tail A/B"). Kept behind
    SEQWIN_TPU_EDGE_SORT_IDX=1 (default OFF) with a differential test.
    """
    adj = (rec[:-1] == rec[1:]) & (rec[:-1] >= 0)
    pad = (~adj).astype(jnp.uint8)
    use_idx = node_hash is not None
    if use_idx:
        nc = node_hash.shape[0]
        lifted = jnp.where(jnp.arange(nc, dtype=i32) < n_nodes, node_hash,
                           jnp.uint64(0xFFFFFFFFFFFFFFFF))
        sidx = jnp.searchsorted(lifted, oh).astype(jnp.uint32)
        h_a, h_b = sidx[:-1], sidx[1:]
        xu_m, xv_m = ((jnp.searchsorted(lifted, xu).astype(jnp.uint32),
                       jnp.searchsorted(lifted, xv).astype(jnp.uint32))
                      if xu.shape[0] else (xu, xv))
    else:
        h_a, h_b = oh[:-1], oh[1:]
        xu_m, xv_m = xu, xv
    u = jnp.minimum(h_a, h_b)
    v = jnp.maximum(h_a, h_b)
    if xu.shape[0]:
        xvalid = jnp.arange(xu.shape[0], dtype=i32) < xn
        pad = jnp.concatenate([pad, (~xvalid).astype(jnp.uint8)])
        u = jnp.concatenate([u, jnp.minimum(xu_m, xv_m)])
        v = jnp.concatenate([v, jnp.maximum(xu_m, xv_m)])
        asm_l = jnp.concatenate([asm[:-1], xa])
    else:
        asm_l = asm[:-1]
    if use_idx:
        key = (u.astype(jnp.uint64) << jnp.uint64(32)) | v.astype(jnp.uint64)
        _, t_key, t_a = jax.lax.sort((pad, key, asm_l), num_keys=3,
                                     is_stable=False)
        t_u = t_key  # combined key compares like the (u, v) pair
        t_v = t_key
    else:
        _, t_u, t_v, t_a = jax.lax.sort(
            (pad, u, v, asm_l), num_keys=4, is_stable=False
        )
    n = t_u.shape[0]
    n_adj = jnp.sum(adj.astype(i32)) + xn
    idx = jnp.arange(n, dtype=i32)
    real = idx < n_adj

    prev_u = jnp.concatenate([t_u[:1], t_u[:-1]])
    prev_v = jnp.concatenate([t_v[:1], t_v[:-1]])
    prev_a = jnp.concatenate([jnp.full((1,), i32(-1)), t_a[:-1]])
    new_edge = real & ((idx == 0) | (t_u != prev_u) | (t_v != prev_v))
    new_triple = real & (new_edge | (t_a != prev_a))
    csum = jnp.cumsum(new_triple.astype(i32))

    starts, n_edges = _extract_ascending(new_edge, idx, edge_cap)
    live = starts >= 0
    safe = jnp.clip(starts, 0, n - 1)
    stops = jnp.concatenate([safe[1:], jnp.full((1,), i32(0))])
    stops = jnp.where(jnp.concatenate([live[1:], jnp.full((1,), False)]), stops, n_adj)
    stops = jnp.where(live, stops, i32(0))

    if use_idx:
        kk = t_key[safe]
        gi = jnp.clip((kk >> jnp.uint64(32)).astype(i32), 0, nc - 1)
        gj = jnp.clip((kk & jnp.uint64(0xFFFFFFFF)).astype(i32), 0, nc - 1)
        e_first = jnp.where(live, node_hash[gi], jnp.uint64(0))
        e_second = jnp.where(live, node_hash[gj], jnp.uint64(0))
    else:
        e_first = jnp.where(live, t_u[safe], jnp.uint64(0))
        e_second = jnp.where(live, t_v[safe], jnp.uint64(0))
    c_stop = csum[jnp.clip(stops - 1, 0, n - 1)]
    c_start = jnp.where(safe > 0, csum[jnp.clip(safe - 1, 0, n - 1)], i32(0))
    weight = jnp.where(live, c_stop - c_start, i32(0))
    return e_first, e_second, weight, n_edges


@functools.partial(jax.jit, static_argnames=('out_cap',))
def _compact_chunks(ohs, poss, recs, asms, offs, out_cap: int):
    """Write each chunk's emit-cap-padded block at its cumulative-count
    offset: chunk i+1's block starts exactly where chunk i's real prefix ends,
    overwriting its padding, so real entries end up contiguous in [0, total).

    Slots past the last write keep the rec = -1 init (padding); stale padding
    from an earlier, longer block can also survive there -- both sort to the
    tail in the merges. This shrinks the sorted stream by the ~35-55% emission
    padding (the stream sorts dominate aggregation time on TPU).
    """
    oh = jnp.zeros(out_cap, dtype=ohs[0].dtype)
    pos = jnp.zeros(out_cap, dtype=poss[0].dtype)
    rec = jnp.full(out_cap, -1, dtype=recs[0].dtype)
    asm = jnp.zeros(out_cap, dtype=asms[0].dtype)
    for i in range(len(ohs)):
        o = (offs[i],)
        oh = jax.lax.dynamic_update_slice(oh, ohs[i], o)
        pos = jax.lax.dynamic_update_slice(pos, poss[i], o)
        rec = jax.lax.dynamic_update_slice(rec, recs[i], o)
        asm = jax.lax.dynamic_update_slice(asm, asms[i], o)
    return oh, pos, rec, asm


def _w2(x):  # 64-bit value column -> [n, 2] u32 words (little-endian order)
    return jax.lax.bitcast_convert_type(x.astype(jnp.uint64), jnp.uint32)


@functools.partial(jax.jit, static_argnames=('S',))
def _dslice(buf, i, S: int):
    return jax.lax.dynamic_slice(buf, (i,), (S,))


class _SlabFetch:
    """Two-phase d2h of a large device buffer: slab-slice programs dispatch
    at construction; `pull()` drains them with 2 concurrent transfer threads.

    The relay moves ~50 MB/s with two concurrent d2h streams vs ~38 MB/s
    for one blocking fetch (measured, benchmarks/r5/materialize_probe.json).
    The split matters because the slices are device PROGRAMS: constructing
    the fetch BEFORE dispatching the next compute program (the edge merge)
    keeps the transfers overlapping that compute, exactly like the plain
    `np.asarray` the slabs replace. Slab starts come from ONE compiled
    dynamic-slice program per (len, S) shape (starts are traced --
    per-offset static slices would each pay a remote compile); the last
    slab re-reads an identical-byte overlap so every slab shares the shape.
    SEQWIN_TPU_D2H_THREADS=1 disables slabbing entirely.
    """

    def __init__(self, buf_dev, min_words: int = 1 << 20):
        import os

        n = buf_dev.shape[0]
        self._buf = buf_dev
        self._n = n
        self._threads = int(os.environ.get('SEQWIN_TPU_D2H_THREADS', '2'))
        if self._threads <= 1 or n < 2 * min_words:
            self._slabs = None
            return
        n_slabs = min(8, n // min_words)
        S = min(((n + n_slabs - 1) // n_slabs + 4095) // 4096 * 4096, n)
        self._S = S
        self._starts = sorted({min(i * S, n - S) for i in range(n_slabs)})
        self._slabs = [_dslice(buf_dev, i32(s), S) for s in self._starts]

    def pull(self) -> np.ndarray:
        if self._slabs is None:
            return np.asarray(self._buf)
        from concurrent.futures import ThreadPoolExecutor

        out = np.empty(self._n, np.dtype(self._buf.dtype))
        S = self._S

        def pull_one(i):
            s = self._starts[i]
            out[s:s + S] = np.asarray(self._slabs[i])

        with ThreadPoolExecutor(max_workers=self._threads) as pool:
            list(pool.map(pull_one, range(len(self._starts))))
        self._slabs = None
        return out


def _fetch_slabbed(buf_dev, min_words: int = 1 << 20) -> np.ndarray:
    """One-shot `_SlabFetch` (when there is no compute left to overlap)."""
    return _SlabFetch(buf_dev, min_words).pull()


@functools.partial(jax.jit, static_argnames=('mq', 'nq'))
def _pack_kmers_nodes(s_pos, s_rec, node_hash, n_starts, n_stops, n_tar,
                      n_neg, mq: int, nq: int):
    """Interleave the kmers + nodes columns into the exact byte layouts of
    KMER_DTYPE / NODE_DTYPE, as one flat u32 buffer.

    The host splits the transferred buffer with plain `view()` calls
    (`_split_kmers_nodes`) -- no strided per-field writes (host numpy
    bandwidth is a measured bottleneck, PERF.md) and one jitted program
    instead of an eager op storm over the relay. The u64->u32 bitcast word
    order matches a little-endian numpy view (differentially tested vs the
    oracle backend). Edges ride a separate buffer (`_pack_edges`) so this
    transfer can overlap the edge-merge program on device.
    """
    u32 = jnp.uint32
    kmer_w = jnp.stack(
        [s_pos[:mq].astype(u32), s_rec[:mq].astype(u32)], axis=1)
    node_w = jnp.concatenate([
        _w2(node_hash[:nq]),
        _w2(n_starts[:nq].astype(u32)),
        _w2(n_stops[:nq].astype(u32)),
        n_tar[:nq].astype(u32)[:, None],
        n_neg[:nq].astype(u32)[:, None],
        jnp.zeros((nq, 2), u32),  # penalty slot (f64), filled on host
    ], axis=1)
    return jnp.concatenate([kmer_w.reshape(-1), node_w.reshape(-1)])


@functools.partial(jax.jit, static_argnames=('eq',))
def _pack_edges(e_first, e_second, e_weight, eq: int):
    """EDGE_DTYPE-layout u32 buffer (see `_pack_kmers_nodes`)."""
    edge_w = jnp.concatenate([
        _w2(e_first[:eq]), _w2(e_second[:eq]),
        _w2(e_weight[:eq].astype(jnp.uint32)),
    ], axis=1)
    return edge_w.reshape(-1)


@functools.partial(jax.jit, static_argnames=('mq', 'nq', 'eq'))
def _pack_outputs(s_pos, s_rec, node_hash, n_starts, n_stops, n_tar, n_neg,
                  e_first, e_second, e_weight, mq: int, nq: int, eq: int):
    """Single-buffer variant (fused path): kmers+nodes+edges concatenated,
    jitted so the pack stays ONE device program."""
    return jnp.concatenate([
        _pack_kmers_nodes(s_pos, s_rec, node_hash, n_starts, n_stops,
                          n_tar, n_neg, mq, nq),
        _pack_edges(e_first, e_second, e_weight, eq),
    ])


def _pk16(x, q: int):
    """i32/u32 column -> u16 pairs packed into u32 words (little-endian)."""
    u32 = jnp.uint32
    v = x[:q].astype(u32) & u32(0xFFFF)
    return v[0::2] | (v[1::2] << u32(16))


@functools.partial(jax.jit, static_argnames=('mq', 'nq'))
def _pack_kmers_nodes_compact(s_pos, s_rec, node_hash, n_starts, n_stops,
                              n_tar, n_neg, mq: int, nq: int):
    """Compact column blocks: rec/counts as u16, start as u32, NO stop
    column and no penalty slot -- ~45% fewer d2h wire bytes than the
    interleaved layout (the wire is the measured bottleneck, PERF.md).
    The stop column is redundant on the wire: k-mer segments are contiguous
    in the sorted stream, so stop[i] == start[i+1] and the last real node
    stops at the stream count m -- the host expansion reconstructs it
    (`io/native.expand_kmers_nodes` / the NumPy fallback). ``n_stops`` is
    accepted (shared caller signature with `_pack_kmers_nodes`) but unused.
    Callers must check u16/u32 range guards (record count, assembly count,
    stream length)."""
    del n_stops
    u32 = jnp.uint32
    return jnp.concatenate([
        s_pos[:mq].astype(u32),
        _pk16(s_rec, mq),
        _w2(node_hash[:nq]).reshape(-1),
        n_starts[:nq].astype(u32),
        _pk16(n_tar, nq),
        _pk16(n_neg, nq),
    ])


@functools.partial(jax.jit, static_argnames=('eq',))
def _pack_edges_compact(e_first, e_second, e_weight, eq: int):
    return jnp.concatenate([
        _w2(e_first[:eq]).reshape(-1),
        _w2(e_second[:eq]).reshape(-1),
        _pk16(e_weight, eq),
    ])


@functools.partial(jax.jit, static_argnames=('eq',))
def _pack_edges_idx(e_first, e_second, e_weight, node_hash, n_nodes, eq: int):
    """Edge endpoints as u32 INDICES into the sorted node-hash column --
    10 B/edge on the wire vs 17.5 compact / 24 interleaved (the full edge
    d2h is ~27 MB at reference scale; the wire is the bottleneck, PERF.md).

    Exact, not a hash: every endpoint IS a node hash by construction (edges
    connect emitted minimizers; every emitted minimizer becomes a node), and
    the node column is sorted ascending, so `searchsorted` recovers the
    endpoint's node index and the host re-expands with one contiguous
    gather (`_split_edges_idx`). Dead node lanes (>= n_nodes) hold 0 and
    would break sortedness -- the search key lifts them to U64_MAX."""
    nc = node_hash.shape[0]
    key = jnp.where(jnp.arange(nc, dtype=i32) < n_nodes, node_hash,
                    jnp.uint64(0xFFFFFFFFFFFFFFFF))
    ui = jnp.searchsorted(key, e_first[:eq]).astype(jnp.uint32)
    vi = jnp.searchsorted(key, e_second[:eq]).astype(jnp.uint32)
    return jnp.concatenate([ui, vi, _pk16(e_weight, eq)])


def _split_kmers_nodes_compact(buf: np.ndarray, m: int, n_nodes: int,
                               mq: int, nq: int, stream_m: int | None = None):
    """Expand a `_pack_kmers_nodes_compact` buffer (C fast path; NumPy
    strided-write fallback when the native library is unavailable).

    ``stream_m``: total k-mer stream count = the last real node's stop
    (defaults to ``m``; the deferred path ships mq = 0 k-mer entries but
    still needs the true stream count here)."""
    from ..io import native

    if stream_m is None:
        stream_m = m
    kmers = np.zeros(m, dtype=KMER_DTYPE)
    nodes = np.zeros(n_nodes, dtype=NODE_DTYPE)
    if not native.expand_kmers_nodes(
            np.ascontiguousarray(buf).view(np.uint8), m, n_nodes, mq, nq,
            kmers, nodes, stream_m):
        o = mq
        kmers['pos'] = buf[:mq][:m]
        kmers['record_idx'] = buf[o:o + mq // 2].view(np.uint16)[:m]
        o += mq // 2
        nodes['hash'] = buf[o:o + nq * 2].view(np.uint64)[:n_nodes]
        o += nq * 2
        starts = buf[o:o + nq][:n_nodes]
        nodes['start'] = starts
        if n_nodes:
            nodes['stop'][:-1] = starts[1:]
            nodes['stop'][-1] = stream_m
        o += nq
        nodes['n_tar'] = buf[o:o + nq // 2].view(np.uint16)[:n_nodes]
        o += nq // 2
        nodes['n_neg'] = buf[o:o + nq // 2].view(np.uint16)[:n_nodes]
    return kmers, nodes


def _split_edges_compact(buf: np.ndarray, n_edges: int, eq: int):
    from ..io import native

    edges = np.zeros(n_edges, dtype=EDGE_DTYPE)
    if not native.expand_edges(
            np.ascontiguousarray(buf).view(np.uint8), n_edges, eq, edges):
        edges['first'] = buf[:eq * 2].view(np.uint64)[:n_edges]
        edges['second'] = buf[eq * 2:eq * 4].view(np.uint64)[:n_edges]
        edges['weight'] = buf[eq * 4:eq * 4 + eq // 2].view(np.uint16)[:n_edges]
    return edges


def _split_edges_idx(buf: np.ndarray, n_edges: int, eq: int,
                     node_hashes: np.ndarray) -> np.ndarray:
    """Expand a `_pack_edges_idx` buffer: two contiguous u64 gathers from
    the node-hash column (pass it CONTIGUOUS -- a strided structured-field
    base makes every random read a strided miss on this slow host)."""
    edges = np.zeros(n_edges, dtype=EDGE_DTYPE)
    edges['first'] = node_hashes[buf[:eq][:n_edges]]
    edges['second'] = node_hashes[buf[eq:2 * eq][:n_edges]]
    edges['weight'] = buf[2 * eq:2 * eq + eq // 2].view(np.uint16)[:n_edges]
    return edges


def _split_kmers_nodes(buf: np.ndarray, m: int, n_nodes: int,
                       mq: int, nq: int):
    """Split a `_pack_kmers_nodes` buffer into (kmers, nodes) views."""
    assert KMER_DTYPE.itemsize == 8 and NODE_DTYPE.itemsize == 40
    kmers = buf[:mq * 2].view(KMER_DTYPE)[:m]
    nodes = buf[mq * 2:mq * 2 + nq * 10].view(NODE_DTYPE)[:n_nodes]
    # jax buffers arrive read-only; only nodes is mutated downstream
    # (the penalty fill, pipeline/kmers.py) -- copy just that slice
    if not nodes.flags.writeable:
        nodes = nodes.copy()
    return kmers, nodes


def _split_edges(buf: np.ndarray, n_edges: int, eq: int):
    assert EDGE_DTYPE.itemsize == 24
    return buf[:eq * 6].view(EDGE_DTYPE)[:n_edges]


def _split_outputs(buf: np.ndarray, m: int, n_nodes: int, n_edges: int,
                   mq: int, nq: int, eq: int):
    """Split a `_pack_outputs` buffer into (kmers, nodes, edges) views."""
    kn = mq * 2 + nq * 10
    kmers, nodes = _split_kmers_nodes(buf[:kn], m, n_nodes, mq, nq)
    edges = _split_edges(buf[kn:], n_edges, eq)
    return kmers, nodes, edges


@functools.partial(jax.jit, static_argnames=())
def _count_weight_gt(e_weight, th):
    """#edges with weight > th (padding rows have weight 0, th >= 0)."""
    return jnp.sum((e_weight > th).astype(i32))


@functools.partial(jax.jit, static_argnames=('out_cap', 'compact'))
def _filter_edges_gather(e_first, e_second, e_weight, th, out_cap: int,
                         compact: bool):
    """Gather edges with weight > th into an edge transfer buffer
    (compact u16-weight column blocks, or the interleaved EDGE_DTYPE layout).

    Survivor order is the input order (first, second) ascending -- exactly
    the reference's `edges[edges['weight'] > th]` row order
    (`/root/reference/src/seqwin/kmers.py:171-211`). ``th`` is a TRACED
    scalar, so one compiled program serves every threshold.
    """
    n = e_first.shape[0]
    idx = jnp.arange(n, dtype=i32)
    sel, _ = _extract_ascending(e_weight > th, idx, out_cap)
    live = sel >= 0
    safe = jnp.clip(sel, 0, n - 1)
    z64 = jnp.uint64(0)
    g_first = jnp.where(live, e_first[safe], z64)
    g_second = jnp.where(live, e_second[safe], z64)
    g_weight = jnp.where(live, e_weight[safe], i32(0))
    if compact:
        return _pack_edges_compact(g_first, g_second, g_weight, out_cap)
    ew = jnp.concatenate([
        _w2(g_first), _w2(g_second), _w2(g_weight.astype(jnp.uint64)),
    ], axis=1)
    return ew.reshape(-1)


@functools.partial(jax.jit, static_argnames=('out_cap',))
def _compact_kmers_gather(s_pos, s_rec, n_starts, n_stops, keep, out_cap: int):
    """Gather the k-mer entries of kept nodes into a KMER_DTYPE-layout buffer.

    Device analog of the host segment gather in `graph.build.filter_kmers`
    (itself the vectorized re-design of the reference's sorted-intersection
    compaction, `/root/reference/cpp/src/seqwin/helpers.cpp:426-488`): kept
    segments stay in node (hash) order, entries stay in stream scan order, so
    the result is byte-identical to compacting on host -- but only the
    survivors (~1% at reference scale) ever cross the wire.
    """
    sizes = jnp.where(keep, n_stops - n_starts, i32(0))
    new_stops = jnp.cumsum(sizes)
    total = new_stops[-1]
    j = jnp.arange(out_cap, dtype=i32)
    seg = jnp.searchsorted(new_stops, j, side='right')
    seg_c = jnp.clip(seg, 0, n_starts.shape[0] - 1)
    base = new_stops[seg_c] - sizes[seg_c]
    src = jnp.clip(n_starts[seg_c] + (j - base), 0, s_pos.shape[0] - 1)
    livej = j < total
    u32 = jnp.uint32
    kw = jnp.stack([
        jnp.where(livej, s_pos[src].astype(u32), u32(0)),
        jnp.where(livej, s_rec[src].astype(u32), u32(0)),
    ], axis=1)
    return kw.reshape(-1)


def _encode_edges(e_first, e_second, e_weight, n_nodes, node_hash,
                  eq: int, compact: bool):
    """Dispatch the edge pack program under the ONE shared wire-encoding
    decision (u32 node indices > compact u16-weight columns > interleaved)
    -- the direct-build and DeviceGraph paths must never drift apart here.
    Returns (device buffer, mode) with mode in {'idx', 'compact', 'plain'}."""
    import os

    compact_e = compact and eq % 2 == 0
    if (compact_e and node_hash is not None
            and os.environ.get('SEQWIN_TPU_EDGE_IDX', '1') != '0'):
        return _pack_edges_idx(e_first, e_second, e_weight, node_hash,
                               i32(n_nodes), eq), 'idx'
    if compact_e:
        return _pack_edges_compact(e_first, e_second, e_weight, eq), 'compact'
    return _pack_edges(e_first, e_second, e_weight, eq), 'plain'


def _decode_edges(buf: np.ndarray, n_edges: int, eq: int, mode: str,
                  node_hashes) -> np.ndarray:
    """Host-side expansion matching `_encode_edges`; ``node_hashes`` must be
    a CONTIGUOUS u64 array for mode='idx' (see `_split_edges_idx`)."""
    if mode == 'idx':
        return _split_edges_idx(buf, n_edges, eq, node_hashes)
    if mode == 'compact':
        return _split_edges_compact(buf, n_edges, eq)
    return _split_edges(buf, n_edges, eq)


def _quantized_cap(count: int, hard_cap: int, floor: int = 1 << 12) -> int:
    from .minimizer import next_pow2

    return min(max(floor, next_pow2(max(count, 1))), max(hard_cap, 1))


class DeviceGraph:
    """Deferred aggregation result: nodes on host, the grouped k-mer stream
    and merged edges DEVICE-RESIDENT.

    The reference ships the full kmers/edges arrays to the host and then
    discards ~99% of the k-mers in `filter()` (`seqwin.log:22-33`: 61,907 of
    7.94 M kept). Over the TPU relay that discarded traffic IS the build
    bottleneck (PERF.md wire math), so the pipeline asks for exactly what it
    needs: full nodes at build time (penalty/threshold math is host float64),
    weight-filtered edges once the threshold is known, and the compacted
    k-mers of the kept nodes after subgraph search. `materialize()` preserves
    the full-transfer behavior for `--no-filter` / library users.
    """

    def __init__(self, nodes, s_pos, s_rec, n_starts, n_stops, n_tar, n_neg,
                 e_first, e_second, e_weight, m, n_nodes, n_edges,
                 mq, nq, compact, node_hash=None):
        self.nodes = nodes
        self._s_pos, self._s_rec = s_pos, s_rec
        self._n_starts, self._n_stops = n_starts, n_stops
        self._n_tar, self._n_neg = n_tar, n_neg
        self._e_first, self._e_second, self._e_weight = e_first, e_second, e_weight
        self._node_hash = node_hash  # device-resident sorted hash column
        self.n_kmers = m
        self.n_nodes = n_nodes
        self.n_edges = n_edges
        self._mq, self._nq = mq, nq
        self._compact = compact
        self.record_codes = None  # parsed codes, kept only on request

    def materialize(self) -> tuple[np.ndarray, np.ndarray]:
        """Full (kmers, edges) host arrays -- the non-deferred transfer.
        (Nodes already live on host; a minimal 4k node block rides along so
        the packed layout stays shared with the build-time pack programs.)

        Both pack programs are dispatched BEFORE the first (blocking) d2h so
        the edge pack's device execution rides the kmers transfer."""
        nq = 1 << 12  # node_cap floor; node columns are >= this by construction
        pack_kn = _pack_kmers_nodes_compact if self._compact else _pack_kmers_nodes
        buf_kn_dev = pack_kn(
            self._s_pos, self._s_rec,
            jnp.zeros(nq, jnp.uint64), self._n_starts, self._n_stops,
            self._n_tar, self._n_neg, self._mq, nq,
        )
        kn_fetch = _SlabFetch(buf_kn_dev)
        buf_e_dev, eq, mode = self._dispatch_edges()
        buf_kn = kn_fetch.pull()  # rides the edge pack's device execution
        if self._compact:
            kmers, _ = _split_kmers_nodes_compact(
                buf_kn, self.n_kmers, 0, self._mq, nq)
        else:
            kmers, _ = _split_kmers_nodes(
                buf_kn, self.n_kmers, 0, self._mq, nq)
        return kmers, self._finish_edges(buf_e_dev, eq, mode)

    def _dispatch_edges(self):
        eq = _quantized_cap(self.n_edges, self._e_first.shape[0])
        buf, mode = _encode_edges(
            self._e_first, self._e_second, self._e_weight,
            self.n_nodes, self._node_hash, eq, self._compact)
        return buf, eq, mode

    def _finish_edges(self, buf_dev, eq: int, mode: str) -> np.ndarray:
        buf_e = _fetch_slabbed(buf_dev)
        return _decode_edges(buf_e, self.n_edges, eq, mode,
                             np.ascontiguousarray(self.nodes['hash'])
                             if mode == 'idx' else None)

    def materialize_edges(self) -> np.ndarray:
        return self._finish_edges(*self._dispatch_edges())

    def filter_edges(self, weight_th) -> np.ndarray:
        """EDGE_DTYPE survivors of ``weight > floor(weight_th)``; only they
        cross the wire."""
        th = i32(int(np.uintp(weight_th)))
        cnt = int(_count_weight_gt(self._e_weight, th))
        out_cap = _quantized_cap(cnt, self._e_first.shape[0])
        compact = self._compact and out_cap % 2 == 0
        buf = np.asarray(_filter_edges_gather(
            self._e_first, self._e_second, self._e_weight, th, out_cap,
            compact))
        if compact:
            return _split_edges_compact(buf, cnt, out_cap)
        return buf.view(EDGE_DTYPE)[:cnt]

    def compact_kmers(self, keep: np.ndarray, total: int) -> np.ndarray:
        """KMER_DTYPE entries of nodes flagged in ``keep`` (bool[n_nodes]),
        segments in node order, entries in scan order -- byte-identical to
        the host `filter_kmers` gather."""
        node_cap = self._n_starts.shape[0]
        keep_pad = np.zeros(node_cap, dtype=bool)
        keep_pad[:self.n_nodes] = keep
        out_cap = _quantized_cap(total, self._s_pos.shape[0])
        buf = np.asarray(_compact_kmers_gather(
            self._s_pos, self._s_rec, self._n_starts, self._n_stops,
            jnp.asarray(keep_pad), out_cap))
        return buf.view(KMER_DTYPE)[:total]

    def release(self) -> None:
        """Drop the device references (frees HBM once JAX GCs the buffers)."""
        self._s_pos = self._s_rec = None
        self._n_starts = self._n_stops = self._n_tar = self._n_neg = None
        self._e_first = self._e_second = self._e_weight = None
        self._node_hash = None
        self.record_codes = None


class HostGraph:
    """Host-array implementation of the `DeviceGraph` interface, wrapping the
    materialized (kmers, nodes, edges) of the device-free backends
    (numpy/oracle), the fused one-program build, and the distributed paths."""

    def __init__(self, kmers: np.ndarray, nodes: np.ndarray, edges: np.ndarray):
        self.nodes = nodes
        self._kmers = kmers
        self._edges = edges
        self.n_kmers = len(kmers)
        self.n_nodes = len(nodes)
        self.n_edges = len(edges)
        self.record_codes = None

    def materialize(self) -> tuple[np.ndarray, np.ndarray]:
        return self._kmers, self._edges

    def materialize_edges(self) -> np.ndarray:
        return self._edges

    def filter_edges(self, weight_th) -> np.ndarray:
        return self._edges[self._edges['weight'] > np.uintp(weight_th)]

    def compact_kmers(self, keep: np.ndarray, total: int) -> np.ndarray:
        kept = self.nodes[keep]
        sizes = (kept['stop'] - kept['start']).astype(np.int64)
        new_stops = np.cumsum(sizes)
        if total == 0:
            return np.zeros(0, dtype=KMER_DTYPE)
        seg_idx = (np.arange(total, dtype=np.int64)
                   + np.repeat(kept['start'].astype(np.int64) - (new_stops - sizes), sizes))
        return self._kmers[seg_idx]

    def release(self) -> None:
        self._kmers = self._edges = None
        self.record_codes = None


def aggregate_device(
    chunks,
    record_offsets: np.ndarray,
    is_target: np.ndarray,
    extra_pairs=None,
    defer: bool = False,
):
    """Aggregate device-resident chunk results into (kmers, nodes, edges).

    Args:
        chunks: list of (e_oh u64, e_pos u32, e_rec i32, count) where arrays
            are device-resident and padded (rec == -1); chunks are in global
            scan order. A record may span chunks only as halo'd blocks
            (`hybrid.scan_record_blocks`), whose junction adjacencies arrive
            via ``extra_pairs``.
        record_offsets: uintp[A+1] cumulative record counts per assembly.
        is_target: bool[A].
        extra_pairs: optional [(u, v, assembly_idx), ...] out-of-stream edge
            pairs (block junctions).
        defer: return a `DeviceGraph` (nodes on host, kmers/edges
            device-resident) instead of the (kmers, nodes, edges) tuple.
    """
    chunks = [c for c in chunks if c[0] is not None]
    counts = [int(c[3]) for c in chunks]
    m = sum(counts)
    if m == 0:
        empty = (np.zeros(0, KMER_DTYPE), np.zeros(0, NODE_DTYPE), np.zeros(0, EDGE_DTYPE))
        return HostGraph(empty[0], empty[1], empty[2]) if defer else empty

    have_asm = all(len(c) >= 5 and c[4] is not None for c in chunks)
    offs_h = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int32)
    # round up to a 64k multiple, NOT a power of two: the whole point is a
    # smaller sorted stream, and pow2 rounding can exceed the padded concat
    need = max(o + c[0].shape[0] for o, c in zip(offs_h, chunks))
    out_cap = -(-need // (1 << 16)) << 16
    oh, pos, rec, asm = _compact_chunks(
        tuple(c[0] for c in chunks),
        tuple(c[1] for c in chunks),
        tuple(c[2] for c in chunks),
        tuple(c[4] if have_asm else jnp.zeros_like(c[2]) for c in chunks),
        jnp.asarray(offs_h), out_cap,
    )
    if not have_asm:
        # fallback (sort-engine / oracle inputs): assembly from the compacted
        # record column; the hot path precomputes it in phase 2
        offsets_j = jnp.asarray(np.asarray(record_offsets, dtype=np.int64))
        asm = (jnp.searchsorted(offsets_j, rec.astype(i64), side='right') - 1).astype(i32)
        asm = jnp.where(rec >= 0, asm, i32(0))
    tmask = jnp.asarray(np.asarray(is_target, dtype=bool))

    n_padded = out_cap
    node_cap = min(1 << max(12, (max(1, m // 4) - 1).bit_length()), n_padded)
    while True:
        (s_pos, s_rec, node_hash, n_starts, n_stops, n_tar, n_neg, n_nodes) = _merge_nodes(
            oh, pos, rec, asm, tmask, i32(m), node_cap
        )
        n_nodes = int(n_nodes)
        if n_nodes <= node_cap:
            break
        node_cap = min(1 << (n_nodes - 1).bit_length(), n_padded)

    if extra_pairs:
        xcap = 1 << max(4, (len(extra_pairs) - 1).bit_length())
        xu_h = np.zeros(xcap, np.uint64)
        xv_h = np.zeros(xcap, np.uint64)
        xa_h = np.full(xcap, -1, np.int32)
        for i, (pu, pv, pa) in enumerate(extra_pairs):
            xu_h[i], xv_h[i], xa_h[i] = pu, pv, pa
        xn = len(extra_pairs)
    else:
        xcap, xn = 0, 0
        xu_h = np.zeros(0, np.uint64)
        xv_h = np.zeros(0, np.uint64)
        xa_h = np.zeros(0, np.int32)
    xu, xv, xa = jnp.asarray(xu_h), jnp.asarray(xv_h), jnp.asarray(xa_h)

    # kmers + nodes ship as one buffer, split host-side (4k-quantized sizes
    # for shape reuse). When record/assembly counts fit u16 and the stream
    # fits u32 (always, at reference scale), the COMPACT encoding cuts wire
    # bytes ~35% and a C expansion rebuilds the structured arrays; otherwise
    # the interleaved layout + plain views. The pack program is dispatched
    # BEFORE the edge merge so its d2h transfer overlaps the edge-merge
    # execution on device; edges then ship as a second small buffer.
    import os

    compact = (
        int(record_offsets[-1]) <= 0xFFFF
        and len(is_target) <= 0xFFFF
        and n_padded <= 0xFFFFFFFF
        and os.environ.get('SEQWIN_TPU_COMPACT', '1') != '0'
    )
    q = 1 << 12
    mq = min(-(-max(m, 1) // q) * q, len(s_pos))
    nq = min(-(-max(n_nodes, 1) // q) * q, node_cap)
    pack_kn = _pack_kmers_nodes_compact if compact else _pack_kmers_nodes
    # deferred mode ships the NODE columns only (mq=0); the k-mer stream and
    # the edges stay on device inside the returned DeviceGraph
    from . import timeline

    timeline.mark('agg_merge_nodes_done')
    buf_kn_dev = pack_kn(
        s_pos, s_rec, node_hash, n_starts, n_stops, n_tar, n_neg,
        0 if defer else mq, nq)

    pair_max = (n_padded - 1 if n_padded > 1 else 1) + xcap
    edge_cap = min(node_cap * 4, pair_max)
    # u64 hash sort keys; the packed u32-index-pair variant is REFUTED on
    # this TPU (see `_merge_edges`) and kept only as an A/B knob
    idx_sort = os.environ.get('SEQWIN_TPU_EDGE_SORT_IDX', '0') == '1'
    ekw = (dict(node_hash=node_hash, n_nodes=i32(n_nodes)) if idx_sort
           else {})
    kn_fetch = _SlabFetch(buf_kn_dev)  # slice dispatches precede the merge
    e_first, e_second, e_weight, n_edges_dev = _merge_edges(
        oh, rec, asm, edge_cap, xu, xv, xa, i32(xn), **ekw
    )
    buf_kn = kn_fetch.pull()  # wire time rides the edge merge
    timeline.mark('agg_kn_d2h_done', bytes=buf_kn.nbytes)
    while True:
        n_edges = int(n_edges_dev)
        if n_edges <= edge_cap:
            break
        edge_cap = min(1 << (n_edges - 1).bit_length(), pair_max)
        e_first, e_second, e_weight, n_edges_dev = _merge_edges(
            oh, rec, asm, edge_cap, xu, xv, xa, i32(xn), **ekw
        )

    if defer:
        if compact:
            _, nodes = _split_kmers_nodes_compact(buf_kn, 0, n_nodes, 0, nq,
                                                  stream_m=m)
        else:
            _, nodes = _split_kmers_nodes(buf_kn, 0, n_nodes, 0, nq)
            if not nodes.flags.writeable:
                nodes = nodes.copy()
        return DeviceGraph(
            nodes, s_pos, s_rec, n_starts, n_stops, n_tar, n_neg,
            e_first, e_second, e_weight, m, n_nodes, n_edges, mq, nq, compact,
            node_hash=node_hash,
        )

    eq = min(-(-max(n_edges, 1) // q) * q, edge_cap)
    # eq can be odd only when the (odd) pair_max capacity bound caps it on
    # tiny inputs -- _encode_edges then falls back to the interleaved layout
    buf_e_dev, e_mode = _encode_edges(
        e_first, e_second, e_weight, n_nodes, node_hash, eq, compact)
    buf_e = _fetch_slabbed(buf_e_dev)

    if compact:
        kmers, nodes = _split_kmers_nodes_compact(buf_kn, m, n_nodes, mq, nq)
        # contiguous node-hash column straight from the transfer buffer
        ho = mq + mq // 2
        hash_col = buf_kn[ho:ho + nq * 2].view(np.uint64)
    else:
        kmers, nodes = _split_kmers_nodes(buf_kn, m, n_nodes, mq, nq)
    edges = _decode_edges(buf_e, n_edges, eq, e_mode,
                          hash_col if e_mode == 'idx' else None)
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
        # fallback: reconstruct contiguous per-assembly record ranges from the
        # (rec, asm) pairs (each assembly's records are a contiguous range)
        n_asm = len(is_target)
        hi_per_asm = np.full(n_asm, -1, dtype=np.int64)
        np.maximum.at(hi_per_asm, np.asarray(asm, np.int64), np.asarray(rec, np.int64))
        record_offsets = np.zeros(n_asm + 1, dtype=np.int64)
        record_offsets[1:] = np.maximum.accumulate(hi_per_asm) + 1
    cap = 1 << max(10, (m - 1).bit_length())
    p_oh = np.zeros(cap, np.uint64)
    p_pos = np.zeros(cap, np.uint32)
    p_rec = np.full(cap, -1, np.int32)
    p_oh[:m], p_pos[:m], p_rec[:m] = oh, pos, rec
    chunk = (jnp.asarray(p_oh), jnp.asarray(p_pos), jnp.asarray(p_rec), m)
    return aggregate_device([chunk], np.asarray(record_offsets), is_target)
