"""Multi-chip minimizer graph construction: one shard_map program that scans,
routes, and REDUCES on the bucket owners.

TPU-native analog of the reference's thread sharding + merge
(`/root/reference/cpp/src/seqwin/graph.cpp:291-318` contiguous assembly
partition; `/root/reference/cpp/src/seqwin/helpers.cpp:323-424` concat +
stable radix sort + run-merge). The full build step is a single jitted
shard_map over a 1-D device mesh:

1. **Scan** -- every device runs the fast hybrid engine on its contiguous
   record shard: fused phase-1 (Pallas on TPU, XLA elsewhere), host-computed
   irregular-window patches shipped in as sharded arrays, phase-2 emission
   extraction (`engine/hybrid.py`).
2. **Route** -- emissions (and adjacency pairs, keyed by their canonical
   smaller endpoint) are staged into per-destination blocks with ONE stable
   sort + gather (no scatter: TPU scatter is ~10x slower than sort at 16M
   elements, PERF.md) and exchanged with `all_to_all` over ICI. The hash
   space is range-partitioned monotonically, so device-order concatenation
   of the buckets is globally hash-sorted.
3. **Merge on the owner** -- each device reduces ITS bucket: stable
   hash-sort, per-(hash, assembly) dedup'd n_tar/n_neg node reduction, and
   per-(u, v, assembly) dedup'd edge weights. Only finished node/edge/kmer
   arrays leave the program; the host just trims, rebases kmer offsets, and
   concatenates in device order.

Output is byte-identical to the single-chip `graph.build` for any device
count (the TPU version of the reference's thread-count-equivalence contract,
`/root/reference/tests/smoke/test_graph.py:59-121`).

`scan_record_sharded` additionally shards ONE oversized record across the
mesh with (w-1)-valid-kmer halos; the cross-block emission state is a single
scalar per block (the last emitted position -- see
`engine/hybrid.scan_record_blocks`), exchanged with one all_gather, so the
sequential carry chain costs one tiny collective.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.aggregate import _extract_ascending, _merge_nodes
from ..engine.hybrid import (
    _EMIT_ROW,
    _emission_rows,
    extract_mode,
    host_patches,
    pfx_phase1,
    scan_phase1,
    scan_phase2,
    scan_phase2_pfx,
    use_pallas_phase1,
)
from ..engine.minimizer import next_pow2
from ..ops.hashing import MULTISHIFT, out_hash_mult

_U64 = jnp.uint64
i32 = jnp.int32
i64 = jnp.int64


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the data axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=('d',))


@dataclass(frozen=True)
class ShardSpec:
    """Static geometry of one distributed build step."""

    k: int
    w: int
    n_bases: int        # padded stream length per shard
    offset: int         # stream start offset (pallas halo rows; 0 for XLA)
    emit_cap: int       # per-shard emission capacity
    bucket_cap: int     # per-(src, dst) all_to_all block size
    use_pallas: bool
    # emission-extraction variant, carried HERE (static, part of the jit
    # cache key) rather than read from the env at trace time -- a cached
    # program would otherwise silently keep the mode it was traced with
    extract: str = 'topk'

    @property
    def rx_size(self) -> int:
        return self.bucket_cap  # one block per source, concatenated later


def _hash_bucket(oh, live, n_dev: int):
    """Monotone range partition of the hash space into n_dev buckets
    (dead entries -> bucket n_dev, sorted to the tail)."""
    hi32 = (oh >> _U64(32)).astype(i64)
    return jnp.where(live, ((hi32 * n_dev) >> 32).astype(i32), i32(n_dev))


@functools.lru_cache(maxsize=None)
def _pair_boundaries(n_dev: int) -> tuple[int, ...]:
    """Equal-MASS partition boundaries (top-32-bit space) for the edge-pair
    routing key ``min(u, v)`` of two ~iid uniform out-hashes: its density is
    2(1-x), so equal-WIDTH buckets (`_hash_bucket`) load the owner of bucket
    0 ~2x the mean (measured max/mean 1.435 total at 8 devices -- the
    dryrun's skew assertion caught it). The d-th boundary is
    2^32 * (1 - sqrt(1 - d/n)); any MONOTONE boundaries keep the global
    bucket concatenation hash-sorted, so the output stays byte-identical."""
    d = np.arange(1, n_dev, dtype=np.float64)
    return tuple(np.ceil((1.0 - np.sqrt(1.0 - d / n_dev)) * 2.0**32)
                 .astype(np.int64).tolist())


def _pair_bucket(pu, live, n_dev: int):
    """`_hash_bucket` for edge pairs: same monotone-range contract, with the
    `_pair_boundaries` equal-mass splits. Device twin of `_pair_bucket_host`
    (the count pre-pass, the build step, and the oversized-record extras
    staging must histogram IDENTICALLY -- caps are asserted exact)."""
    if n_dev == 1:
        return jnp.where(live, i32(0), i32(1))
    hi32 = (pu >> _U64(32)).astype(i64)
    b = jnp.asarray(_pair_boundaries(n_dev), dtype=i64)
    # one-pass searchsorted == sum(hi32 >= b) for sorted boundaries, and
    # literally the host twin's algorithm (no [N, n_dev-1] broadcast
    # intermediate at stream scale)
    bucket = jnp.searchsorted(b, hi32, side='right').astype(i32)
    return jnp.where(live, bucket, i32(n_dev))


def _pair_bucket_host(pu: np.ndarray, n_dev: int) -> np.ndarray:
    """Host twin of `_pair_bucket` for pre-scanned extras (all entries live)."""
    hi32 = (pu >> np.uint64(32)).astype(np.int64)
    b = np.asarray(_pair_boundaries(n_dev), dtype=np.int64)
    return np.searchsorted(b, hi32, side='right')


def _route_blocks(bucket, payloads, pads, n_dev: int, cap: int):
    """Stage entries into [n_dev, cap] per-destination blocks.

    One stable sort by bucket (order within a bucket = input order = scan
    order) + searchsorted run bounds + a gather. Returns (blocks, overflow):
    overflow > 0 means some bucket had more than ``cap`` entries.
    """
    m = bucket.shape[0]
    sorted_ops = jax.lax.sort((bucket,) + tuple(payloads), num_keys=1, is_stable=True)
    sb = sorted_ops[0]
    svals = sorted_ops[1:]
    dests = jnp.arange(n_dev, dtype=sb.dtype)
    lo = jnp.searchsorted(sb, dests, side='left')
    cnt = jnp.searchsorted(sb, dests, side='right') - lo
    r = jnp.arange(cap, dtype=i32)[None, :]
    idx = jnp.clip(lo[:, None].astype(i32) + r, 0, m - 1)
    keep = r < cnt[:, None]
    blocks = tuple(
        jnp.where(keep, v[idx], jnp.asarray(pad, dtype=v.dtype))
        for v, pad in zip(svals, pads)
    )
    return blocks, jnp.max(cnt) - cap


def _exchange(blocks):
    """all_to_all each [n_dev, cap] staging block; device j ends up with every
    source's block j, stacked in source order along axis 0."""
    return tuple(
        jax.lax.all_to_all(b, 'd', split_axis=0, concat_axis=0, tiled=False)
        for b in blocks
    )


def _reduce_edges(u, v, asm, valid, edge_cap: int):
    """Per-bucket edge reduction: distinct (u, v) pairs with weight =
    #distinct assemblies (the reference's once-per-assembly edge counting,
    `graph.cpp:147-159`), sorted by (first, second)."""
    pad = (~valid).astype(jnp.uint8)
    _, t_u, t_v, t_a = jax.lax.sort((pad, u, v, asm), num_keys=4, is_stable=False)
    n = t_u.shape[0]
    n_real = jnp.sum(valid.astype(i32))
    idx = jnp.arange(n, dtype=i32)
    real = idx < n_real

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
    stops = jnp.where(jnp.concatenate([live[1:], jnp.full((1,), False)]), stops, n_real)
    stops = jnp.where(live, stops, i32(0))
    e_first = jnp.where(live, t_u[safe], _U64(0))
    e_second = jnp.where(live, t_v[safe], _U64(0))
    c_stop = csum[jnp.clip(stops - 1, 0, n - 1)]
    c_start = jnp.where(safe > 0, csum[jnp.clip(safe - 1, 0, n - 1)], i32(0))
    weight = jnp.where(live, c_stop - c_start, i32(0))
    return e_first, e_second, weight, n_edges


def _shard_phase1(codes_aug, spec: ShardSpec, with_hashes: bool = False):
    if spec.use_pallas:
        from ..engine.pallas_scan import L as _LANES, pallas_phase1

        interpret = jax.default_backend() not in ('tpu', 'axon')
        z_clean, c_lo, c_hi = pallas_phase1(
            codes_aug.reshape(-1, _LANES), spec.k, spec.w,
            interpret=interpret, with_hashes=with_hashes,
        )
        tail = spec.n_bases - z_clean.shape[0]
        if tail:
            z_clean = jnp.concatenate([z_clean, jnp.full((tail,), i32(-1))])
        return z_clean, c_lo, c_hi
    return scan_phase1(codes_aug, spec.k, spec.w, with_hashes=with_hashes)


def _shard_step(
    codes_aug, patch_pos, patch_z, starts, rec_base,
    asm_tab, is_target,
    spec: ShardSpec, n_dev: int,
    extras=None,
):
    """Per-device body: hybrid scan + routed per-bucket node/edge merge.

    ``extras`` = optional (x_oh, x_pos, x_rec, x_asm) pre-scanned emissions
    appended AFTER this device's own output: the emission streams of
    oversized records scanned by `scan_record_sharded` (sequence sharding
    composed into the distributed build). The oversized record is by
    construction the LAST record of its owning device, so appending keeps
    the global (assembly, record, pos) scan order that the stable bucket
    merge relies on; adjacency pairs across its block junctions form
    naturally in the concatenated stream (no bridge bookkeeping).
    """
    codes_aug = codes_aug.reshape(-1)
    patch_pos = patch_pos.reshape(-1)
    patch_z = patch_z.reshape(-1)
    starts = starts.reshape(-1)
    rec_base = rec_base.reshape(())
    asm_tab = asm_tab.reshape(-1)
    is_target = is_target.reshape(-1)

    if spec.extract == 'pfx':
        # emission scan folded into phase 1 (same scheme as the per-chunk
        # path: tile staircases + sparse-side patch merge)
        zpfx, lrank, ts = pfx_phase1(
            codes_aug, spec.k, spec.w, spec.n_bases, spec.offset,
            spec.use_pallas)
        e_oh, e_pos, e_rec, count, e_asm = scan_phase2_pfx(
            zpfx, lrank, codes_aug, patch_pos, patch_z, starts,
            rec_base.astype(i32), asm_tab, spec.emit_cap, spec.k,
            spec.offset, ts,
        )
    else:
        z_clean, _, _ = _shard_phase1(codes_aug, spec)
        e_oh, e_pos, e_rec, count, e_asm = scan_phase2(
            z_clean, codes_aug, patch_pos, patch_z, starts,
            rec_base.astype(i32), asm_tab, spec.emit_cap, spec.k,
            extract=spec.extract,
        )
    if extras is not None:
        # count stays scan-only (it feeds the emit_cap overflow assert);
        # extras land in m via the routed rec >= 0 mask
        x_oh, x_pos, x_rec, x_asm = (x.reshape(-1) for x in extras)
        e_oh = jnp.concatenate([e_oh, x_oh])
        e_pos = jnp.concatenate([e_pos, x_pos])
        e_rec = jnp.concatenate([e_rec, x_rec])
        e_asm = jnp.concatenate([e_asm, x_asm])
    live = e_rec >= 0

    # --- adjacency pairs at the source (never span records or shards) ---
    nxt_oh = jnp.concatenate([e_oh[1:], e_oh[:1]])
    nxt_rec = jnp.concatenate([e_rec[1:], jnp.full((1,), i32(-1))])
    pair_ok = live & (e_rec == nxt_rec)
    p_u = jnp.minimum(e_oh, nxt_oh)
    p_v = jnp.maximum(e_oh, nxt_oh)

    # --- route minimizers to their hash-bucket owners ---
    cap = spec.bucket_cap
    (b_oh, b_pos, b_rec, b_asm), mo = _route_blocks(
        _hash_bucket(e_oh, live, n_dev),
        (e_oh, e_pos, e_rec, e_asm),
        (0, 0, -1, 0), n_dev, cap,
    )
    rx_oh, rx_pos, rx_rec, rx_asm = _exchange((b_oh, b_pos, b_rec, b_asm))
    rx_oh, rx_pos, rx_rec, rx_asm = (
        rx_oh.reshape(-1), rx_pos.reshape(-1), rx_rec.reshape(-1), rx_asm.reshape(-1),
    )
    rx = rx_oh.shape[0]

    # --- route edge pairs by bucket(first) ---
    (b_u, b_v, b_ea), eo = _route_blocks(
        _pair_bucket(p_u, pair_ok, n_dev),
        (p_u, p_v, e_asm),
        (0, 0, -1), n_dev, cap,
    )
    rx_u, rx_v, rx_ea = _exchange((b_u, b_v, b_ea))
    rx_u, rx_v, rx_ea = rx_u.reshape(-1), rx_v.reshape(-1), rx_ea.reshape(-1)

    # --- merge this bucket: nodes + grouped kmers ---
    m = jnp.sum((rx_rec >= 0).astype(i32))
    (s_pos, s_rec, node_hash, n_start, n_stop, n_tar, n_neg, n_nodes) = _merge_nodes(
        rx_oh, rx_pos, rx_rec, rx_asm, is_target, m, rx
    )
    e_first, e_second, e_weight, n_edges = _reduce_edges(
        rx_u, rx_v, rx_ea, rx_ea >= 0, rx
    )

    overflow = jnp.maximum(jnp.maximum(mo, eo), count - spec.emit_cap)
    return (
        s_pos[None], s_rec[None],
        node_hash[None], n_start[None], n_stop[None], n_tar[None], n_neg[None],
        e_first[None], e_second[None], e_weight[None],
        m[None], n_nodes[None], n_edges[None], count[None], overflow[None],
    )


@functools.partial(jax.jit, static_argnames=('spec', 'n_dev', 'mesh'))
def _sharded_build_jit(
    codes_aug, patch_pos, patch_z, starts, rec_base, asm_tab, is_target,
    spec, n_dev, mesh,
):
    body = functools.partial(_shard_step, spec=spec, n_dev=n_dev)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P('d'), P('d'), P('d'), P('d'), P('d'), P('d'), P()),
        out_specs=tuple(P('d') for _ in range(15)),
    )(codes_aug, patch_pos, patch_z, starts, rec_base, asm_tab, is_target)


@functools.partial(jax.jit, static_argnames=('spec', 'n_dev', 'mesh'))
def _sharded_build_x_jit(
    codes_aug, patch_pos, patch_z, starts, rec_base, asm_tab, is_target,
    x_oh, x_pos, x_rec, x_asm,
    spec, n_dev, mesh,
):
    """`_sharded_build_jit` variant with per-device extra emissions (the
    sequence-sharding composition); a separate entry point so the common
    no-oversized-records program keeps its compiled shape."""

    def body(codes_aug, patch_pos, patch_z, starts, rec_base, asm_tab,
             is_target, x_oh, x_pos, x_rec, x_asm):
        return _shard_step(
            codes_aug, patch_pos, patch_z, starts, rec_base, asm_tab,
            is_target, spec, n_dev, extras=(x_oh, x_pos, x_rec, x_asm),
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P('d'), P('d'), P('d'), P('d'), P('d'), P('d'), P(),
                  P('d'), P('d'), P('d'), P('d')),
        out_specs=tuple(P('d') for _ in range(15)),
    )(codes_aug, patch_pos, patch_z, starts, rec_base, asm_tab, is_target,
      x_oh, x_pos, x_rec, x_asm)


def _last_valid_scan(oh, pos, valid):
    """Inclusive scan carrying the (oh, pos) of the last valid entry at or
    before each position ('last valid' is associative)."""

    def combine(a, b):
        return (
            jnp.where(b[2], b[0], a[0]),
            jnp.where(b[2], b[1], a[1]),
            a[2] | b[2],
        )

    return jax.lax.associative_scan(combine, (oh, pos, valid))


def _count_step(codes_aug, patch_pos, patch_z, starts, spec: ShardSpec,
                n_dev: int):
    """Per-device body of the count pre-pass: EXACT emission count, max
    per-emission-row burst, and per-destination staging histograms for both
    minimizers and adjacency pairs -- everything needed to size
    `ShardSpec.emit_cap` / `bucket_cap` exactly, so the big build program
    never re-specializes (a recompile costs ~45 s on the remote toolchain).
    """
    codes_aug = codes_aug.reshape(-1)
    patch_pos = patch_pos.reshape(-1)
    patch_z = patch_z.reshape(-1)
    starts = starts.reshape(-1)

    z_clean, c_lo, c_hi = _shard_phase1(codes_aug, spec, with_hashes=True)
    z = z_clean.at[patch_pos].set(patch_z, mode='drop')
    _, emit_r = _emission_rows(z)
    row_max = jnp.max(jnp.sum(emit_r.astype(i32), axis=1))
    emit = emit_r.reshape(-1)[:z.shape[0]]
    count = jnp.sum(emit.astype(i32))
    if spec.extract == 'pfx':
        # scan_phase2_pfx forces its overflow retry on the CLEAN-only count
        # (patch suppressions may shrink the total below it), so emit_cap
        # must cover that count too or the "caps are exact" assert trips
        _, emit_rc = _emission_rows(z_clean)
        count = jnp.maximum(
            count,
            jnp.sum(emit_rc.reshape(-1)[:z.shape[0]].astype(i32)))

    # out-hash per position, elementwise (emissions never land in the
    # trimmed pallas tail, so slicing to the hash buffer length is exact)
    nc = c_lo.shape[0]
    emit_c = emit[:nc]
    mult = jnp.uint64(out_hash_mult(spec.k))
    t = (c_lo.astype(_U64) | (c_hi.astype(_U64) << _U64(32))) * mult
    oh = t ^ (t >> _U64(MULTISHIFT))
    # the build routes the hash AT THE MINIMIZER POSITION z[p] (scan_phase2
    # emits eidx = z, then hashes there) -- bucketing oh at the flag position
    # p would make these histograms a statistical proxy and let bucket_cap
    # undersize (the build then has no retry: caps are asserted exact)
    ohz = oh[jnp.clip(z[:nc], 0, nc - 1)]

    # adjacency pairs = consecutive emissions within one record: recover the
    # previous emission per position with one associative scan
    iota = jnp.arange(nc, dtype=i32)
    rec_local = jnp.searchsorted(starts, iota, side='right').astype(i32) - 1
    last_oh, last_pos, last_valid = _last_valid_scan(ohz, iota, emit_c)
    prev_oh = jnp.concatenate([last_oh[:1], last_oh[:-1]])
    prev_pos = jnp.concatenate([last_pos[:1], last_pos[:-1]])
    prev_valid = jnp.concatenate([jnp.zeros(1, bool), last_valid[:-1]])
    same_rec = rec_local == rec_local[jnp.clip(prev_pos, 0, nc - 1)]
    pair_ok = emit_c & prev_valid & same_rec
    p_u = jnp.minimum(ohz, prev_oh)

    e_bucket = _hash_bucket(ohz, emit_c, n_dev)
    p_bucket = _pair_bucket(p_u, pair_ok, n_dev)
    e_hist = jnp.stack(
        [jnp.sum((e_bucket == i32(d)).astype(i32)) for d in range(n_dev)])
    p_hist = jnp.stack(
        [jnp.sum((p_bucket == i32(d)).astype(i32)) for d in range(n_dev)])
    return count[None], row_max[None], e_hist[None], p_hist[None]


@functools.partial(jax.jit, static_argnames=('spec', 'n_dev', 'mesh'))
def _sharded_count_jit(codes_aug, patch_pos, patch_z, starts, spec, n_dev, mesh):
    body = functools.partial(_count_step, spec=spec, n_dev=n_dev)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P('d'), P('d'), P('d'), P('d')),
        out_specs=tuple(P('d') for _ in range(4)),
    )(codes_aug, patch_pos, patch_z, starts)


def _emit_cap_for(count_max: int, row_max: int, n: int) -> int:
    """Smallest pow2 emission capacity covering the exact count AND the max
    per-row burst (scan_phase2's cap_row scales with emit_cap)."""
    B = _EMIT_ROW
    ec = min(max(1 << 12, next_pow2(max(count_max, 1))), n)
    while ec < n:
        cap_row = min(max(32, next_pow2(2 * ec * B // max(n, 1) + 32)), B)
        if cap_row >= row_max:
            break
        ec = min(ec * 2, n)
    return ec


def partition_records(record_lengths, n_dev: int):
    """Contiguous, load-balanced record partition (device analog of the
    reference's base+remainder thread split, `graph.cpp:305-306`).

    Returns per-record shard assignment as an int array.
    """
    total = int(sum(record_lengths))
    budget = total / n_dev if n_dev else 0
    out = np.zeros(len(record_lengths), dtype=np.int32)
    acc = 0
    d = 0
    for i, n in enumerate(record_lengths):
        # advance once the running total REACHES this device's share (>=,
        # not >: with equal-size records the strict test left one extra
        # record on every device, inflating the max shard ~12% and -- after
        # pow2 stream padding -- costing up to 2x scan time per step)
        if acc >= budget * (d + 1) and d < n_dev - 1:
            d += 1
        out[i] = d
        acc += int(n)
    return out


def _shard_layout(record_codes, shard_of, n_dev: int, k: int, w: int,
                  use_pallas: bool, min_bases: int = 1 << 14,
                  rec_base_override: np.ndarray | None = None):
    """Host prep: per-shard augmented code streams, record starts, and
    irregular-window patches, all padded to shared shapes.

    ``rec_base_override``: per-device global index of the first stream
    record, for layouts where some records are NOT in the streams (oversized
    records composed in as pre-scanned extras)."""
    per_dev: list[list[np.ndarray]] = [[] for _ in range(n_dev)]
    for c, d in zip(record_codes, shard_of):
        per_dev[d].append(c)
    if rec_base_override is not None:
        rec_base = np.asarray(rec_base_override, dtype=np.int32).copy()
    else:
        rec_base = np.zeros(n_dev, dtype=np.int32)
        cum = 0
        for d in range(n_dev):
            rec_base[d] = cum
            cum += len(per_dev[d])

    max_total = max((sum(len(c) for c in recs) for recs in per_dev), default=1)
    if use_pallas:
        from ..engine.pallas_scan import phase1_shapes

        _, n, offset = phase1_shapes(max(max_total, min_bases), k, w,
                                     quant='eighth')
    else:
        # pow2/8 quantization (<= 12.5% padding): every device pays the
        # padded scan, so pow2 rounding costs up to 2x step time
        p2 = next_pow2(max(1, max_total))
        step = max(1 << 14, p2 // 8)
        n = max(min_bases, min(p2, -(-max_total // step) * step))
        offset = 0

    scap = max(64, next_pow2(max((len(r) for r in per_dev), default=1)))
    codes = np.full((n_dev, n), 255, dtype=np.uint8)
    starts = np.full((n_dev, scap), n, dtype=np.int32)
    patches = []
    for d, recs in enumerate(per_dev):
        off = offset
        for ri, c in enumerate(recs):
            codes[d, off:off + len(c)] = c
            starts[d, ri] = off
            off += len(c)
        codes[d, starts[d, :len(recs)]] |= 64
        patches.append(host_patches(
            starts[d, :len(recs)].astype(np.int64), k, w, n, total=off,
            codes=codes[d],
        ))

    pcap = max(256, next_pow2(max((len(p[0]) for p in patches), default=1) or 1))
    patch_pos = np.full((n_dev, pcap), n, dtype=np.int32)
    patch_z = np.full((n_dev, pcap), -1, dtype=np.int32)
    for d, (pp, pz) in enumerate(patches):
        patch_pos[d, :len(pp)] = pp
        patch_z[d, :len(pp)] = pz
    return codes, starts, patch_pos, patch_z, rec_base, n, offset


def _to_mesh_arrays(mesh: Mesh, sharded: dict, replicated: dict):
    """Device-put inputs for the build program. Single-process: plain arrays.
    Multi-process: every process contributes the rows of the devices IT
    addresses (`jax.make_array_from_process_local_data`), so the global
    [D, ...] arrays exist without any host holding them whole."""
    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in {**sharded, **replicated}.items()}
    from jax.sharding import NamedSharding

    out = {}
    for k, v in sharded.items():
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P('d')), v
        )
    for k, v in replicated.items():
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), v
        )
    return out


def _assign_with_oversized(lengths, over: set, n_dev: int):
    """Contiguous shard assignment where every oversized record TERMINATES
    its device (its pre-scanned emissions are appended after the device's own
    output, so no later record may share the device). Returns
    (shard_of, rec_base_override) or (None, None) when infeasible (a record
    follows an oversized record on the already-last device)."""
    shard_of = np.zeros(len(lengths), dtype=np.int32)
    norm_total = sum(ln for i, ln in enumerate(lengths) if i not in over)
    target = norm_total / n_dev if n_dev else 0
    d, acc, closed = 0, 0, False
    glob_acc = 0
    for i, ln in enumerate(lengths):
        if i in over:
            shard_of[i] = d
            closed = True
            continue
        if closed:
            if d >= n_dev - 1:
                return None, None
            d += 1
            closed = False
        # >= like partition_records: the strict test leaves one extra record
        # per device with equal-size records (~12% max-shard inflation)
        elif acc > 0 and glob_acc >= target * (d + 1) and d < n_dev - 1:
            d += 1
            acc = 0
        shard_of[i] = d
        acc += int(ln)
        glob_acc += int(ln)
    # per-device global index of the first STREAM (non-oversized) record
    rec_base = np.zeros(n_dev, dtype=np.int32)
    seen = [False] * n_dev
    for i, ln in enumerate(lengths):
        if i in over:
            continue
        dd = int(shard_of[i])
        if not seen[dd]:
            rec_base[dd] = i
            seen[dd] = True
    return shard_of, rec_base


def build_distributed_arrays(
    record_codes: list[np.ndarray],
    record_offsets: np.ndarray,
    is_target,
    kmerlen: int,
    windowsize: int,
    mesh: Mesh,
    use_pallas: bool | None = None,
    rec_base0: int = 0,
):
    """Distributed build from parsed records; returns (kmers, nodes, edges)
    structured arrays, byte-identical to the single-chip path.

    Multi-host: each process passes only ITS OWN records (a contiguous global
    range starting at global record index ``rec_base0``) plus the GLOBAL
    ``record_offsets``/``is_target``; the mesh spans all processes and the
    bucket merge crosses DCN transparently.
    """
    from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE

    multiproc = jax.process_count() > 1
    n_local = (
        len([d for d in mesh.devices.flat if d.process_index == jax.process_index()])
        if multiproc else mesh.devices.size
    )
    n_dev = mesh.devices.size
    if use_pallas is None:
        use_pallas = use_pallas_phase1()
    # --- sequence sharding composed into the distributed build ---
    # A record larger than ~2x the balanced per-device share would inflate
    # the SHARED padded stream shape for every device (the reference streams
    # any record length through one thread, `graph.cpp:106-110`). Such
    # records are instead scanned with `scan_record_sharded` (halo blocks +
    # one-all_gather carry over the same mesh) and their emission streams
    # ride into the main program as per-device extras.
    lengths = [len(c) for c in record_codes]
    total_b = int(sum(lengths))
    seq_budget = max(1 << 16, -(-2 * total_b // max(n_local, 1)))
    oversized: list[int] = []
    if not multiproc and n_local > 1:
        oversized = [i for i, ln in enumerate(lengths) if ln > seq_budget]
    shard_of, rec_base_over = (None, None)
    if oversized:
        shard_of, rec_base_over = _assign_with_oversized(
            lengths, set(oversized), n_local)
        if shard_of is None:
            import logging

            logging.getLogger(__name__).warning(
                'oversized records cannot terminate their shards (too many '
                'near the tail); falling back to the inflated-stream layout')
            oversized = []
    if shard_of is None:
        shard_of = partition_records(lengths, n_local)
    normal_idx = [i for i in range(len(lengths)) if i not in set(oversized)]
    min_bases = 1 << 14
    if multiproc:
        # static geometry must agree across processes: exchange the largest
        # per-device stream total first and lay every process out to it
        # (`phase1_shapes` is deterministic in its input, so equal budgets
        # give equal padded shapes)
        from jax.experimental import multihost_utils

        local_max = max(
            (sum(len(c) for c, d in zip(record_codes, shard_of) if d == dev)
             for dev in range(n_local)), default=1,
        )
        min_bases = max(min_bases, int(multihost_utils.process_allgather(
            np.asarray([local_max], dtype=np.int64)).max()))
    if oversized:
        stream_codes = [record_codes[i] for i in normal_idx]
        stream_shard = np.asarray([shard_of[i] for i in normal_idx], np.int32)
    else:
        stream_codes, stream_shard = record_codes, shard_of
    codes, starts, patch_pos, patch_z, rec_base, n, offset = _shard_layout(
        stream_codes, stream_shard, n_local, kmerlen, windowsize, use_pallas,
        min_bases=min_bases, rec_base_override=rec_base_over,
    )
    rec_base += np.int32(rec_base0)

    # scan oversized records over the whole mesh (their own, record-sized
    # programs) and stage their emission streams as per-device extras
    extras = None
    e_hist_x = p_hist_x = None
    if oversized:
        off_h = np.asarray(record_offsets, dtype=np.int64)
        per_dev_x: list[list[tuple]] = [[] for _ in range(n_local)]
        for i in oversized:
            (x_oh, x_pos, x_rec), _bridges = scan_record_sharded(
                record_codes[i], kmerlen, windowsize, mesh,
                rec_idx=i + rec_base0, record_offsets=record_offsets,
                use_pallas=use_pallas,
            )
            # junction pairs form naturally in the concatenated stream;
            # the returned bridge pairs are deliberately dropped
            asm_i = int(np.searchsorted(off_h, i + rec_base0, side='right') - 1)
            per_dev_x[int(shard_of[i])].append((x_oh, x_pos, x_rec, asm_i))
        xcap = max(128, next_pow2(max(
            (sum(len(t[0]) for t in lst) for lst in per_dev_x), default=1)))
        x_oh = np.zeros((n_local, xcap), np.uint64)
        x_pos = np.zeros((n_local, xcap), np.uint32)
        x_rec = np.full((n_local, xcap), -1, np.int32)
        x_asm = np.zeros((n_local, xcap), np.int32)
        e_hist_x = np.zeros((n_local, n_dev), np.int64)
        p_hist_x = np.zeros((n_local, n_dev), np.int64)
        for d, lst in enumerate(per_dev_x):
            o = 0
            for oh_i, pos_i, rec_i, asm_i in lst:
                ln = len(oh_i)
                x_oh[d, o:o + ln] = oh_i
                x_pos[d, o:o + ln] = pos_i
                x_rec[d, o:o + ln] = rec_i
                x_asm[d, o:o + ln] = asm_i
                # exact staging histograms for the extras (host-side): the
                # count pre-pass only sees the stream records
                eb = ((oh_i >> np.uint64(32)).astype(np.int64) * n_dev) >> 32
                e_hist_x[d] += np.bincount(eb, minlength=n_dev)
                if ln > 1:
                    pu = np.minimum(oh_i[:-1], oh_i[1:])
                    pb = _pair_bucket_host(pu, n_dev)
                    p_hist_x[d] += np.bincount(pb, minlength=n_dev)
                o += ln
        extras = (x_oh, x_pos, x_rec, x_asm)
    if multiproc:
        # ragged per-process caps (record/patch counts) pad to the global max
        from jax.experimental import multihost_utils

        agreed = multihost_utils.process_allgather(np.asarray(
            [starts.shape[1], patch_pos.shape[1]], dtype=np.int64))
        scap_g, pcap_g = (int(x) for x in np.asarray(agreed).max(axis=0))
        if scap_g != starts.shape[1]:
            starts = np.pad(starts, ((0, 0), (0, scap_g - starts.shape[1])),
                            constant_values=n)
        if pcap_g != patch_pos.shape[1]:
            pad = pcap_g - patch_pos.shape[1]
            patch_pos = np.pad(patch_pos, ((0, 0), (0, pad)), constant_values=n)
            patch_z = np.pad(patch_z, ((0, 0), (0, pad)), constant_values=-1)
    from ..engine.hybrid import _asm_table

    scap = starts.shape[1]
    asm_tab = np.zeros((n_local, scap), dtype=np.int32)
    for d in range(n_local):
        asm_tab[d] = _asm_table(
            record_offsets, int(rec_base[d]), int(np.sum(stream_shard == d)),
            scap,
        )
    tmask_h = np.asarray(is_target, dtype=bool)
    acap = max(8, next_pow2(len(tmask_h)))
    tmask = np.zeros(acap, dtype=bool)
    tmask[:len(tmask_h)] = tmask_h

    # mesh inputs are cap-independent: build them ONCE (one h2d), shared by
    # the count pre-pass and the main program
    ins = _to_mesh_arrays(
        mesh,
        sharded=dict(
            codes=codes, patch_pos=patch_pos, patch_z=patch_z,
            starts=starts, rec_base=rec_base.reshape(-1, 1),
            asm_tab=asm_tab,
        ),
        replicated=dict(tmask=tmask),
    )

    # EXACT capacity sizing via a count-only pre-pass: emit/bucket caps are
    # static shard_map geometry, so a cap retry would re-specialize (and
    # re-compile, ~45 s on the remote toolchain) the big program. The
    # pre-pass costs one extra phase-1 scan and makes overflow impossible.
    spec0 = ShardSpec(
        k=kmerlen, w=windowsize, n_bases=n, offset=offset,
        emit_cap=0, bucket_cap=0, use_pallas=use_pallas,
        extract=extract_mode(),
    )
    cnt_out = _sharded_count_jit(
        ins['codes'], ins['patch_pos'], ins['patch_z'], ins['starts'],
        spec0, n_dev, mesh,
    )
    if multiproc:
        from jax.experimental import multihost_utils

        cnt_out = tuple(
            np.asarray(multihost_utils.process_allgather(o, tiled=True))
            for o in cnt_out
        )
    counts_h, row_maxes, e_hist, p_hist = (np.asarray(o) for o in cnt_out)
    emit_cap = _emit_cap_for(int(counts_h.max()), int(row_maxes.max()), n)
    if e_hist_x is not None:  # extras route through the same staging blocks
        e_hist = e_hist + e_hist_x
        p_hist = p_hist + p_hist_x
    per_block_max = int(max(e_hist.max(), p_hist.max(), 1))
    bucket_cap = max(1 << 10, next_pow2(per_block_max))

    spec = ShardSpec(
        k=kmerlen, w=windowsize, n_bases=n, offset=offset,
        emit_cap=emit_cap, bucket_cap=bucket_cap, use_pallas=use_pallas,
        extract=extract_mode(),
    )
    if extras is not None:
        xins = _to_mesh_arrays(
            mesh,
            sharded=dict(x_oh=extras[0], x_pos=extras[1], x_rec=extras[2],
                         x_asm=extras[3]),
            replicated={},
        )
        out = _sharded_build_x_jit(
            ins['codes'], ins['patch_pos'], ins['patch_z'],
            ins['starts'], ins['rec_base'],
            ins['asm_tab'], ins['tmask'],
            xins['x_oh'], xins['x_pos'], xins['x_rec'], xins['x_asm'],
            spec, n_dev, mesh,
        )
    else:
        out = _sharded_build_jit(
            ins['codes'], ins['patch_pos'], ins['patch_z'],
            ins['starts'], ins['rec_base'],
            ins['asm_tab'], ins['tmask'],
            spec, n_dev, mesh,
        )
    if multiproc:
        from jax.experimental import multihost_utils

        out = tuple(
            np.asarray(multihost_utils.process_allgather(o, tiled=True))
            for o in out
        )
    (s_pos, s_rec, node_hash, n_start, n_stop, n_tar, n_neg,
     e_first, e_second, e_weight, m, n_nodes, n_edges, counts, overflow) = out
    overflow = int(np.asarray(overflow).max())
    if overflow > 0:  # cannot happen: caps are exact (pre-pass)
        raise RuntimeError(
            f'distributed build overflow ({overflow}) despite exact '
            'capacity pre-pass -- count/build emission rules diverged')

    m = np.asarray(m)
    n_nodes = np.asarray(n_nodes)
    n_edges = np.asarray(n_edges)
    s_pos = np.asarray(s_pos)
    s_rec = np.asarray(s_rec)

    total_kmers = int(m.sum())
    kmers = np.zeros(total_kmers, dtype=KMER_DTYPE)
    nodes = np.zeros(int(n_nodes.sum()), dtype=NODE_DTYPE)
    edges = np.zeros(int(n_edges.sum()), dtype=EDGE_DTYPE)
    node_hash = np.asarray(node_hash)
    n_start = np.asarray(n_start)
    n_stop = np.asarray(n_stop)
    n_tar_h = np.asarray(n_tar)
    n_neg_h = np.asarray(n_neg)
    e_first = np.asarray(e_first)
    e_second = np.asarray(e_second)
    e_weight = np.asarray(e_weight)

    ko = no = eo = 0
    for d in range(mesh.devices.size):
        md, nd, ed = int(m[d]), int(n_nodes[d]), int(n_edges[d])
        kmers['pos'][ko:ko + md] = s_pos[d, :md]
        kmers['record_idx'][ko:ko + md] = s_rec[d, :md].astype(np.uint32)
        nodes['hash'][no:no + nd] = node_hash[d, :nd]
        nodes['start'][no:no + nd] = n_start[d, :nd].astype(np.int64) + ko
        nodes['stop'][no:no + nd] = n_stop[d, :nd].astype(np.int64) + ko
        nodes['n_tar'][no:no + nd] = n_tar_h[d, :nd]
        nodes['n_neg'][no:no + nd] = n_neg_h[d, :nd]
        edges['first'][eo:eo + ed] = e_first[d, :ed]
        edges['second'][eo:eo + ed] = e_second[d, :ed]
        edges['weight'][eo:eo + ed] = e_weight[d, :ed]
        ko += md
        no += nd
        eo += ed
    return kmers, nodes, edges


def merge_graph_parts(parts):
    """Host merge of per-batch (kmers, nodes, edges) builds into the arrays
    ONE build over all records would produce, byte-exact.

    Valid whenever the batches partition WHOLE assemblies in global record
    order: the once-per-assembly node/edge counts of disjoint assembly sets
    add (`/root/reference/cpp/src/seqwin/graph.cpp:128-159` counts each
    (hash, assembly) pair once), adjacency pairs never span records (so
    never span batches), and per-node k-mer segments concatenate in batch
    order = global scan order. Backbone of the distributed `low_memory`
    mode (`build_distributed(low_memory=True)`).
    """
    from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE

    if len(parts) == 1:
        return parts[0]
    kmers_p = [p[0] for p in parts]
    nodes_p = [p[1] for p in parts]
    edges_p = [p[2] for p in parts]

    # --- nodes: union by hash (each part is hash-sorted and duplicate-free;
    # within one part fancy-index += is safe), counts add across batches ---
    uh = np.unique(np.concatenate([n['hash'] for n in nodes_p]))
    G = len(uh)
    n_tar = np.zeros(G, np.uint32)
    n_neg = np.zeros(G, np.uint32)
    total_sizes = np.zeros(G, np.int64)
    idx_p = []
    for npart in nodes_p:
        idx = np.searchsorted(uh, npart['hash'])
        idx_p.append(idx)
        n_tar[idx] += npart['n_tar']
        n_neg[idx] += npart['n_neg']
        total_sizes[idx] += (npart['stop'] - npart['start']).astype(np.int64)
    g_stop = np.cumsum(total_sizes)
    g_start = g_stop - total_sizes
    nodes = np.zeros(G, dtype=NODE_DTYPE)
    nodes['hash'] = uh
    nodes['start'] = g_start
    nodes['stop'] = g_stop
    nodes['n_tar'] = n_tar
    nodes['n_neg'] = n_neg

    # --- kmers: each part's array is exactly its segments tiled in node
    # order; scatter every segment to its node's slot, after the lengths
    # earlier batches already placed there (batch order = scan order) ---
    kmers = np.empty(int(g_stop[-1]) if G else 0, dtype=KMER_DTYPE)
    filled = np.zeros(G, np.int64)
    for kp, npart, idx in zip(kmers_p, nodes_p, idx_p):
        if not len(kp):
            continue
        sizes = (npart['stop'] - npart['start']).astype(np.int64)
        csz = np.cumsum(sizes)
        out_start = g_start[idx] + filled[idx]
        dst = np.repeat(out_start - (csz - sizes), sizes) + np.arange(len(kp))
        kmers[dst] = kp
        filled[idx] += sizes

    # --- edges: union by (first, second), weights (distinct-assembly
    # counts of disjoint assembly sets) add; output stays (first, second)
    # ascending like every build path ---
    alle = np.concatenate(edges_p)
    order = np.lexsort((alle['second'], alle['first']))
    se = alle[order]
    if len(se):
        new = np.ones(len(se), dtype=bool)
        new[1:] = (se['first'][1:] != se['first'][:-1]) | (
            se['second'][1:] != se['second'][:-1])
        starts = np.flatnonzero(new)
        edges = se[starts].copy()
        wsum = np.cumsum(se['weight'].astype(np.int64))
        stops = np.append(starts[1:], len(se))
        prev = np.where(starts > 0, wsum[starts - 1], 0)
        edges['weight'] = wsum[stops - 1] - prev
    else:
        edges = np.zeros(0, dtype=EDGE_DTYPE)
    return kmers, nodes, edges


def build_distributed(
    assembly_paths,
    kmerlen: int,
    windowsize: int,
    is_targets,
    mesh: Mesh | None = None,
    n_cpu: int = 1,
    keep_codes: bool = False,
    low_memory: bool = False,
):
    """Full distributed graph build. Same output contract (and bytes) as the
    single-chip `graph.build`.

    With ``keep_codes`` the per-assembly parsed code lists ride along as a
    sixth return value, so callers (the device-sketch estimator) never
    re-parse a FASTA the build already parsed.

    ``low_memory`` bounds the staged stream: assemblies are processed in
    consecutive whole-assembly batches of at most
    ``n_devices * LOW_MEMORY_CHUNK_BASES`` bases (the distributed analog of
    the single-chip low-memory chunk budget; the reference composes its
    low-memory mode with thread parallelism the same way,
    `/root/reference/cpp/src/seqwin/graph.cpp:213-272`), and the per-batch
    results merge on host byte-exactly (`merge_graph_parts`).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..graph.build import LOW_MEMORY_CHUNK_BASES, U32_MAX
    from ..io.fasta import parse_fasta_codes

    paths = [str(p) for p in assembly_paths]
    targets = [bool(t) for t in is_targets]
    if mesh is None:
        mesh = make_mesh()
    budget = mesh.devices.size * LOW_MEMORY_CHUNK_BASES if low_memory else None

    record_ids: list[tuple[str, ...]] = []
    per_asm_codes: list[list[np.ndarray]] | None = [] if keep_codes else None
    record_offsets = [0]
    parts = []
    batch_codes: list[np.ndarray] = []
    batch_bases = 0
    rec_base = 0

    def flush_batch():
        nonlocal batch_codes, batch_bases, rec_base
        if not batch_codes:
            return
        # record_offsets so far covers every record in the batch, which is
        # all the assembly resolution (searchsorted prefix) needs
        parts.append(build_distributed_arrays(
            batch_codes, np.array(record_offsets, dtype=np.uintp), targets,
            kmerlen, windowsize, mesh, rec_base0=rec_base,
        ))
        rec_base += len(batch_codes)
        batch_codes = []
        batch_bases = 0

    n_workers = max(1, min(int(n_cpu), len(paths) or 1))
    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        for ids, codes_list in ex.map(parse_fasta_codes, paths):
            record_ids.append(tuple(ids))
            record_offsets.append(record_offsets[-1] + len(ids))
            batch_codes.extend(codes_list)
            batch_bases += sum(len(c) for c in codes_list)
            if per_asm_codes is not None:
                per_asm_codes.append(codes_list)
            if budget is not None and batch_bases >= budget:
                flush_batch()
    if record_offsets[-1] > U32_MAX:
        raise ValueError('Total number of FASTA records exceeds uint32 range')
    flush_batch()
    offsets = np.array(record_offsets, dtype=np.uintp)

    if parts:
        kmers, nodes, edges = merge_graph_parts(parts)
    else:
        from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE

        kmers = np.zeros(0, dtype=KMER_DTYPE)
        nodes = np.zeros(0, dtype=NODE_DTYPE)
        edges = np.zeros(0, dtype=EDGE_DTYPE)
    if keep_codes:
        return kmers, nodes, edges, offsets, record_ids, per_asm_codes
    return kmers, nodes, edges, offsets, record_ids


# ---------------------------------------------------------------------------
# Cross-chip sequence sharding (one record spread over the mesh)
# ---------------------------------------------------------------------------

def _seq_shard_step(codes_aug, patch_pos, patch_z, block_off, spec: ShardSpec,
                    n_dev: int):
    """Per-device body: scan one halo'd block of a single record, then drop
    halo re-emissions using the carry (last emitted position) of all earlier
    blocks -- a single all_gather of two scalars per device."""
    codes_aug = codes_aug.reshape(-1)
    patch_pos = patch_pos.reshape(-1)
    patch_z = patch_z.reshape(-1)
    block_off = block_off.reshape(())

    starts = jnp.full((64,), spec.n_bases, dtype=jnp.int32).at[0].set(spec.offset)
    asm_tab = jnp.zeros((64,), dtype=i32)  # single pseudo-assembly
    if spec.extract == 'pfx':
        zpfx, lrank, ts = pfx_phase1(
            codes_aug, spec.k, spec.w, spec.n_bases, spec.offset,
            spec.use_pallas)
        e_oh, e_pos, e_rec, count, _ = scan_phase2_pfx(
            zpfx, lrank, codes_aug, patch_pos, patch_z, starts, i32(0),
            asm_tab, spec.emit_cap, spec.k, spec.offset, ts,
        )
    else:
        z_clean, _, _ = _shard_phase1(codes_aug, spec)
        e_oh, e_pos, e_rec, count, _ = scan_phase2(
            z_clean, codes_aug, patch_pos, patch_z, starts, i32(0), asm_tab,
            spec.emit_cap, spec.k, extract=spec.extract,
        )
    idx = jnp.arange(spec.emit_cap, dtype=i32)
    live = idx < count
    gpos = jnp.where(live, e_pos.astype(i64) + block_off, i64(-1))

    # local carry: my last emitted (position, hash); -1 when I emitted nothing
    last_i = jnp.maximum(count - 1, 0)
    my_last_pos = jnp.where(count > 0, gpos[last_i], i64(-1))
    my_last_oh = jnp.where(count > 0, e_oh[last_i], _U64(0))
    allp = jax.lax.all_gather(my_last_pos, 'd')           # [D]
    alloh = jax.lax.all_gather(my_last_oh, 'd')           # [D]
    me = jax.lax.axis_index('d')
    before = jnp.arange(n_dev, dtype=i32) < me
    prevp = jnp.where(before, allp, i64(-1))
    carry = jnp.max(prevp)                                 # -1 if none
    carry_src = jnp.argmax(jnp.where(before, allp, i64(-2)))
    carry_oh = alloh[carry_src]

    keep = live & (gpos > carry)
    n_keep = jnp.sum(keep.astype(i32))
    n_drop = count - n_keep
    oh2 = jnp.roll(e_oh, -n_drop)
    pos2 = jnp.roll(gpos, -n_drop)
    oh2 = jnp.where(idx < n_keep, oh2, _U64(0))
    pos2 = jnp.where(idx < n_keep, pos2, i64(-1))
    # junction pair: previous block's last kept hash -- mine starts where the
    # carry ends, so the bridge is (carry_oh, my first kept hash)
    has_bridge = (n_keep > 0) & (carry >= 0)
    first_oh = oh2[0]
    return (
        oh2[None], pos2[None], n_keep[None],
        has_bridge[None], carry_oh[None], first_oh[None],
        (count - spec.emit_cap)[None],
    )


@functools.partial(jax.jit, static_argnames=('spec', 'n_dev', 'mesh'))
def _seq_sharded_jit(codes_aug, patch_pos, patch_z, block_off, spec, n_dev, mesh):
    body = functools.partial(_seq_shard_step, spec=spec, n_dev=n_dev)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P('d'), P('d'), P('d'), P('d')),
        out_specs=tuple(P('d') for _ in range(7)),
    )(codes_aug, patch_pos, patch_z, block_off)


def scan_record_sharded(
    codes: np.ndarray,
    k: int,
    w: int,
    mesh: Mesh,
    rec_idx: int = 0,
    use_pallas: bool | None = None,
    record_offsets=None,
):
    """Scan ONE record split across the mesh with halo'd blocks.

    Sequence parallelism for records larger than one chip's budget
    (SURVEY.md §2.3 / §5): block boundaries re-scan w-1 preceding valid
    k-mers; the cross-block emission state is one scalar per block, so the
    whole dependency chain is ONE all_gather of (pos, hash) pairs.

    ``record_offsets`` (cumulative record counts per assembly, as in
    `engine/hybrid.scan_record_blocks`) resolves the record's true assembly
    for the junction bridge pairs; without it bridges are attributed to
    assembly 0, which is only correct for single-assembly inputs.

    Returns ((oh, pos, rec) trimmed scan-order arrays, bridge_pairs) --
    identical to the single-chip scan of the whole record.
    """
    from ..engine.hybrid import _record_block_plan

    if record_offsets is not None:
        off_h = np.asarray(record_offsets, dtype=np.int64)
        asm_idx = int(np.searchsorted(off_h, rec_idx, side='right') - 1)
    else:
        asm_idx = 0

    if use_pallas is None:
        use_pallas = use_pallas_phase1()
    n_dev = mesh.devices.size
    codes = np.asarray(codes)
    budget = max(1 << 12, -(-len(codes) // n_dev))
    plan = _record_block_plan(codes, k, w, budget)
    while plan is not None and len(plan) > n_dev:
        budget = int(budget * 1.3)
        plan = _record_block_plan(codes, k, w, budget)
    if plan is None:
        plan = [(0, len(codes))]

    max_len = max(b1 - b0 for b0, b1 in plan)
    if use_pallas:
        from ..engine.pallas_scan import phase1_shapes

        _, n, offset = phase1_shapes(max(max_len, 1 << 14), k, w)
    else:
        n = max(1 << 14, next_pow2(max_len))
        offset = 0

    codes_aug = np.full((n_dev, n), 255, dtype=np.uint8)
    block_off = np.full(n_dev, np.int64(-1) << 40, dtype=np.int64)
    patch_list = []
    for d, (b0, b1) in enumerate(plan):
        blk = codes[b0:b1]
        codes_aug[d, offset:offset + len(blk)] = blk
        codes_aug[d, offset] |= 64
        block_off[d] = b0  # phase-2 positions are block-local (eidx - offset)
        patch_list.append(host_patches(
            np.array([offset], dtype=np.int64), k, w, n,
            total=offset + len(blk), codes=codes_aug[d],
        ))
    for d in range(len(plan), n_dev):
        patch_list.append((np.zeros(0, np.int32), np.zeros(0, np.int32)))

    pcap = max(256, next_pow2(max((len(p[0]) for p in patch_list), default=1) or 1))
    patch_pos = np.full((n_dev, pcap), n, dtype=np.int32)
    patch_z = np.full((n_dev, pcap), -1, dtype=np.int32)
    for d, (pp, pz) in enumerate(patch_list):
        patch_pos[d, :len(pp)] = pp
        patch_z[d, :len(pp)] = pz

    emit_cap = min(max(1 << 12, next_pow2(int(2.5 * n / (w + 1)) + 64)), n)
    while True:
        spec = ShardSpec(
            k=k, w=w, n_bases=n, offset=offset, emit_cap=emit_cap,
            bucket_cap=1, use_pallas=use_pallas, extract=extract_mode(),
        )
        oh, pos, n_keep, has_bridge, carry_oh, first_oh, overflow = _seq_sharded_jit(
            jnp.asarray(codes_aug), jnp.asarray(patch_pos), jnp.asarray(patch_z),
            jnp.asarray(block_off), spec, n_dev, mesh,
        )
        overflow = np.asarray(overflow)
        if int(overflow.max()) <= 0:
            break
        emit_cap = next_pow2(emit_cap + int(overflow.max()))

    oh = np.asarray(oh)
    pos = np.asarray(pos)
    n_keep = np.asarray(n_keep)
    has_bridge = np.asarray(has_bridge)
    carry_oh = np.asarray(carry_oh)
    first_oh = np.asarray(first_oh)

    out_oh = np.concatenate([oh[d, :n_keep[d]] for d in range(n_dev)])
    out_pos = np.concatenate([pos[d, :n_keep[d]] for d in range(n_dev)]).astype(np.uint32)
    out_rec = np.full(len(out_oh), rec_idx, dtype=np.int32)
    bridges = [
        (int(min(carry_oh[d], first_oh[d])),
         int(max(carry_oh[d], first_oh[d])), asm_idx)
        for d in range(n_dev) if has_bridge[d]
    ]
    return (out_oh, out_pos, out_rec), bridges
