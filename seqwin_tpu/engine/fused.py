"""One-program graph build: every chunk's scan plus the global merge in a
single jitted device program.

Motivation (measured): the TPU relay in this environment imposes per-program
and per-transfer overheads whose magnitude varies with relay state (8 ms+
latency per transfer; run-to-run build variance of +-30% with identical
code). The per-chunk pipeline (`graph/build.py` + `engine/hybrid.py`) pays
those costs ~4x per chunk plus ~4x for aggregation. This module stacks all
chunk inputs into [C, ...] arrays and runs

    lax.map(chunk scan) -> compaction -> node merge -> edge merge

as ONE program, so steady-state build time approaches pure device time no
matter the relay state. Two host round-trips remain: one tiny meta fetch
(counts, for the overflow/capacity checks) and one packed output transfer.

Exactness: the chunk body is the same unpack -> phase-1 -> phase-2 chain as
`hybrid.scan_chunk_device`, and the merge is `aggregate._merge_nodes` /
`_merge_edges` traced inline; outputs are byte-identical to the unfused path
(differentially tested). Chunks whose emission overflows the shared cap fall
back to the unfused path (rare; sized at ~2x the w-expected density).

Reference contract: `/root/reference/cpp/src/seqwin/graph.cpp:276-339` +
`/root/reference/cpp/src/seqwin/helpers.cpp:323-424` (build + merge).
"""
from __future__ import annotations

import functools
import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .aggregate import _merge_edges, _merge_nodes, _pack_outputs, _split_outputs
from .hybrid import (
    _asm_table,
    _host_layout,
    _unpack_aug,
    extract_mode,
    host_patches,
    pfx_phase1,
    scan_phase1,
    scan_phase2,
    scan_phase2_pfx,
    use_pallas_phase1,
)
from .minimizer import next_pow2

logger = logging.getLogger(__name__)

i32 = jnp.int32
_U64 = jnp.uint64


@dataclass(frozen=True)
class FusedSpec:
    """Static geometry of one fused build program."""

    k: int
    w: int
    n: int            # padded stream length per chunk
    offset: int       # stream start offset (pallas halo rows)
    rtotal: int       # pallas row count (0 when not packed/pallas)
    emit_cap: int     # per-chunk emission capacity
    out_cap: int      # compacted stream length (C * emit_cap)
    node_cap: int
    edge_cap: int
    use_pallas: bool
    packed: bool      # inputs are 2-bit packed + sparse exceptions
    # extraction variant, static on the spec (not read at trace time: a
    # cached program would silently keep the mode it was traced with)
    extract: str = 'topk'


@dataclass
class ChunkPrep:
    """Host-side arrays for one chunk (pre-padding to the fleet caps)."""

    payload: np.ndarray       # packed u8[n//4] or plain codes u8[n]
    starts_u: np.ndarray      # record-start offsets for unpack (packed only)
    inv: np.ndarray           # invalid-base positions (packed only)
    stream_end: int
    starts: np.ndarray        # per-record start offsets (unpadded)
    patch_pos: np.ndarray
    patch_z: np.ndarray
    rec_base: int
    n_records: int


def _phase1_in_body(codes_aug, spec: FusedSpec):
    if spec.use_pallas:
        from .pallas_scan import L as _LANES, pallas_phase1

        interpret = jax.default_backend() not in ('tpu', 'axon')
        z_clean, _, _ = pallas_phase1(
            codes_aug.reshape(spec.rtotal, _LANES), spec.k, spec.w,
            interpret=interpret, with_hashes=False,
        )
        tail = spec.n - z_clean.shape[0]
        if tail:
            z_clean = jnp.concatenate([z_clean, jnp.full((tail,), i32(-1))])
        return z_clean
    z_clean, _, _ = scan_phase1(codes_aug, spec.k, spec.w, with_hashes=False)
    return z_clean


@functools.partial(jax.jit, static_argnames=('spec',))
def _fused_build(payload, starts_u, inv, stream_end, starts, patch_pos,
                 patch_z, rec_base, asm_tab, tmask, spec: FusedSpec):
    """[C, ...]-stacked chunk inputs -> merged (kmers, nodes, edges) columns
    (device-resident, untrimmed) + meta counts."""
    def chunk_body(args):
        (payload_c, starts_u_c, inv_c, se_c, starts_c, pp_c, pz_c, rb_c,
         at_c) = args
        if spec.packed:
            codes_aug = _unpack_aug(
                payload_c, starts_u_c, inv_c, se_c, spec.n, spec.offset)
        else:
            codes_aug = payload_c
        # the packed payload doubles as phase 2's canon-hash gather source
        # (5x over byte gathers; benchmarks/r4/profile_phase2b.log)
        packed_c = payload_c if spec.packed and spec.n % 16 == 0 else None
        if spec.extract == 'pfx':
            zpfx, lrank, ts = pfx_phase1(
                codes_aug, spec.k, spec.w, spec.n, spec.offset,
                spec.use_pallas)
            return scan_phase2_pfx(
                zpfx, lrank, codes_aug, pp_c, pz_c, starts_c, rb_c, at_c,
                spec.emit_cap, spec.k, spec.offset, ts,
                packed_u8=packed_c,
            )
        z_clean = _phase1_in_body(codes_aug, spec)
        return scan_phase2(
            z_clean, codes_aug, pp_c, pz_c, starts_c, rb_c, at_c,
            spec.emit_cap, spec.k, extract=spec.extract,
            packed_u8=packed_c,
        )

    e_oh, e_pos, e_rec, counts, e_asm = jax.lax.map(
        chunk_body,
        (payload, starts_u, inv, stream_end, starts, patch_pos, patch_z,
         rec_base, asm_tab),
    )

    # compaction: each chunk's emit-cap block lands at its cumulative-count
    # offset; chunk i+1 overwrites chunk i's padding, so reals are contiguous
    # (same scheme as `aggregate._compact_chunks`, with traced offsets)
    C = e_oh.shape[0]
    offs = jnp.concatenate([jnp.zeros(1, i32), jnp.cumsum(counts[:-1])])
    oh = jnp.zeros(spec.out_cap, dtype=jnp.uint64)
    pos = jnp.zeros(spec.out_cap, dtype=jnp.uint32)
    rec = jnp.full(spec.out_cap, -1, dtype=i32)
    asm = jnp.zeros(spec.out_cap, dtype=i32)
    for c in range(C):
        o = (offs[c],)
        oh = jax.lax.dynamic_update_slice(oh, e_oh[c], o)
        pos = jax.lax.dynamic_update_slice(pos, e_pos[c], o)
        rec = jax.lax.dynamic_update_slice(rec, e_rec[c], o)
        asm = jax.lax.dynamic_update_slice(asm, e_asm[c], o)
    m = jnp.sum(counts).astype(i32)

    (s_pos, s_rec, node_hash, n_starts, n_stops, n_tar, n_neg,
     n_nodes) = _merge_nodes(oh, pos, rec, asm, tmask, m, spec.node_cap)
    xz = jnp.zeros(0, dtype=jnp.uint64)
    e_first, e_second, e_weight, n_edges = _merge_edges(
        oh, rec, asm, spec.edge_cap, xz, xz, jnp.zeros(0, i32), i32(0))

    meta = jnp.concatenate([
        counts.astype(jnp.int64),
        jnp.stack([m.astype(jnp.int64), n_nodes.astype(jnp.int64),
                   n_edges.astype(jnp.int64)]),
    ])
    return (s_pos, s_rec, node_hash, n_starts, n_stops, n_tar, n_neg,
            e_first, e_second, e_weight, meta)


def prep_chunk(record_codes, k: int, w: int, rec_base: int, n: int,
               offset: int, packed: bool) -> ChunkPrep:
    """Host prep of one chunk (mirrors `hybrid.scan_chunk_device`'s host
    side; no device calls, so chunks prep in parallel threads)."""
    total = int(sum(len(c) for c in record_codes))
    stream_end = offset + total
    if packed:
        from ..io import native

        payload, starts, inv_rec = native.layout_chunk_packed(
            record_codes, n, offset)
        inv_points = np.concatenate(
            [np.arange(offset, dtype=np.int64), inv_rec])
        irr_pos, patch_z = host_patches(
            starts, k, w, n, total=stream_end, inv_points=inv_points,
            packed=payload)
        starts_u = np.unique(starts)
        inv = inv_rec.astype(np.int32)
    else:
        payload, starts = _host_layout(record_codes, n, offset=offset)
        payload[starts] |= 64
        irr_pos, patch_z = host_patches(
            starts, k, w, n, total=stream_end, codes=payload)
        starts_u = np.zeros(0, np.int64)
        inv = np.zeros(0, np.int32)
    return ChunkPrep(
        payload=payload, starts_u=starts_u.astype(np.int32), inv=inv,
        stream_end=stream_end, starts=np.asarray(starts, np.int64),
        patch_pos=np.asarray(irr_pos, np.int32),
        patch_z=np.asarray(patch_z, np.int32),
        rec_base=rec_base, n_records=len(starts),
    )


def _stack_preps(preps: list[ChunkPrep], n: int, record_offsets):
    """Pad every chunk's ragged host arrays to shared caps and stack."""
    scap = max(64, next_pow2(max(p.n_records for p in preps)))
    sucap = max(64, next_pow2(max(len(p.starts_u) for p in preps) or 1))
    icap = max(256, next_pow2(max(len(p.inv) for p in preps) or 1))
    pcap = max(256, next_pow2(max(len(p.patch_pos) for p in preps) or 1))
    C = len(preps)

    payload = np.stack([p.payload for p in preps])
    starts_u = np.full((C, sucap), n, np.int32)
    inv = np.full((C, icap), n, np.int32)
    starts = np.full((C, scap), n, np.int32)
    patch_pos = np.full((C, pcap), n, np.int32)
    patch_z = np.full((C, pcap), -1, np.int32)
    rec_base = np.zeros(C, np.int32)
    asm_tab = np.zeros((C, scap), np.int32)
    stream_end = np.zeros(C, np.int32)
    for c, p in enumerate(preps):
        starts_u[c, :len(p.starts_u)] = p.starts_u
        inv[c, :len(p.inv)] = p.inv
        starts[c, :p.n_records] = p.starts.astype(np.int32)
        patch_pos[c, :len(p.patch_pos)] = p.patch_pos
        patch_z[c, :len(p.patch_z)] = p.patch_z
        rec_base[c] = p.rec_base
        stream_end[c] = p.stream_end
        asm_tab[c] = _asm_table(record_offsets, p.rec_base, p.n_records, scap)
    return (payload, starts_u, inv, stream_end, starts, patch_pos, patch_z,
            rec_base, asm_tab)


_TRIM_Q = 1 << 12  # output columns trim to 4k multiples for shape reuse


def build_fused(
    chunk_lists: list[tuple[list[np.ndarray], int]],
    kmerlen: int,
    windowsize: int,
    record_offsets: np.ndarray,
    is_target,
    min_chunk: int,
    n_cpu: int = 1,
):
    """Fused build driver: prep chunks (parallel host threads), stack, run
    the one-program build, fetch + split outputs.

    Args:
        chunk_lists: [(record_codes, rec_base), ...] in global scan order.

    Returns (kmers, nodes, edges) structured arrays, or None when the fused
    path cannot run this input (emission overflow -> caller falls back).
    """
    from time import time as _now

    use_pallas = use_pallas_phase1()
    if use_pallas:
        from .pallas_scan import phase1_shapes

        rtotal, n, offset = phase1_shapes(min_chunk, kmerlen, windowsize)
    else:
        rtotal, offset = 0, 0
        n = min_chunk
    from ..io import native

    packed = n % 4 == 0 and native.available()

    _t0 = _now()
    workers = max(1, min(int(n_cpu), len(chunk_lists)))
    prep = functools.partial(
        _prep_one, k=kmerlen, w=windowsize, n=n, offset=offset, packed=packed)
    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            preps = list(ex.map(prep, chunk_lists))
    else:
        preps = [prep(cl) for cl in chunk_lists]
    stacked = _stack_preps(preps, n, record_offsets)
    logger.debug(f'fused: host prep {_now() - _t0:.2f}s ({len(preps)} chunks)')

    tmask_h = np.asarray(is_target, dtype=bool)
    acap = max(8, next_pow2(len(tmask_h)))
    tmask = np.zeros(acap, dtype=bool)
    tmask[:len(tmask_h)] = tmask_h

    C = len(preps)
    # pow2 caps: a 4k-quantized (non-pow2) emit_cap was tried and made the
    # remote TPU compile of the fused program ~6x slower (876 s vs 156 s);
    # the sort-padding cost it saved is far smaller
    emit_cap = min(max(1 << 12, next_pow2(int(2.5 * n / (windowsize + 1)) + 64)), n)
    out_cap = C * emit_cap
    node_cap = min(max(1 << 12, out_cap // 4), out_cap)
    edge_cap = min(max(1 << 12, out_cap // 2), out_cap - 1)

    _t0 = _now()
    ins = tuple(jnp.asarray(a) for a in stacked) + (jnp.asarray(tmask),)
    while True:
        spec = FusedSpec(
            k=kmerlen, w=windowsize, n=n, offset=offset, rtotal=rtotal,
            emit_cap=emit_cap, out_cap=out_cap, node_cap=node_cap,
            edge_cap=edge_cap, use_pallas=use_pallas, packed=packed,
            extract=extract_mode(),
        )
        out = _fused_build(*ins, spec)
        meta = np.asarray(out[10])
        counts, m, n_nodes, n_edges = (
            meta[:C], int(meta[C]), int(meta[C + 1]), int(meta[C + 2]))
        if int(counts.max()) > emit_cap:
            logger.debug('fused: emission overflow -> unfused fallback')
            return None
        if n_nodes > node_cap:
            node_cap = min(next_pow2(n_nodes), out_cap)
            continue
        if n_edges > edge_cap:
            edge_cap = min(next_pow2(n_edges), out_cap - 1)
            continue
        break
    logger.debug(f'fused: device scan+merge {_now() - _t0:.2f}s')

    # trim to 4k multiples (bounded shape variety); interleave on device into
    # the final structured-dtype layouts; ship as ONE transfer; split with
    # plain views on host (no strided field writes)
    _t0 = _now()
    mq = min(-(-max(m, 1) // _TRIM_Q) * _TRIM_Q, out_cap)
    nq = min(-(-max(n_nodes, 1) // _TRIM_Q) * _TRIM_Q, node_cap)
    eq = min(-(-max(n_edges, 1) // _TRIM_Q) * _TRIM_Q, edge_cap)
    packed_dev = _pack_outputs(*out[:10], mq, nq, eq)
    logger.debug(f'fused: pack dispatch {_now() - _t0:.2f}s')
    _t0 = _now()
    buf = np.asarray(packed_dev)
    logger.debug(
        f'fused: d2h {buf.nbytes / 1e6:.1f} MB {_now() - _t0:.2f}s')
    _t0 = _now()
    kmers, nodes, edges = _split_outputs(buf, m, n_nodes, n_edges, mq, nq, eq)
    logger.debug(f'fused: host split {_now() - _t0:.2f}s')
    return kmers, nodes, edges


def _prep_one(chunk_list, k, w, n, offset, packed):
    record_codes, rec_base = chunk_list
    return prep_chunk(record_codes, k, w, rec_base, n, offset, packed)
