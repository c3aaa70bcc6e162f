"""Multi-chip minimizer graph construction: shard_map scan + collective merge.

TPU-native analog of the reference's thread sharding + merge
(`/root/reference/cpp/src/seqwin/graph.cpp:291-318` contiguous assembly
partition; `/root/reference/cpp/src/seqwin/helpers.cpp:323-424` concat +
stable radix sort + run-merge). The design:

1. **Genome data parallelism** -- records are partitioned into contiguous
   shards over a 1-D device mesh; every device runs the same scan kernel
   (`engine/minimizer.py`) on its own flat record stream.
2. **Hash-bucketed all_to_all** -- each emitted minimizer is routed to the
   device that owns its hash range (top log2(D) bits of out_hash), riding ICI.
   Blocks are concatenated in source order, so every bucket receives its
   entries in global scan order (shards are contiguous record ranges).
3. **Per-bucket merge** -- a stable local sort by hash on the bucket owner
   reproduces the reference's merged node layout; concatenating the buckets
   in device order yields the globally hash-sorted node array.

The same output-invariance contract as the reference's thread-count tests
(`/root/reference/tests/smoke/test_graph.py:59-121`) holds across device
counts; the unit suite checks 1-vs-8-device equality on a virtual CPU mesh.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.minimizer import ScanResult, next_pow2, scan_core

_U64 = jnp.uint64


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the data axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=('d',))


@dataclass(frozen=True)
class ShardedBuildSpec:
    """Static geometry of one distributed build step."""

    k: int
    w: int
    n_bases: int      # bases per shard (padded)
    emit_cap: int     # per-shard emission capacity
    bucket_cap: int   # per-(src, dst) all_to_all block size

    @property
    def merge_cap(self) -> int:
        # each bucket owner receives one block per source device
        return self.bucket_cap


def _route_to_buckets(res: ScanResult, rec_base, n_devices: int, bucket_cap: int):
    """Stage emitted entries into [D, bucket_cap] blocks keyed by hash range.

    Bucket id = top log2(D) bits of out_hash, so concatenated buckets are
    globally ordered by hash. Entries keep their within-shard order inside
    each block (stable scatter by running rank), preserving scan order.
    """
    real = res.rec >= 0
    # monotone range partition of the hash space into n_devices buckets:
    # bucket = floor(hi32(hash) * D / 2^32). Monotonicity keeps the
    # device-order concatenation globally hash-sorted.
    hi32 = (res.out_hash >> _U64(32)).astype(jnp.int64)
    bucket = jnp.where(
        real,
        ((hi32 * n_devices) >> 32).astype(jnp.int32),
        jnp.int32(n_devices),
    )
    # rank of each entry within its bucket, in scan order
    onehot = (bucket[:, None] == jnp.arange(n_devices, dtype=jnp.int32)[None, :])
    rank = jnp.cumsum(onehot, axis=0) - 1  # [emit_cap, D]
    my_rank = jnp.take_along_axis(
        rank, jnp.clip(bucket, 0, n_devices - 1)[:, None], axis=1
    )[:, 0]
    flat_tgt = jnp.where(
        real & (my_rank < bucket_cap),
        jnp.clip(bucket, 0, n_devices - 1).astype(jnp.int64) * bucket_cap + my_rank,
        jnp.int64(n_devices * bucket_cap),
    )
    rec_g = jnp.where(real, res.rec + rec_base, -1)
    stage_oh = jnp.zeros((n_devices * bucket_cap,), dtype=_U64).at[flat_tgt].set(res.out_hash, mode='drop')
    stage_pos = jnp.zeros((n_devices * bucket_cap,), dtype=jnp.uint32).at[flat_tgt].set(res.pos, mode='drop')
    stage_rec = jnp.full((n_devices * bucket_cap,), jnp.int32(-1)).at[flat_tgt].set(rec_g, mode='drop')
    # overflow detection: total per-bucket counts
    sent = jnp.sum(onehot & real[:, None], axis=0)  # [D]
    return (
        stage_oh.reshape(n_devices, bucket_cap),
        stage_pos.reshape(n_devices, bucket_cap),
        stage_rec.reshape(n_devices, bucket_cap),
        sent,
    )


def _shard_step(codes, is_start, rec_base, spec: ShardedBuildSpec, n_devices: int):
    """Per-device body: scan own records, route minimizers to bucket owners,
    merge the received bucket by hash. Runs under shard_map."""
    codes = codes.reshape(-1)
    is_start = is_start.reshape(-1)
    rec_base = rec_base.reshape(())
    res = scan_core(codes, is_start, spec.k, spec.w, spec.emit_cap)
    oh_blk, pos_blk, rec_blk, sent = _route_to_buckets(res, rec_base, n_devices, spec.bucket_cap)

    # all_to_all: device j receives [D, bucket_cap] = every source's block j
    oh_rx = jax.lax.all_to_all(oh_blk, 'd', split_axis=0, concat_axis=0, tiled=False)
    pos_rx = jax.lax.all_to_all(pos_blk, 'd', split_axis=0, concat_axis=0, tiled=False)
    rec_rx = jax.lax.all_to_all(rec_blk, 'd', split_axis=0, concat_axis=0, tiled=False)

    # flatten in source order (shards are contiguous record ranges -> global
    # scan order), then stable sort by hash
    oh_f = oh_rx.reshape(-1)
    pos_f = pos_rx.reshape(-1)
    rec_f = rec_rx.reshape(-1)
    pad = (rec_f < 0).astype(jnp.uint8)
    pad_s, oh_s, pos_s, rec_s = jax.lax.sort(
        (pad, oh_f, pos_f, rec_f), num_keys=2, is_stable=True
    )
    n_real = jnp.sum((rec_s >= 0).astype(jnp.int64))
    # overflow indicator: emissions beyond emit_cap or bucket_cap were dropped
    overflow = jnp.maximum(res.count - spec.emit_cap, jnp.max(sent) - spec.bucket_cap)
    # raw per-shard emissions (scan order, global record ids) for edge building
    raw_rec = jnp.where(res.rec >= 0, res.rec + rec_base, -1)
    return (
        oh_s[None], pos_s[None], rec_s[None],
        res.out_hash[None], res.pos[None], raw_rec[None],
        n_real[None], res.count[None], overflow[None],
    )


@functools.partial(
    jax.jit, static_argnames=('spec', 'n_devices', 'mesh'),
)
def _sharded_build_jit(codes, is_start, rec_base, spec, n_devices, mesh):
    body = functools.partial(_shard_step, spec=spec, n_devices=n_devices)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P('d'), P('d'), P('d')),
        out_specs=tuple(P('d') for _ in range(9)),
    )(codes, is_start, rec_base)


def sharded_scan(
    record_codes: list[np.ndarray],
    k: int,
    w: int,
    mesh: Mesh,
    emit_cap: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed scan+merge over a 1-D mesh.

    Returns (oh, pos, rec) with nodes merged per hash bucket: the
    concatenation over devices is sorted by hash with scan order within each
    hash group -- the same layout `engine.aggregate` produces on one chip.
    """
    n_dev = mesh.devices.size
    # contiguous partition of records over devices, balanced by bases
    # (mirror of graph.cpp:305-306 base+remainder split, but by load)
    total = sum(len(c) for c in record_codes)
    per_dev_records: list[list[np.ndarray]] = [[] for _ in range(n_dev)]
    per_dev_base: list[int] = []
    budget = total / n_dev if n_dev else 0
    di = 0
    acc = 0
    rec_base = np.zeros(n_dev, dtype=np.int32)
    rec_count = 0
    for c in record_codes:
        if acc > budget * (di + 1) and di < n_dev - 1:
            di += 1
        if not per_dev_records[di]:
            rec_base[di] = rec_count
        per_dev_records[di].append(c)
        acc += len(c)
        rec_count += 1
    # fix rec_base for empty shards
    cum = 0
    for d in range(n_dev):
        rec_base[d] = cum
        cum += len(per_dev_records[d])

    n_bases = max(1 << 14, next_pow2(max(1, max(
        (sum(len(c) for c in recs) for recs in per_dev_records), default=1
    ))))
    if emit_cap is None:
        emit_cap = max(1 << 12, next_pow2(4 * n_bases // (w + 1) + 64))
    bucket_cap = emit_cap

    codes = np.full((n_dev, n_bases), 255, dtype=np.uint8)
    is_start = np.zeros((n_dev, n_bases), dtype=bool)
    for d, recs in enumerate(per_dev_records):
        off = 0
        for c in recs:
            codes[d, off:off + len(c)] = c
            is_start[d, off] = True
            off += len(c)

    spec = ShardedBuildSpec(k=k, w=w, n_bases=n_bases, emit_cap=emit_cap, bucket_cap=bucket_cap)
    while True:
        (oh, pos, rec, raw_oh, raw_pos, raw_rec, n_real, counts, overflow) = _sharded_build_jit(
            jnp.asarray(codes), jnp.asarray(is_start), jnp.asarray(rec_base),
            spec, n_dev, mesh,
        )
        if int(np.max(np.asarray(overflow))) <= 0:
            break
        emit_cap = next_pow2(int(np.max(np.asarray(counts))) + 1)
        spec = ShardedBuildSpec(k=k, w=w, n_bases=n_bases, emit_cap=emit_cap, bucket_cap=emit_cap)

    oh = np.asarray(oh)
    pos = np.asarray(pos)
    rec = np.asarray(rec)
    n_real = np.asarray(n_real)
    counts = np.asarray(counts)
    raw_oh = np.asarray(raw_oh)
    raw_pos = np.asarray(raw_pos)
    raw_rec = np.asarray(raw_rec)
    merged = (
        np.concatenate([oh[d, :n_real[d]] for d in range(n_dev)]),
        np.concatenate([pos[d, :n_real[d]] for d in range(n_dev)]),
        np.concatenate([rec[d, :n_real[d]] for d in range(n_dev)]),
    )
    raw = (
        np.concatenate([raw_oh[d, :counts[d]] for d in range(n_dev)]),
        np.concatenate([raw_pos[d, :counts[d]] for d in range(n_dev)]),
        np.concatenate([raw_rec[d, :counts[d]] for d in range(n_dev)]),
    )
    return merged, raw


def build_distributed(
    assembly_paths,
    kmerlen: int,
    windowsize: int,
    is_targets,
    mesh: Mesh | None = None,
    n_cpu: int = 1,
):
    """Full distributed graph build: sharded scan + collective node merge,
    edges from the raw scan-ordered stream. Same output contract (and bytes)
    as the single-chip `graph.build`."""
    from ..engine.aggregate import aggregate
    from ..graph.build import U32_MAX
    from ..io.fasta import parse_fasta_codes

    paths = [str(p) for p in assembly_paths]
    targets = [bool(t) for t in is_targets]
    if mesh is None:
        mesh = make_mesh()

    record_ids: list[tuple[str, ...]] = []
    all_codes: list[np.ndarray] = []
    record_offsets = [0]
    for p in paths:
        ids, codes_list = parse_fasta_codes(p)
        record_ids.append(tuple(ids))
        all_codes.extend(codes_list)
        record_offsets.append(record_offsets[-1] + len(ids))
    if record_offsets[-1] > U32_MAX:
        raise ValueError('Total number of FASTA records exceeds uint32 range')
    offsets = np.array(record_offsets, dtype=np.uintp)

    _, (oh, pos, rec) = sharded_scan(all_codes, kmerlen, windowsize, mesh)
    asm = (np.searchsorted(offsets, rec, side='right') - 1).astype(np.int32)
    kmers, nodes, edges = aggregate(
        oh, pos, rec, asm, np.asarray(targets, dtype=bool), record_offsets=offsets
    )
    return kmers, nodes, edges, offsets, record_ids
