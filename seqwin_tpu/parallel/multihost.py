"""Multi-host scale-out: per-process parsing, global mesh, DCN bucket merge.

The reference is single-node (`SURVEY.md` §2.3); this module extends the
single-slice distributed build (`parallel/distributed.py`) across hosts:

- every process calls `initialize()` (jax.distributed) and participates in
  one global 1-D mesh over ALL devices;
- assemblies are partitioned contiguously across processes by file size
  (the analog of `graph.cpp:305-306`'s thread partition), and each process
  parses ONLY its own files;
- per-assembly record counts are exchanged once (process_allgather) so every
  process knows the global record index space (`rec_base` bookkeeping);
- the shard_map build program is unchanged: the hash-bucketed all_to_all
  crosses DCN exactly for buckets owned by other hosts' devices, and each
  bucket owner reduces its own nodes/edges/kmers;
- merged per-device results are gathered back with process_allgather and
  concatenated in device order (device order == hash order).

Single-process execution reduces exactly to `build_distributed`; the
bookkeeping (partition, rec_base, layout invariance across process counts)
is unit-tested on the virtual mesh since this environment has one process.
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_indices(sizes: list[int], n_parts: int, part: int) -> list[int]:
    """Contiguous, load-balanced index partition (same rule as the device
    partition `distributed.partition_records`, so process and device splits
    compose into one global contiguous record order)."""
    total = sum(sizes)
    budget = total / n_parts if n_parts else 0
    out = []
    acc = 0
    p = 0
    for i, s in enumerate(sizes):
        if acc > budget * (p + 1) and p < n_parts - 1:
            p += 1
        if p == part:
            out.append(i)
        acc += s
    return out


def partition_paths(paths: list, sizes: list[int], n_processes: int, process_id: int) -> list:
    """Contiguous, load-balanced partition of assembly files across processes."""
    return [paths[i] for i in partition_indices(sizes, n_processes, process_id)]


def _allgather_ragged_i64(vec: np.ndarray) -> list[np.ndarray]:
    """All-gather variable-length int64 vectors across processes: each row
    of the padded exchange carries its length in slot 0, so every process
    recovers every other's exact vector, in process order."""
    from jax.experimental import multihost_utils

    vec = np.asarray(vec, dtype=np.int64)
    cap = int(multihost_utils.process_allgather(
        np.asarray([len(vec)], dtype=np.int64)).max())
    padded = np.full(cap + 1, -1, dtype=np.int64)
    padded[0] = len(vec)
    padded[1:1 + len(vec)] = vec
    gathered = np.asarray(multihost_utils.process_allgather(padded))  # [P, cap+1]
    return [row[1:1 + int(row[0])] for row in gathered]


def exchange_record_counts(local_counts: np.ndarray, n_processes: int) -> np.ndarray:
    """All-gather each process's per-assembly record counts -> the GLOBAL
    per-assembly record count vector, concatenated in process order.

    Contiguous process partitions mean concatenation restores the global
    assembly order; `rec_base` for a process is the sum of all earlier
    processes' record counts.
    """
    if n_processes <= 1:
        return np.asarray(local_counts, dtype=np.int64)
    parts = _allgather_ragged_i64(local_counts)
    return np.concatenate(parts) if parts else np.zeros(0, np.int64)


def exchange_record_ids(
    my_ids: list[tuple[str, ...]], n_processes: int
) -> list[tuple[str, ...]]:
    """All-gather every process's per-assembly record-id tuples -> the GLOBAL
    list in assembly order (contiguous process partitions concatenate)."""
    if n_processes <= 1:
        return list(my_ids)
    import json

    payload = np.frombuffer(
        json.dumps([list(t) for t in my_ids]).encode(), dtype=np.uint8)
    out: list[tuple[str, ...]] = []
    for part in _allgather_ragged_i64(payload.astype(np.int64)):
        decoded = json.loads(part.astype(np.uint8).tobytes().decode())
        out.extend(tuple(x) for x in decoded)
    return out


def _size_batches(paths: list[str], sizes: list[int], budget: int):
    """Consecutive whole-assembly batches with estimated bases <= budget
    (soft bound: the estimate is the stat size, with gzip scaled 3x).
    Deterministic from the global path list, so every process computes the
    SAME batches without communicating -- the low-memory composition's
    collective calls then line up across processes."""
    est = [s * 3 if p.endswith('.gz') else s for p, s in zip(paths, sizes)]
    batches: list[tuple[int, int]] = []
    lo, acc = 0, 0
    for i, e in enumerate(est):
        acc += int(e)
        if acc >= budget:
            batches.append((lo, i + 1))
            lo, acc = i + 1, 0
    if lo < len(paths):
        batches.append((lo, len(paths)))
    return batches


def build_multihost(
    assembly_paths,
    kmerlen: int,
    windowsize: int,
    is_targets,
    n_cpu: int = 1,
    low_memory: bool = False,
):
    """Multi-host distributed graph build: same output contract (and bytes)
    as `graph.build`, with genomes data-parallel across processes AND chips.

    Requires `initialize()` (or a single process, where this reduces to
    `build_distributed` over all local devices).

    ``low_memory`` processes assemblies in consecutive whole-assembly
    batches of ~``n_devices * LOW_MEMORY_CHUNK_BASES`` estimated bases.
    Batches are derived from the global stat sizes (identical on every
    process, no sync needed); each batch is partitioned across processes,
    built, and the parts merge on host byte-exactly
    (`distributed.merge_graph_parts`).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..io.fasta import parse_fasta_codes
    from .distributed import build_distributed_arrays, make_mesh, merge_graph_parts

    paths = [str(p) for p in assembly_paths]
    targets = np.asarray([bool(t) for t in is_targets])
    nproc = jax.process_count()
    pid = jax.process_index()
    mesh = make_mesh(devices=jax.devices())  # ALL devices, process-spanning

    sizes = [Path(p).stat().st_size for p in paths]
    if low_memory:
        from ..graph.build import LOW_MEMORY_CHUNK_BASES

        batches = _size_batches(
            paths, sizes, mesh.devices.size * LOW_MEMORY_CHUNK_BASES)
    else:
        batches = [(0, len(paths))] if paths else []

    parts = []
    all_ids: list[tuple[str, ...]] = []
    offsets_list: list[int] = [0]
    for lo, hi in batches:
        bpaths = paths[lo:hi]
        mine = partition_indices(sizes[lo:hi], nproc, pid)
        logger.info(
            f'process {pid}/{nproc}: parsing {len(mine)}/{len(bpaths)} '
            f'assemblies (batch {lo}:{hi})')
        my_counts = np.zeros(len(mine), dtype=np.int64)
        my_codes: list[np.ndarray] = []
        my_ids: list[tuple[str, ...]] = []
        workers = max(1, min(int(n_cpu), len(mine) or 1))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            for j, (ids, codes_list) in enumerate(
                    ex.map(parse_fasta_codes, (bpaths[i] for i in mine))):
                my_counts[j] = len(ids)
                my_ids.append(tuple(ids))
                my_codes.extend(codes_list)

        batch_counts = exchange_record_counts(my_counts, nproc)
        # global record index of this process's first record in this batch
        first_asm = mine[0] if mine else len(batch_counts)
        base = offsets_list[-1]
        rec_base0 = base + int(np.sum(batch_counts[:first_asm]))
        offsets_list.extend(
            (base + np.cumsum(batch_counts)).astype(np.int64).tolist())
        record_offsets = np.asarray(offsets_list, dtype=np.uintp)

        parts.append(build_distributed_arrays(
            my_codes, record_offsets, targets, kmerlen, windowsize, mesh,
            rec_base0=rec_base0,
        ))
        all_ids.extend(exchange_record_ids(my_ids, nproc))

    if parts:
        kmers, nodes, edges = merge_graph_parts(parts)
    else:
        from ..graph.dtypes import EDGE_DTYPE, KMER_DTYPE, NODE_DTYPE

        kmers = np.zeros(0, dtype=KMER_DTYPE)
        nodes = np.zeros(0, dtype=NODE_DTYPE)
        edges = np.zeros(0, dtype=EDGE_DTYPE)
    record_offsets = np.asarray(offsets_list, dtype=np.uintp)
    if nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices('seqwin-tpu multihost build')
    return kmers, nodes, edges, record_offsets, all_ids
