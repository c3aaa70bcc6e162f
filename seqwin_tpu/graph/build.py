"""End-to-end minimizer graph construction.

Pipeline (TPU-first re-design of `/root/reference/cpp/src/seqwin/graph.cpp:276-339`):

    host FASTA ingest -> base-code streams
      -> chunked device scan (ntHash + minimizer selection, `engine/minimizer.py`)
      -> device sort + host run-merge (`engine/aggregate.py`)
      -> numpy arrays in the reference output contract.

Where the reference shards assemblies over CPU threads and merges hash maps,
this build concatenates whole chunks of assemblies into flat device streams
(parallelism comes from the vector units, not threads) and merges with one
stable sort. Output is bit-identical to the reference for any chunking and
worker count: the stream is always assembled in global scan order.
"""
from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable

import numpy as np

from ..io.fasta import parse_fasta_codes
from .dtypes import KMER_DTYPE

logger = logging.getLogger(__name__)

U32_MAX = (1 << 32) - 1

# Max bases per device scan call; chunks are padded to a power of two, so this
# also bounds the number of distinct compiled shapes.
DEFAULT_CHUNK_BASES = 1 << 25
LOW_MEMORY_CHUNK_BASES = 1 << 22


def build(
    assembly_paths: Iterable[Path | str],
    kmerlen: int,
    windowsize: int,
    is_targets: Iterable[bool],
    n_cpu: int = 1,
    low_memory: bool = False,
    backend: str = 'auto',
    devices: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list[tuple[str, ...]]]:
    """Build a minimizer graph from assembly FASTA files.

    Same contract as the reference `seqwin.graph.build`
    (`/root/reference/src/seqwin/graph/__init__.py:61-147`):

    Returns:
        (kmers, nodes, edges, record_offsets, record_ids)
        - kmers: KMER_DTYPE[M], minimizer occurrences grouped by node, scan
          order within each group;
        - nodes: NODE_DTYPE[U] sorted by hash (penalty zeroed);
        - edges: EDGE_DTYPE[E] sorted by (first, second);
        - record_offsets: uintp[A+1] cumulative record counts per assembly;
        - record_ids: per assembly, tuple of FASTA record ids.
    """
    return _build_impl(
        assembly_paths, kmerlen, windowsize, is_targets, n_cpu=n_cpu,
        low_memory=low_memory, backend=backend, defer=False, devices=devices,
    )


def build_deferred(
    assembly_paths: Iterable[Path | str],
    kmerlen: int,
    windowsize: int,
    is_targets: Iterable[bool],
    n_cpu: int = 1,
    low_memory: bool = False,
    backend: str = 'auto',
    keep_codes: bool = False,
    devices: int = 1,
):
    """`build` variant returning (graph, record_offsets, record_ids) where
    ``graph`` keeps the k-mer stream and edges DEVICE-RESIDENT
    (`engine.aggregate.DeviceGraph`; `.nodes` is on host). The pipeline uses
    this to transfer only what `filter()` keeps -- the reference ships and
    then discards ~99% of the k-mers array (`helpers.cpp:426-488` +
    `seqwin.log:22-33`), and over the TPU relay that traffic is the build
    bottleneck. `graph.materialize()` recovers the full-transfer contract.

    ``keep_codes`` retains the parsed per-assembly base codes on
    ``graph.record_codes`` (RAM = dataset size) so downstream consumers --
    the device MinHash sketcher -- never re-parse the FASTAs."""
    return _build_impl(
        assembly_paths, kmerlen, windowsize, is_targets, n_cpu=n_cpu,
        low_memory=low_memory, backend=backend, defer=True,
        keep_codes=keep_codes, devices=devices,
    )


def _as_deferred(res, defer: bool):
    """Wrap a materialized 5-tuple build result for `build_deferred` callers."""
    if not defer:
        return res
    from ..engine.aggregate import HostGraph

    kmers, nodes, edges, offsets, record_ids = res
    return HostGraph(kmers, nodes, edges), offsets, record_ids


def _build_impl(
    assembly_paths,
    kmerlen: int,
    windowsize: int,
    is_targets,
    n_cpu: int,
    low_memory: bool,
    backend: str,
    defer: bool,
    keep_codes: bool = False,
    devices: int = 1,
):
    from time import time as _now

    paths = [str(p) for p in assembly_paths]
    targets = [bool(t) for t in is_targets]
    if len(paths) != len(targets):
        raise ValueError('assembly_paths and is_targets must have the same length')
    if len(paths) > U32_MAX:
        raise ValueError('Number of input assemblies exceeds uint32 range')

    if backend in ('numpy', 'oracle'):
        *res5, seqs = _build_numpy(paths, kmerlen, windowsize, targets, n_cpu,
                                   oracle=backend == 'oracle')
        out = _as_deferred(tuple(res5), defer)
        if defer and keep_codes:
            out[0].record_codes = seqs
        return out

    # --- chunked device scan config ---
    import os

    # multi-host scale-out entry point: SEQWIN_TPU_MULTIHOST='' (or '1') on
    # an already-initialized jax.distributed runtime, or
    # 'coordinator:port,num_processes,process_id' to initialize here. Each
    # process parses its own contiguous assembly share; output arrays (and
    # bytes) match the single-process build.
    mh = os.environ.get('SEQWIN_TPU_MULTIHOST')
    if mh is not None:
        from ..parallel import multihost

        if mh not in ('', '1'):
            coord, nproc_s, pid_s = mh.rsplit(',', 2)
            multihost.initialize(coord, int(nproc_s), int(pid_s))
        return _as_deferred(multihost.build_multihost(
            paths, kmerlen, windowsize, targets, n_cpu=n_cpu,
            low_memory=low_memory), defer)

    # multi-device (single-host) build: shard_map over an N-device mesh.
    # devices == 0 -> all local devices (the reference's `--threads` analog
    # at chip granularity, `/root/reference/src/seqwin/cli.py`).
    if devices != 1:
        import jax

        from ..parallel.distributed import build_distributed, make_mesh

        n_avail = len(jax.devices())
        n_dev = n_avail if devices == 0 else min(int(devices), n_avail)
        if devices > n_avail:
            logger.warning(
                f'Requested {devices} devices but only {n_avail} are '
                f'available; using {n_dev}')
        if n_dev > 1:
            keep = keep_codes and defer
            res = build_distributed(
                paths, kmerlen, windowsize, targets,
                mesh=make_mesh(n_dev), n_cpu=n_cpu, keep_codes=keep,
                low_memory=low_memory)
            if keep:
                *res, dist_codes = res
                out = _as_deferred(tuple(res), defer)
                out[0].record_codes = dist_codes
                return out
            return _as_deferred(res, defer)

    use_sort_engine = os.environ.get('SEQWIN_TPU_SCAN', 'hybrid') == 'sort'
    chunk_budget = LOW_MEMORY_CHUNK_BASES if low_memory else int(
        os.environ.get('SEQWIN_TPU_CHUNK_BASES', DEFAULT_CHUNK_BASES))
    use_fused = (
        not use_sort_engine and os.environ.get('SEQWIN_TPU_FUSED', '0') == '1'
    )

    # --- ingest (parallel across files), STREAMED into the dispatch loop:
    # files parse in worker threads while earlier chunks run on device. ---
    _t0_ingest = _now()
    n_workers = max(1, min(int(n_cpu), len(paths) or 1))
    ex = ThreadPoolExecutor(max_workers=n_workers)
    parsed_iter = ex.map(parse_fasta_codes, paths)

    record_ids: list[tuple[str, ...]] = []
    record_offsets = [0]
    total_bases = 0
    kept_codes: list[list[np.ndarray]] | None = [] if keep_codes else None

    def take_parsed(pi, ids, codes_list):
        nonlocal total_bases
        for rid, codes in zip(ids, codes_list):
            if len(codes) > U32_MAX:
                raise ValueError(
                    f'Sequence length exceeds uint32 range for record {rid} in assembly {paths[pi]}'
                )
            total_bases += len(codes)
        record_ids.append(tuple(ids))
        record_offsets.append(record_offsets[-1] + len(ids))
        if record_offsets[-1] > U32_MAX:
            raise ValueError('Total number of FASTA records exceeds uint32 range')
        if kept_codes is not None:
            kept_codes.append(codes_list)

    # fused one-program path: all chunk scans + the merge in a single device
    # program (engine/fused.py) -- immune to per-program relay overhead.
    # OFF by default: head-to-head on the real chip (192 Mbp, median of 3)
    # measured the per-chunk pipeline at 3.04 s vs 3.55 s fused -- the
    # host-prep/device overlap of deferred-sync chunks outweighs the saved
    # program dispatches. SEQWIN_TPU_FUSED=1 re-enables. (Needs the whole
    # dataset up front, so it forgoes the streamed ingest.)
    if use_fused:
        try:
            parsed = list(parsed_iter)
        finally:
            ex.shutdown(wait=True, cancel_futures=True)
        for pi, (ids, codes_list) in enumerate(parsed):
            take_parsed(pi, ids, codes_list)
        offsets = np.array(record_offsets, dtype=np.uintp)
        logger.debug(f'build: ingest {_now() - _t0_ingest:.2f}s')
        shape_bucket_f = min(
            chunk_budget, 1 << max(16, (max(1, total_bases) - 1).bit_length()))
        chunk_lists, oversized = _group_chunks(parsed, chunk_budget)
        if chunk_lists and not oversized:
            from ..engine.fused import build_fused

            _t0 = _now()
            res = build_fused(
                chunk_lists, kmerlen, windowsize, offsets, targets,
                min_chunk=shape_bucket_f, n_cpu=n_cpu,
            )
            if res is not None:
                logger.debug(f'build: fused total {_now() - _t0:.2f}s')
                out = _as_deferred((*res, offsets, record_ids), defer)
                if defer and keep_codes:
                    out[0].record_codes = kept_codes
                return out
            logger.debug('build: fused fell back to per-chunk path')
        parsed_iter = iter(parsed)
        record_ids, record_offsets, total_bases = [], [0], 0
        if kept_codes is not None:
            kept_codes = []

    chunk_results = []  # (e_oh, e_pos, e_rec, count) device arrays
    chunk_inputs = []   # (record list, rec_base) for overflow re-runs
    chunk_codes: list[np.ndarray] = []
    chunk_rec_base = 0
    chunk_bases = 0
    rec_global = 0
    # one compiled shape per run: all chunks pad to one shared bucket. The
    # bucket is resolved lazily: any flush BEFORE the ingest ends implies
    # total > chunk_budget (the budget-overflow / oversized-record triggers),
    # so the bucket is the budget; a dataset that fits in one chunk resolves
    # at the final flush from its exact total -- identical to the eager
    # min(budget, pow2(total)) rule, without needing the total up front.
    shape_bucket = None

    def ensure_bucket(final: bool = False):
        nonlocal shape_bucket
        if shape_bucket is None:
            if final:
                shape_bucket = min(
                    chunk_budget,
                    1 << max(16, (max(1, total_bases) - 1).bit_length()),
                )
            else:
                shape_bucket = chunk_budget

    def flush(final: bool = False):
        nonlocal chunk_codes, chunk_rec_base, chunk_bases
        if not chunk_codes:
            return
        ensure_bucket(final)
        if use_sort_engine:
            from ..engine.minimizer import scan_records_host

            import jax.numpy as jnp

            oh, pos, rec = scan_records_host(chunk_codes, kmerlen, windowsize)
            rec = (rec.astype(np.int64) + chunk_rec_base).astype(np.int32)
            chunk_results.append(
                (jnp.asarray(oh), jnp.asarray(pos), jnp.asarray(rec), len(oh))
            )
        else:
            from ..engine.hybrid import scan_chunk_device

            # deferred sync + threaded prep: host prep of chunks runs in a
            # small pool (prep was 2.5 s SERIAL at 800 Mbp), device compute
            # overlaps prep of later chunks and the parse of later files;
            # emission-capacity overflows are detected below and those
            # chunks re-run synchronously (rare). Futures keep chunk order.
            chunk_results.append(prep_pool().submit(
                scan_chunk_device,
                chunk_codes, kmerlen, windowsize, chunk_rec_base,
                min_chunk=shape_bucket, defer_sync=True,
                record_offsets=np.array(record_offsets, dtype=np.uintp),
            ))
        chunk_inputs.append((chunk_codes, chunk_rec_base))
        chunk_rec_base += len(chunk_codes)
        chunk_codes, chunk_bases = [], 0

    _prep_pool: list[ThreadPoolExecutor] = []

    def prep_pool() -> ThreadPoolExecutor:
        if not _prep_pool:
            _prep_pool.append(ThreadPoolExecutor(
                max_workers=max(1, min(4, int(n_cpu)))))
        return _prep_pool[0]

    _t0 = _now()
    bridge_pairs = []  # block-junction edges of records split over chunks
    try:
        for pi, (ids, codes_list) in enumerate(parsed_iter):
            take_parsed(pi, ids, codes_list)
            for codes in codes_list:
                if not use_sort_engine and len(codes) > chunk_budget:
                    # a record larger than the chunk budget: exact halo'd
                    # block scan (sequence-length scaling, SURVEY.md §2.3)
                    from ..engine.hybrid import scan_record_blocks

                    flush()
                    ensure_bucket()  # record > budget => bucket == budget
                    res, pairs = scan_record_blocks(
                        codes, kmerlen, windowsize, rec_global, chunk_budget,
                        min_chunk=shape_bucket,
                        record_offsets=np.array(record_offsets, dtype=np.uintp),
                    )
                    chunk_results.extend(res)
                    chunk_inputs.extend([None] * len(res))
                    bridge_pairs.extend(pairs)
                    chunk_rec_base = rec_global + 1
                    rec_global += 1
                    continue
                if chunk_bases + len(codes) > chunk_budget and chunk_codes:
                    flush()
                chunk_codes.append(codes)
                chunk_bases += len(codes)
                rec_global += 1
        flush(final=True)
        _ok = True
    except BaseException:
        _ok = False
        raise
    finally:
        ex.shutdown(wait=True, cancel_futures=not _ok)
        if _prep_pool:
            _prep_pool[0].shutdown(wait=True, cancel_futures=not _ok)
    from concurrent.futures import Future

    chunk_results = [
        r.result() if isinstance(r, Future) else r for r in chunk_results
    ]
    offsets = np.array(record_offsets, dtype=np.uintp)
    logger.debug(
        f'build: ingest+dispatch {_now() - _t0_ingest:.2f}s '
        f'({len(chunk_results)} chunks)'
    )

    _t0 = _now()
    if not use_sort_engine:
        import jax.numpy as jnp

        from ..engine.hybrid import scan_chunk_device

        # one batched fetch of every deferred count (8 ms relay latency per
        # transfer; a per-chunk int() would pay it len(chunks) times)
        from ..engine import timeline

        deferred = [
            i for i, (inp, res) in enumerate(zip(chunk_inputs, chunk_results))
            if inp is not None and res[0] is not None
        ]
        timeline.mark('counts_fetch_start', n_chunks=len(deferred))
        counts = (
            np.asarray(jnp.stack([chunk_results[i][3] for i in deferred]))
            if deferred else np.zeros(0, np.int32)
        )
        timeline.mark('counts_fetched')
        count_of = dict(zip(deferred, (int(c) for c in counts)))
        resolved = []
        for i, (inp, res) in enumerate(zip(chunk_inputs, chunk_results)):
            if inp is None or res[0] is None:  # block chunks arrive finalized
                resolved.append(res)
                continue
            recs, base = inp
            count = count_of[i]
            if count <= res[0].shape[0]:
                resolved.append((res[0], res[1], res[2], count, res[4]))
            else:  # capacity overflow: re-run this chunk with exact sizing
                resolved.append(scan_chunk_device(
                    recs, kmerlen, windowsize, base, min_chunk=shape_bucket,
                    record_offsets=offsets,
                ))
        chunk_results = resolved
    logger.debug(f'build: scan resolve {_now() - _t0:.2f}s')

    # --- aggregate (device sorts + host run-merge) ---
    from ..engine.aggregate import aggregate_device

    _t0 = _now()
    res = aggregate_device(
        chunk_results, offsets, np.asarray(targets, dtype=bool),
        extra_pairs=bridge_pairs or None, defer=defer,
    )
    logger.debug(f'build: aggregate {_now() - _t0:.2f}s')
    if defer:
        if keep_codes:
            res.record_codes = kept_codes
        return res, offsets, record_ids
    kmers, nodes, edges = res
    return kmers, nodes, edges, offsets, record_ids


def _group_chunks(parsed, chunk_budget: int):
    """Group records into budgeted chunks (same packing rule as the
    per-chunk dispatch loop below). Returns ([(codes_list, rec_base), ...],
    any_record_oversized)."""
    lists: list[tuple[list[np.ndarray], int]] = []
    cur: list[np.ndarray] = []
    rec_base = 0
    bases = 0
    oversized = False
    for _, codes_list in parsed:
        for codes in codes_list:
            if len(codes) > chunk_budget:
                oversized = True
            if bases + len(codes) > chunk_budget and cur:
                lists.append((cur, rec_base))
                rec_base += len(cur)
                cur, bases = [], 0
            cur.append(codes)
            bases += len(codes)
    if cur:
        lists.append((cur, rec_base))
    return lists, oversized


def _build_numpy(paths, kmerlen, windowsize, targets, n_cpu, oracle=False):
    """Device-free reference backends: the vectorized NumPy builder
    (`ops/host_build.py`, `backend='numpy'`) or the per-position oracle
    (`ops/oracle.py`, `backend='oracle'`, slow -- differential tests only)."""
    if oracle:
        from ..ops.oracle import build_graph
    else:
        from ..ops.host_build import build_graph_vec as build_graph

    record_ids: list[tuple[str, ...]] = []
    record_seqs: list[list[np.ndarray]] = []
    for p in paths:
        ids, codes_list = parse_fasta_codes(p)
        record_ids.append(tuple(ids))
        record_seqs.append(codes_list)
    kmers, nodes, edges, offsets = build_graph(record_seqs, kmerlen, windowsize, targets)
    return kmers, nodes, edges, offsets, record_ids, record_seqs


def kept_node_layout(
    nodes: np.ndarray, used_hashes
) -> tuple[np.ndarray, np.ndarray, int]:
    """Which nodes survive ``used_hashes`` and where their k-mers land.

    Returns (keep bool[len(nodes)], out_nodes with rebased start/stop,
    total kept k-mer entries). Shared by the host compaction below and the
    device-resident compaction (`engine.aggregate.DeviceGraph.compact_kmers`).
    """
    used = np.fromiter((int(h) for h in used_hashes), dtype=np.uint64)
    used.sort()
    keep = np.isin(nodes['hash'], used, assume_unique=False)
    kept_nodes = nodes[keep]
    sizes = (kept_nodes['stop'] - kept_nodes['start']).astype(np.int64)
    new_stops = np.cumsum(sizes)
    out_nodes = kept_nodes.copy()
    out_nodes['start'] = new_stops - sizes
    out_nodes['stop'] = new_stops
    total = int(new_stops[-1]) if len(kept_nodes) else 0
    return keep, out_nodes, total


def filter_kmers(
    kmers: np.ndarray, nodes: np.ndarray, used_hashes
) -> tuple[np.ndarray, np.ndarray]:
    """Keep only k-mers/nodes whose hash is in ``used_hashes``; rebase ranges.

    Vectorized equivalent of the native sorted-intersection compaction
    (`/root/reference/cpp/src/seqwin/helpers.cpp:426-488`).
    """
    keep, out_nodes, total = kept_node_layout(nodes, used_hashes)
    kept_nodes = nodes[keep]
    new_kmers = np.zeros(total, dtype=KMER_DTYPE)
    if total:
        # vectorized segment gather: within-segment offset + old segment start
        sizes = (kept_nodes['stop'] - kept_nodes['start']).astype(np.int64)
        old_starts = kept_nodes['start'].astype(np.int64)
        new_starts = out_nodes['start'].astype(np.int64)
        seg_idx = (np.arange(total, dtype=np.int64)
                   + np.repeat(old_starts - new_starts, sizes))
        new_kmers = kmers[seg_idx]
    return new_kmers, out_nodes
