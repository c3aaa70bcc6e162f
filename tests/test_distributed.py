"""Multi-device build: output must be invariant to the device count
(TPU analog of the reference's thread-count equivalence tests,
`/root/reference/tests/smoke/test_graph.py:59-121`), with the merge running
on the bucket owners."""
import os
from pathlib import Path

import numpy as np
import pytest

import jax

from seqwin_tpu.engine.aggregate import aggregate
from seqwin_tpu.engine.minimizer import scan_records_host
from seqwin_tpu.graph import build
from seqwin_tpu.parallel.distributed import (
    build_distributed,
    build_distributed_arrays,
    make_mesh,
    scan_record_sharded,
)


def _random_records(rng, sizes, n_frac=0.01):
    out = []
    for n in sizes:
        c = rng.integers(0, 4, size=n).astype(np.uint8)
        mask = rng.random(n) < n_frac
        c[mask] = 255
        out.append(c)
    return out


def _single_chip_reference(records, k, w, offsets, targets):
    oh, pos, rec = scan_records_host(records, k, w)
    asm = (np.searchsorted(offsets.astype(np.int64), rec, side='right') - 1).astype(np.int32)
    return aggregate(oh, pos, rec, asm, np.asarray(targets), record_offsets=offsets)


@pytest.mark.parametrize('n_dev', [1, 2, 8])
def test_build_distributed_arrays_matches_single(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(42)
    records = _random_records(rng, [700, 1200, 150, 950, 2000, 64, 800, 500, 300])
    offsets = np.array([0, 2, 5, 7, 9], dtype=np.uintp)  # 4 assemblies
    targets = [True, True, False, False]
    k, w = 9, 12

    ref_k, ref_n, ref_e = _single_chip_reference(records, k, w, offsets, targets)
    mesh = make_mesh(n_dev)
    got_k, got_n, got_e = build_distributed_arrays(
        records, offsets, targets, k, w, mesh
    )
    np.testing.assert_array_equal(got_k, ref_k)
    np.testing.assert_array_equal(got_n, ref_n)
    np.testing.assert_array_equal(got_e, ref_e)


def test_build_distributed_matches_build(fixture_paths):
    if len(jax.devices()) < 8:
        pytest.skip('not enough devices')
    targets = [True, True, False, False]
    ref = build(fixture_paths, 17, 10, targets)
    mesh = make_mesh(8)
    got = build_distributed(fixture_paths, 17, 10, targets, mesh=mesh)
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(a, b)
    assert ref[4] == got[4]


@pytest.mark.parametrize('n_dev', [2, 8])
def test_scan_record_sharded_matches_single(n_dev):
    """One record split across the mesh with halo'd blocks: the emission
    stream plus bridge-junction edges must reproduce the unsplit scan."""
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(7)
    n = 200_000
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    codes[rng.random(n) < 0.002] = 255
    k, w = 15, 40

    ref_oh, ref_pos, ref_rec = scan_records_host([codes], k, w)
    mesh = make_mesh(n_dev)
    (oh, pos, rec), bridges = scan_record_sharded(codes, k, w, mesh)

    np.testing.assert_array_equal(oh, ref_oh)
    np.testing.assert_array_equal(pos, ref_pos)
    np.testing.assert_array_equal(rec, ref_rec)

    # bridge pairs are exactly the adjacencies at block junctions: every
    # consecutive emission pair must appear either inside one device's kept
    # range or as a bridge
    offsets = np.array([0, 1], dtype=np.uintp)
    ref_graph = aggregate(
        ref_oh, ref_pos, ref_rec, np.zeros(len(ref_oh), np.int32),
        np.asarray([True]), record_offsets=offsets,
    )
    # reconstruct distributed adjacency: stream edges within kept ranges are
    # contiguous in the returned stream; bridges cover the junctions, so the
    # union is the single-chip edge set
    got_graph = aggregate(
        oh, pos, rec, np.zeros(len(oh), np.int32),
        np.asarray([True]), record_offsets=offsets,
    )
    np.testing.assert_array_equal(got_graph[1], ref_graph[1])  # nodes
    np.testing.assert_array_equal(got_graph[2], ref_graph[2])  # edges
    assert all(u <= v for u, v, _ in bridges)


@pytest.mark.parametrize('extract', ['rank', 'pfx'])
def test_scan_record_sharded_extract_variants(extract, monkeypatch):
    """The sequence-sharded block program supports every extraction variant
    natively (round 4; previously pfx downgraded to topk with a warning) and
    reproduces the unsplit scan exactly."""
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(29)
    n = 120_000
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    codes[rng.random(n) < 0.002] = 255
    k, w = 15, 40

    ref_oh, ref_pos, ref_rec = scan_records_host([codes], k, w)
    monkeypatch.setenv('SEQWIN_TPU_EXTRACT', extract)
    (oh, pos, rec), _bridges = scan_record_sharded(
        codes, k, w, make_mesh(n_dev))
    np.testing.assert_array_equal(oh, ref_oh)
    np.testing.assert_array_equal(pos, ref_pos)
    np.testing.assert_array_equal(rec, ref_rec)


@pytest.mark.parametrize('chunk_bases', [1, 2048])
def test_build_distributed_low_memory_matches(fixture_paths, monkeypatch,
                                              chunk_bases):
    """Distributed low-memory mode: assemblies process in budget-capped
    whole-assembly batches and the host merge (`merge_graph_parts`) must
    reproduce the unbatched build byte-exactly (VERDICT r3 gap #3; the
    reference composes low-memory with its thread parallelism,
    `graph.cpp:213-272`). chunk_bases=1 forces one assembly per batch."""
    if len(jax.devices()) < 8:
        pytest.skip('not enough devices')
    import importlib

    gb = importlib.import_module('seqwin_tpu.graph.build')
    targets = [True, True, False, False]
    ref = build(fixture_paths, 17, 10, targets)
    monkeypatch.setattr(gb, 'LOW_MEMORY_CHUNK_BASES', chunk_bases)
    got = build_distributed(
        fixture_paths, 17, 10, targets, mesh=make_mesh(8), low_memory=True)
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(a, b)
    assert ref[4] == got[4]


def test_build_low_memory_devices_cli_path(fixture_paths, monkeypatch):
    """`build(..., low_memory=True, devices=N)` (the CLI composition) takes
    the batched distributed path and matches the plain build."""
    if len(jax.devices()) < 4:
        pytest.skip('not enough devices')
    import importlib

    gb = importlib.import_module('seqwin_tpu.graph.build')
    monkeypatch.setattr(gb, 'LOW_MEMORY_CHUNK_BASES', 1)
    targets = [True, True, False, False]
    ref = build(fixture_paths, 17, 10, targets)
    got = build(fixture_paths, 17, 10, targets, low_memory=True, devices=4)
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(a, b)


def test_multihost_low_memory_single_process_matches(fixture_paths,
                                                     monkeypatch):
    """Multihost low-memory composition (global stat-size batches +
    per-batch partition + host merge) must reproduce the plain build
    byte-exactly; 1-base budget forces one assembly per batch."""
    import importlib

    from seqwin_tpu.parallel.multihost import build_multihost

    gb = importlib.import_module('seqwin_tpu.graph.build')
    monkeypatch.setattr(gb, 'LOW_MEMORY_CHUNK_BASES', 1)
    targets = [True, True, False, False]
    ref_k, ref_n, ref_e, ref_off, ref_ids = build(fixture_paths, 17, 10, targets)
    got_k, got_n, got_e, got_off, got_ids = build_multihost(
        fixture_paths, 17, 10, targets, low_memory=True)
    np.testing.assert_array_equal(got_k, ref_k)
    np.testing.assert_array_equal(got_n, ref_n)
    np.testing.assert_array_equal(got_e, ref_e)
    np.testing.assert_array_equal(got_off, ref_off)
    assert [tuple(t) for t in got_ids] == [tuple(t) for t in ref_ids]


def test_multihost_partition_contiguous_and_balanced():
    from seqwin_tpu.parallel.multihost import partition_paths

    paths = [f'g{i}' for i in range(10)]
    sizes = [100, 50, 200, 10, 10, 300, 100, 100, 40, 90]
    parts = [partition_paths(paths, sizes, 3, pid) for pid in range(3)]
    # disjoint cover, contiguous
    flat = [p for part in parts for p in part]
    assert flat == paths
    for part in parts:
        idxs = [paths.index(p) for p in part]
        assert idxs == list(range(min(idxs), max(idxs) + 1)) if idxs else True


def test_multihost_record_bookkeeping_invariance():
    """Per-process record offsets / rec_base bookkeeping: for any process
    count, the exchanged per-assembly counts concatenate to the global
    vector and rec_base0 values tile the global record index space."""
    from seqwin_tpu.parallel.multihost import (
        exchange_record_counts,
        partition_indices,
    )

    counts = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64)
    sizes = [c * 100 for c in counts]
    global_offsets = np.concatenate(([0], np.cumsum(counts)))
    for nproc in (1, 2, 3, 5):
        parts = [partition_indices(sizes, nproc, p) for p in range(nproc)]
        assert sorted(i for part in parts for i in part) == list(range(len(counts)))
        rebuilt = np.concatenate([counts[part] for part in parts if part])
        np.testing.assert_array_equal(rebuilt, counts)
        # rec_base0 of each process == global offset of its first assembly
        next_base = 0
        for part in parts:
            if not part:
                continue
            assert int(global_offsets[part[0]]) == next_base
            next_base += int(counts[part].sum())
        assert next_base == int(counts.sum())
    # single-process exchange is the identity
    np.testing.assert_array_equal(exchange_record_counts(counts, 1), counts)


@pytest.mark.parametrize('low_memory', [False, True])
def test_multihost_two_process_e2e(tmp_path, fixture_paths, low_memory):
    """REAL 2-process multihost build: two OS processes, each parsing only
    its own assemblies, one global 4-device CPU mesh, bucket merge crossing
    the process boundary over gloo. Output must be byte-identical to the
    single-process `graph.build` (the process-level analog of the
    reference's thread-count-equivalence contract,
    `/root/reference/tests/smoke/test_graph.py:59-121`). With ``low_memory``
    the batched composition runs one assembly per batch, checking the
    per-batch collectives stay aligned across processes."""
    import socket
    import subprocess
    import sys

    targets = [True, True, False, False]
    paths_txt = tmp_path / 'paths.txt'
    paths_txt.write_text(''.join(
        f'{p}\t{int(t)}\n' for p, t in zip(fixture_paths, targets)
    ))
    out_npz = tmp_path / 'mp_result.npz'
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / '_mp_worker.py'
    env = {**os.environ, 'PYTHONPATH': str(Path(__file__).parent.parent)}
    env.pop('XLA_FLAGS', None)  # workers set their own 2-device count
    extra = ['lowmem'] if low_memory else []
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port),
             str(out_npz), str(paths_txt), *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{o}'

    got = np.load(out_npz, allow_pickle=False)
    ref_k, ref_n, ref_e, ref_off, ref_ids = build(fixture_paths, 17, 10, targets)
    np.testing.assert_array_equal(got['kmers'], ref_k)
    np.testing.assert_array_equal(got['nodes'], ref_n)
    np.testing.assert_array_equal(got['edges'], ref_e)
    np.testing.assert_array_equal(got['record_offsets'], ref_off.astype(np.int64))
    import json

    with open(str(out_npz) + '.ids.json') as f:
        got_ids = [tuple(t) for t in json.load(f)]
    assert got_ids == [tuple(t) for t in ref_ids]


def test_build_distributed_arrays_rec_base0():
    """rec_base0 globalizes record ids (the multi-host bookkeeping knob)."""
    if len(jax.devices()) < 2:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(3)
    records = _random_records(rng, [500, 800, 400])
    # pretend these are records 5..7 of a larger run: assembly spans 4..8
    offsets = np.array([0, 5, 8], dtype=np.uintp)
    targets = [True, False]
    mesh = make_mesh(2)
    kmers, nodes, edges = build_distributed_arrays(
        records, offsets, targets, 9, 6, mesh, rec_base0=5
    )
    assert kmers['record_idx'].min() >= 5
    assert kmers['record_idx'].max() <= 7
    # records 5..7 belong to assembly 1, which is non-target
    assert nodes['n_tar'].sum() == 0
    assert nodes['n_neg'].sum() == len(nodes) > 0


def test_multihost_env_routing_single_process(fixture_paths, monkeypatch):
    """SEQWIN_TPU_MULTIHOST routes graph.build through build_multihost; at
    one process it must be byte-identical to the default engine."""
    targets = [True, True, False, False]
    ref = build(fixture_paths, 17, 10, targets)
    monkeypatch.setenv('SEQWIN_TPU_MULTIHOST', '')
    got = build(fixture_paths, 17, 10, targets)
    np.testing.assert_array_equal(got[0], ref[0])
    for f in ref[1].dtype.names:
        np.testing.assert_array_equal(got[1][f], ref[1][f])
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(
        np.asarray(got[3], np.int64), np.asarray(ref[3], np.int64))
    assert [tuple(t) for t in got[4]] == [tuple(t) for t in ref[4]]


def test_skewed_buckets_compile_once():
    """Adversarial capacity case: a poly-A dataset emits at EVERY position
    and every emission hashes to ONE bucket -- the old heuristic caps would
    have overflowed and re-specialized (recompiled) the shard_map program.
    The exact count pre-pass must size caps so the big program is built with
    exactly ONE ShardSpec, and the output still matches single-chip."""
    import seqwin_tpu.parallel.distributed as D

    if len(jax.devices()) < 8:
        pytest.skip('not enough devices')
    records = [np.zeros(2000, dtype=np.uint8) for _ in range(8)]  # all 'A'
    offsets = np.array([0, 4, 8], dtype=np.uintp)
    targets = [True, False]
    k, w = 9, 12

    specs = []
    orig = D._sharded_build_jit

    def spying(*args):
        specs.append(args[-3])
        return orig(*args)

    D._sharded_build_jit = spying
    try:
        mesh = make_mesh(8)
        got_k, got_n, got_e = build_distributed_arrays(
            records, offsets, targets, k, w, mesh
        )
    finally:
        D._sharded_build_jit = orig

    assert len(specs) == 1, f'big program specialized {len(specs)} times'
    # caps were sized from exact counts: emissions are dense here
    assert specs[0].emit_cap >= 1984  # ~every position of a 2000-base record
    ref_k, ref_n, ref_e = _single_chip_reference(records, k, w, offsets, targets)
    np.testing.assert_array_equal(got_k, ref_k)
    np.testing.assert_array_equal(got_n, ref_n)
    np.testing.assert_array_equal(got_e, ref_e)


def test_oversized_record_composed_into_distributed_build():
    """Sequence sharding composed into the distributed build: a record ~10x
    the shard budget is scanned via the halo-block path (scan_record_sharded)
    and its emissions ride the bucket merge as extras -- byte-equal to
    single-chip WITHOUT inflating the shared per-device stream shape."""
    import seqwin_tpu.parallel.distributed as D

    if len(jax.devices()) < 8:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(7)
    big = _random_records(rng, [150_000], n_frac=0.003)[0]
    small = _random_records(rng, [2000, 1500, 1800, 2200, 1700])
    # oversized record in the MIDDLE of the list (exercises shard termination)
    records = [small[0], small[1], big, small[2], small[3], small[4]]
    offsets = np.array([0, 2, 3, 5, 6], dtype=np.uintp)  # 4 assemblies
    targets = [True, True, False, False]
    k, w = 9, 12

    specs = []
    orig = D._sharded_build_x_jit

    def spying(*args):
        specs.append(args[-3])
        return orig(*args)

    D._sharded_build_x_jit = spying
    try:
        mesh = make_mesh(8)
        got_k, got_n, got_e = build_distributed_arrays(
            records, offsets, targets, k, w, mesh
        )
    finally:
        D._sharded_build_x_jit = orig

    assert len(specs) == 1, 'extras program must have been used, exactly once'
    assert specs[0].n_bases < len(big), (
        f'shared stream shape {specs[0].n_bases} was inflated by the '
        f'{len(big)}-base record')

    ref_k, ref_n, ref_e = _single_chip_reference(records, k, w, offsets, targets)
    np.testing.assert_array_equal(got_k, ref_k)
    np.testing.assert_array_equal(got_n, ref_n)
    np.testing.assert_array_equal(got_e, ref_e)


def test_oversized_first_and_last_records():
    """Oversized records at the list boundaries (first record, last record)."""
    if len(jax.devices()) < 4:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(21)
    big1 = _random_records(rng, [140_000], n_frac=0.002)[0]
    big2 = _random_records(rng, [160_000], n_frac=0.002)[0]
    small = _random_records(rng, [1000, 1200])
    records = [big1, small[0], small[1], big2]
    offsets = np.array([0, 2, 4], dtype=np.uintp)
    targets = [True, False]
    k, w = 9, 12

    mesh = make_mesh(4)
    got = build_distributed_arrays(records, offsets, targets, k, w, mesh)
    ref = _single_chip_reference(records, k, w, offsets, targets)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_count_prepass_histograms_exact():
    """The capacity pre-pass must route on the SAME keys as the build: the
    out-hash at the minimizer position z[p], not at the emission flag
    position p (where they differ for ~half of all emissions). The build
    asserts its caps are exact and has no retry ladder, so a proxy histogram
    here would be a latent crash (regression: round-3 review finding #1)."""
    from seqwin_tpu.engine.hybrid import _asm_table
    from seqwin_tpu.parallel.distributed import (
        ShardSpec,
        _shard_layout,
        _sharded_count_jit,
        partition_records,
    )

    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(7)
    # long random records -> dense emission stream, every bucket populated
    records = _random_records(rng, [30_000, 21_000, 27_000, 35_000], n_frac=0.003)
    k, w = 9, 12

    shard_of = partition_records([len(c) for c in records], n_dev)
    codes, starts, patch_pos, patch_z, rec_base, n, offset = _shard_layout(
        records, shard_of, n_dev, k, w, use_pallas=False)
    mesh = make_mesh(n_dev)
    spec0 = ShardSpec(k=k, w=w, n_bases=n, offset=offset,
                      emit_cap=0, bucket_cap=0, use_pallas=False)
    _, _, e_hist, p_hist = (
        np.asarray(o) for o in _sharded_count_jit(
            jax.device_put(codes), jax.device_put(patch_pos),
            jax.device_put(patch_z), jax.device_put(starts),
            spec0, n_dev, mesh)
    )

    # ground truth per shard from the host reference scan (emitted hashes
    # ARE the z-position hashes), bucketed with the build's range partitions
    # (equal-width for nodes, equal-mass `_pair_bucket_host` for pairs)
    from seqwin_tpu.parallel.distributed import _pair_bucket_host

    def bucket(oh):
        return ((oh >> np.uint64(32)).astype(np.int64) * n_dev) >> 32

    for d in range(n_dev):
        recs_d = [c for c, s in zip(records, shard_of) if s == d]
        if not recs_d:
            exp_e = np.zeros(n_dev, np.int64)
            exp_p = np.zeros(n_dev, np.int64)
        else:
            oh, _, rec = scan_records_host(recs_d, k, w)
            exp_e = np.bincount(bucket(oh), minlength=n_dev)
            pair = rec[:-1] == rec[1:]
            pu = np.minimum(oh[:-1], oh[1:])[pair]
            exp_p = np.bincount(_pair_bucket_host(pu, n_dev), minlength=n_dev)
        np.testing.assert_array_equal(e_hist[d], exp_e, err_msg=f'e_hist dev {d}')
        np.testing.assert_array_equal(p_hist[d], exp_p, err_msg=f'p_hist dev {d}')


@pytest.mark.parametrize('extract', ['rank', 'pfx'])
def test_build_distributed_extract_variants(extract, monkeypatch):
    """The distributed build must be byte-equal under every extraction
    variant (the main shard program supports pfx natively; spec.extract is
    part of the jit cache key)."""
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(17)
    records = _random_records(rng, [900, 1500, 300, 1100, 700], n_frac=0.02)
    offsets = np.array([0, 2, 5], dtype=np.uintp)
    targets = [True, False]
    k, w = 9, 12

    ref = _single_chip_reference(records, k, w, offsets, targets)
    monkeypatch.setenv('SEQWIN_TPU_EXTRACT', extract)
    got = build_distributed_arrays(
        records, offsets, targets, k, w, make_mesh(n_dev))
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
