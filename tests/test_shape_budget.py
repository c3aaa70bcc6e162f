"""Compiled-shape budget guard.

Remote TPU compiles on this toolchain cost ~45 s each regardless of program
size (PERF.md), so the engine's one-bucket shape policy -- every chunk of a
run padded to one shared shape -- is a first-class performance contract.
This test counts actual backend compiles (jax monitoring events) during a
multi-chunk build and pins two properties:

1. a cold multi-chunk build stays under a small constant number of compiles;
2. growing the dataset (more chunks of the same bucket) must NOT recompile
   the per-chunk programs -- only the aggregation stage, whose shape depends
   on the concatenated stream length, may add shapes.
"""
import numpy as np
import pytest

import importlib

build_mod = importlib.import_module('seqwin_tpu.graph.build')
build_fn = build_mod.build

# every build may compile: unpack/phase1/phase2 (+ block_adjust), the
# aggregation node/edge merges and small glue -- but never per-chunk shapes
COLD_BUDGET = 24
# a larger run with the same shape bucket: only the aggregation stage (its
# shapes depend on the concatenated stream / output sizes) may add programs
GROWTH_BUDGET = 16
# the scan programs (phase1/phase2/unpack) are the expensive remote compiles;
# they must NEVER recompile once the run's shape bucket is warm
_PER_CHUNK = ('phase1', 'phase2', 'unpack', 'pallas', 'scan')


def _count_compiles(fn):
    from jax._src import monitoring

    events = []

    def cb(event, duration, **kw):
        if event == '/jax/core/compile/backend_compile_duration':
            events.append(kw.get('fun_name', '?'))

    monitoring.register_event_duration_secs_listener(cb)
    try:
        out = fn()
    finally:
        monitoring.unregister_event_duration_listener(cb)
    return events, out


def _write_fasta(tmp_path, name, codes):
    alphabet = np.frombuffer(b'ACGT', dtype=np.uint8)
    seq = alphabet[np.clip(codes, 0, 3)].tobytes().decode()
    p = tmp_path / name
    with open(p, 'w') as f:
        f.write(f'>{name}\n{seq}\n')
    return p


@pytest.mark.parametrize('k,w', [(17, 10)])
def test_shape_budget(tmp_path, monkeypatch, k, w):
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 14)
    rng = np.random.default_rng(11)

    def dataset(n_files):
        paths, targets = [], []
        for i in range(n_files):
            codes = rng.integers(0, 4, size=6000 + 137 * i).astype(np.uint8)
            paths.append(_write_fasta(tmp_path, f'a{n_files}_{i}.fa', codes))
            targets.append(i % 2 == 0)
        return paths, targets

    # sanity: the monitoring hook actually observes compiles (a fresh
    # program with a shape no other test uses)
    import jax
    import jax.numpy as jnp

    probe, _ = _count_compiles(
        lambda: jax.jit(lambda x: x * 2 + 1)(jnp.arange(7919)).block_until_ready())
    assert probe, 'compile-event listener saw nothing'

    # cold build: ~4 chunks (24 Kbp+ over a 16 Kbp budget). May be zero if
    # earlier tests in the session already warmed the same shape bucket --
    # that is the shape policy working, not a failure.
    paths, targets = dataset(4)
    cold, _ = _count_compiles(lambda: build_fn(paths, k, w, targets))
    assert len(cold) <= COLD_BUDGET, f'cold build compiled {cold}'

    # the same shapes again: fully cached
    warm, _ = _count_compiles(lambda: build_fn(paths, k, w, targets))
    assert not warm, f'identical rebuild recompiled {warm}'

    # more chunks of the SAME bucket: per-chunk scan programs must all be
    # cached; only the concat-length-dependent aggregation may compile
    paths2, targets2 = dataset(9)
    grow, _ = _count_compiles(lambda: build_fn(paths2, k, w, targets2))
    scans = [f for f in grow if any(p in f for p in _PER_CHUNK)]
    assert not scans, f'per-chunk scan programs recompiled: {scans}'
    assert len(grow) <= GROWTH_BUDGET, (
        f'growing the run recompiled {len(grow)} programs ({grow}) -- the '
        'shape bucket policy regressed'
    )


# the deferred device-resident consumption (bench / pipeline spine) adds its
# own programs: count + edge gather + kmer gather, all with quantized output
# caps and TRACED thresholds so reruns at similar survivor counts recompile
# nothing
DEFERRED_BUDGET = 6


@pytest.mark.parametrize('k,w', [(17, 10)])
def test_shape_budget_deferred(tmp_path, monkeypatch, k, w):
    monkeypatch.setattr(build_mod, 'DEFAULT_CHUNK_BASES', 1 << 14)
    rng = np.random.default_rng(23)
    paths, targets = [], []
    for i in range(4):
        codes = rng.integers(0, 4, size=6000 + 211 * i).astype(np.uint8)
        paths.append(_write_fasta(tmp_path, f'd_{i}.fa', codes))
        targets.append(i % 2 == 0)

    def consume(th):
        graph, offsets, rids = build_mod.build_deferred(
            paths, k, w, targets, n_cpu=2)
        nodes = graph.nodes
        edges = graph.filter_edges(th)
        keep_hashes = nodes['hash'][::2]
        keep, out_nodes, total = build_mod.kept_node_layout(nodes, keep_hashes)
        kmers = graph.compact_kmers(keep, total)
        graph.release()
        return len(nodes), len(edges), len(kmers)

    _count_compiles(lambda: build_fn(paths, k, w, targets))  # warm the build
    cold, first = _count_compiles(lambda: consume(1.0))
    assert len(cold) <= DEFERRED_BUDGET, f'deferred consumption compiled {cold}'

    # a different threshold (traced scalar) and the same data: no recompiles
    warm, second = _count_compiles(lambda: consume(2.0))
    assert not warm, f'deferred rerun recompiled {warm}'
