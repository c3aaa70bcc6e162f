"""Benchmark: end-to-end minimizer graph build throughput on one chip.

Prints ONE JSON line per completed scale (each a complete result; the LAST
line is the most complete -- parse that). Headline: minimizers/s at the
REFERENCE scale (~800 Mbp: 170 genomes x 4.7 Mbp, the 171-Salmonella-class
workload the baseline was measured on), which runs FIRST (round 5: the
scales share compiled shapes, so headline-first costs ~nothing and
guarantees the number that counts is the one a tight budget records);
the 192 Mbp round-over-round scale runs second when budget remains.

Wall-clock budget: BENCH_BUDGET_S (default 900 s) covers EVERYTHING
except the post-warmup sampling floor (POST_WARMUP_FLOOR_S per scale: a
compile-window warmup overrun extends the deadline so the cheap timed
samples still run; worst case ~2x300 s past budget, lossless under a
hard kill thanks to per-sample emission) --
dataset generation, remote-compile warmup, and samples. Phases check the
deadline before starting; sample counts shrink automatically when single
builds run slow (relay bandwidth swings several-fold between windows,
PERF.md). SIGTERM/SIGINT mid-run still emits the best JSON so far.

Baseline: the reference builds 8,346,500 minimizers in 6.55 s on 4 CPU
threads (~1.27 M minimizers/s; `/root/repo/BASELINE.md`, golden run log
`/root/reference/tests/expected-output/seqwin.log:7-11`).

What one timed sample covers -- the device-touching pipeline spine, i.e.
what `KmerGraph` actually pays (`pipeline/kmers.py`):
  host FASTA parse -> chunked device scan -> device merge -> nodes d2h
  -> penalty fill + minimizer-sketch threshold estimation (host f64)
  -> device edge-weight filter (survivors d2h)
  -> device k-mer compaction of kept nodes (survivors d2h).
The full k-mer stream stays device-resident (`graph.build_deferred`): the
pipeline provably never consumes the ~99% of k-mers the filter discards
(reference run: 61,907 of 7.94 M kept). One extra sample per scale times
the DIRECT full-materialization `build()` -- the `--no-filter` / library
contract, apples-to-apples with the reference's own 6.55 s full build --
reported as `materialize_s` / `vs_baseline_materialized`. (Rounds 2-4
timed deferred + `materialize()` for that sample, a superset of both real
code paths; round-5 numbers are therefore slightly favorable vs r4 records
on identical hardware.) Subgraph search / marker extraction are excluded
on both sides.
"""
import json
import os
import signal
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_MIN_PER_S = 8_346_500 / 6.55  # reference: 4-thread CPU build

K = 21
W = 200
N_SAMPLES = int(os.environ.get('BENCH_SAMPLES', '5'))
BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', '900'))
T_START = time.time()
DEADLINE = T_START + BUDGET_S
# A compile-window warmup overrun must not starve the (cheap, ~7 s each)
# timed samples: once the headline warmup is paid, the deadline is
# extended to leave at least this much sampling room. Incremental emit()
# after every sample keeps a hard external kill lossless.
POST_WARMUP_FLOOR_S = min(300.0, BUDGET_S / 3)

# (label, n_genomes, genome_len). HEADLINE scale ('800M', the reference's
# 171-Salmonella-class workload) runs FIRST: it is the number that counts,
# the scales share nearly all compiled shapes (the 192M warmup after an
# 800M run was ~20 s in benchmarks/r4/bench_r4b.json), and incremental
# emission after every sample means a budget kill mid-run still records the
# headline. (Round 4 ran 192M first and a 458 s warmup window ate the 800M
# budget -- the official capture recorded only the non-headline scale.)
SCALES = [
    ('800M', 170, 4_700_000),
    ('192M', 64, 3_000_000),
]
HEADLINE_PREFERENCE = ['800M', '192M', 'custom']
if os.environ.get('BENCH_GENOMES') or os.environ.get('BENCH_GENOME_LEN'):
    SCALES = [(
        'custom',
        int(os.environ.get('BENCH_GENOMES', '64')),
        int(os.environ.get('BENCH_GENOME_LEN', '3000000')),
    )]

METHODOLOGY = (
    'timed region = deferred device-resident build (build_deferred + edge '
    'filter + kept-kmer compaction; full k-mer stream never crosses d2h); '
    'estimator = median of N timed builds (min also reported; relay '
    'bandwidth is bimodal, PERF.md). materialize_s times the DIRECT '
    'full-materialization build() (the --no-filter contract, same as the '
    'reference 6.55 s; rounds 2-4 timed deferred+materialize() there). '
    'Round-2 vs_baseline timed full materialization with min-of-5 -- '
    'compare round-2 records against vs_baseline_materialized here.'
)

_scales: dict = {}        # label -> per-scale result dict (mutated in place)
_last_emitted = None


def remaining() -> float:
    return DEADLINE - time.time()


def emit() -> None:
    """Print a complete result JSON line from everything measured so far."""
    if not _scales:
        return
    for label in HEADLINE_PREFERENCE:
        if label in _scales and _scales[label].get('min_per_s_median'):
            head_label, head = label, _scales[label]
            break
    else:
        return
    result = {
        'metric': 'graph_build_minimizers_per_s',
        'value': head['min_per_s_median'],
        'unit': 'minimizers/s',
        'vs_baseline': head['vs_baseline_median'],
        'value_min': head['min_per_s_min'],
        'vs_baseline_min': head['vs_baseline_min'],
        'headline_scale': head_label,
        'estimator': 'median of timed samples (min also reported)',
        'methodology': METHODOLOGY,
        'budget_s': BUDGET_S,
        'elapsed_s': round(time.time() - T_START, 1),
        'scales': _scales,
    }
    if 'vs_baseline_materialized_median' in head:
        result['vs_baseline_materialized'] = (
            head['vs_baseline_materialized_median'])
    global _last_emitted
    line = json.dumps({k: v for k, v in result.items() if k != 'elapsed_s'})
    if line == _last_emitted:
        return
    _last_emitted = line
    print(json.dumps(result), flush=True)


def synth_dataset(tmp: Path, n_genomes: int, genome_len: int):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=genome_len).astype(np.uint8)
    alphabet = np.frombuffer(b'ACGT', dtype=np.uint8)
    paths, targets = [], []
    nl = ord('\n')
    for i in range(n_genomes):
        g = base.copy()
        # ~0.5% SNPs per genome
        idx = rng.integers(0, genome_len, size=genome_len // 200)
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        seq = alphabet[g]
        # 80-col FASTA body built vectorized (a Python join at 4.7 Mbp x 170
        # would dominate dataset generation)
        full_rows = len(seq) // 80
        rem = len(seq) - full_rows * 80
        body = np.full((full_rows, 81), nl, dtype=np.uint8)
        body[:, :80] = seq[:full_rows * 80].reshape(full_rows, 80)
        p = tmp / f'g{i}.fasta'
        with open(p, 'wb') as f:
            f.write(f'>g{i}\n'.encode())
            f.write(body.tobytes())
            if rem:
                f.write(seq[full_rows * 80:].tobytes() + b'\n')
        paths.append(p)
        targets.append(i < n_genomes // 2)
    return paths, targets


def one_build(paths, targets, materialize: bool = False):
    """One timed sample: deferred build + the pipeline's device consumption
    (threshold math on host f64, edge filter, kept-kmer compaction).

    With ``materialize``: time the DIRECT full-materialization `build()`
    instead -- the exact contract `--no-filter` / library users pay and what
    the reference's own 6.55 s measures (`core.py:136-147`). (Rounds 2-4
    timed deferred build + `materialize()`, paying the deferred pipeline AND
    the full transfer -- a superset of both real code paths.)"""
    from seqwin_tpu.graph.build import build, build_deferred, kept_node_layout

    if materialize:
        kmers, nodes, edges, record_offsets, record_ids = build(
            paths, K, W, targets, n_cpu=8)
        # touch every output column so lazy views cannot defer the copy
        return (len(kmers), len(nodes), len(edges),
                int(kmers['pos'][:1].sum()) if len(kmers) else 0,
                int(edges['weight'][:1].sum()) if len(edges) else 0)

    graph, record_offsets, record_ids = build_deferred(paths, K, W, targets, n_cpu=8)
    nodes = graph.nodes
    n_tar = sum(targets)
    n_neg = len(targets) - n_tar
    frac_tar = nodes['n_tar'] / n_tar
    frac_neg = nodes['n_neg'] / n_neg
    nodes['penalty'] = ((1 - frac_tar) ** 2 + frac_neg ** 2) ** 0.5

    # minimizer-sketch threshold estimation (pipeline/kmers.py:209-226)
    s_tar = np.sum(nodes['n_tar'])
    e_absence_tar = 1 - np.sum(frac_tar * nodes['n_tar']) / s_tar
    e_presence_neg = np.sum(frac_neg * nodes['n_tar']) / s_tar
    p_th = min(0.5 * (e_absence_tar * e_presence_neg) ** 0.5, 0.2)
    edge_weight_th = 0.3 * (1 - p_th) * n_tar

    edges = graph.filter_edges(edge_weight_th)
    keep_hashes = nodes['hash'][nodes['penalty'] <= p_th]
    keep, out_nodes, total = kept_node_layout(nodes, keep_hashes)
    kmers = graph.compact_kmers(keep, total)
    # force materialization of every host-bound byte before stopping the clock
    stats = (graph.n_kmers, len(nodes), graph.n_edges, len(edges), len(kmers),
             int(edges['weight'][:1].sum()) if len(edges) else 0,
             int(kmers['pos'][:1].sum()) if len(kmers) else 0)
    graph.release()
    return stats


def bench_scale(label: str, n_genomes: int, genome_len: int) -> dict:
    res = _scales.setdefault(label, {'status': 'datagen'})
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        t0 = time.time()
        paths, targets = synth_dataset(tmp, n_genomes, genome_len)
        gen = time.time() - t0
        res['datagen_s'] = round(gen, 1)

        res['status'] = 'warmup'
        t0 = time.time()
        stats = one_build(paths, targets)
        warm = time.time() - t0
        res['warmup_s'] = round(warm, 1)
        global DEADLINE
        DEADLINE = max(DEADLINE, time.time() + POST_WARMUP_FLOOR_S)
        print(f'# [{label}] warmup {warm:.1f}s (datagen {gen:.1f}s, '
              f'{remaining():.0f}s left)', file=sys.stderr, flush=True)

        res['status'] = 'sampling'
        times = []
        n_target = N_SAMPLES
        for i in range(N_SAMPLES):
            if i >= n_target:
                break
            # leave room for the sample itself (est. = slowest so far)
            est = max(times) * 1.1 if times else warm * 0.5
            if len(times) >= 3 and remaining() < est:
                print(f'# [{label}] budget stop after {len(times)} samples',
                      file=sys.stderr, flush=True)
                break
            t0 = time.time()
            stats = one_build(paths, targets)
            dt = time.time() - t0
            times.append(dt)
            _update(res, stats, times)
            emit()  # incremental: a hard kill mid-scale keeps every sample
            if dt > 45 and n_target > 3:
                n_target = 3  # slow relay window: 3 samples is enough signal
        print(
            f'# [{label}] {stats[0]} minimizers, {stats[1]} nodes, {stats[2]} '
            f'edges ({stats[3]} kept, {stats[4]} kmers kept); builds '
            f'{sorted(round(t, 2) for t in times)}; {n_genomes} genomes x '
            f'{genome_len} bp, k={K}, w={W}', file=sys.stderr, flush=True)

        # materialized samples (round-2 / reference-comparable timing): the
        # FIRST call compiles the direct-path pack programs (remote, window-
        # dependent cost) -- run two and report the warm one (both recorded)
        if times and remaining() > max(times) * 3 + 90:
            res['status'] = 'materialize'
            mats = []
            for _ in range(2):
                t0 = time.time()
                stats = one_build(paths, targets, materialize=True)
                mats.append(time.time() - t0)
                if remaining() < mats[-1] * 1.5:
                    break
            n_min = stats[0]
            mat = min(mats)
            res['materialize_s'] = round(mat, 3)
            res['materialize_samples_s'] = [round(t, 3) for t in mats]
            ratio = round(n_min / mat / BASELINE_MIN_PER_S, 3)
            # the min of the <=2 samples IS the warm one (sample 1 pays any
            # remote pack compiles); keep the legacy key as an alias for
            # round-over-round parsers
            res['vs_baseline_materialized_warm'] = ratio
            res['vs_baseline_materialized_median'] = ratio
            emit()
            print(f'# [{label}] materialized builds '
                  f'{[round(t, 2) for t in mats]}', file=sys.stderr, flush=True)
    res['status'] = 'done'
    return res


def _update(res: dict, stats, times) -> None:
    n_min = stats[0]
    t_min, t_med = min(times), float(np.median(times))
    res.update(
        n_minimizers=n_min,
        min_per_s_median=round(n_min / t_med, 1),
        min_per_s_min=round(n_min / t_min, 1),
        vs_baseline_median=round(n_min / t_med / BASELINE_MIN_PER_S, 3),
        vs_baseline_min=round(n_min / t_min / BASELINE_MIN_PER_S, 3),
        samples_s=[round(t, 3) for t in times],
    )


class _Timeout(Exception):
    pass


def _sig(signum, frame):
    raise _Timeout(signal.Signals(signum).name)


def main() -> None:
    if os.environ.get('BENCH_DEBUG'):
        import logging

        logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)
        logging.getLogger('jax').setLevel(logging.WARNING)
    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)
    # Dead-relay guard: axon backend init can hang forever inside the PJRT
    # client constructor (observed 2026-08-18: make_c_api_client blocked
    # >1 h). Probe it in a SUBPROCESS with a hard timeout so a dead relay
    # costs 2 min and a clear message instead of the driver's whole budget.
    cpu_forced = (os.environ.get('SEQWIN_TPU_PLATFORM') == 'cpu'
                  or os.environ.get('JAX_PLATFORMS') == 'cpu')
    if not cpu_forced:
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                capture_output=True, timeout=120, env=dict(os.environ),
            )
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print('# FATAL: TPU backend probe hung or failed (relay down?); '
                  'no benchmark possible', file=sys.stderr, flush=True)
            sys.exit(1)
    import seqwin_tpu  # noqa: F401  (x64 on)

    # the package's basicConfig logs to stdout (CLI behavior mirrors the
    # reference); bench stdout must stay PURE JSON -- the axon backend's
    # first device use emits a WARNING through the root logger (observed
    # corrupting bench_r5a.json) -- so move root handlers to stderr
    import logging

    for h in logging.getLogger().handlers:
        if getattr(h, 'stream', None) is sys.stdout:
            h.setStream(sys.stderr)

    try:
        for i, (label, n_genomes, genome_len) in enumerate(SCALES):
            if i > 0:
                # warmup estimate for the next (smaller) scale: its remote
                # compiles are mostly shared with the headline scale's
                # (~20 s observed, benchmarks/r4/bench_r4b.json) -- budget
                # 120 s for warmup+datagen plus samples scaled by workload
                # ratio from the headline scale's slowest build
                first = _scales[SCALES[0][0]]
                ratio = (n_genomes * genome_len) / (SCALES[0][1] * SCALES[0][2])
                need = 120 + 6.2 * ratio * max(first.get('samples_s', [30]))
                if remaining() < need:
                    print(f'# skipping {label}: {remaining():.0f}s left < '
                          f'{need:.0f}s estimated', file=sys.stderr, flush=True)
                    _scales[label] = {'status': 'skipped_budget'}
                    continue
            bench_scale(label, n_genomes, genome_len)
            emit()
    except _Timeout as e:
        print(f'# stopped by {e}', file=sys.stderr, flush=True)
    finally:
        emit()


if __name__ == '__main__':
    main()
