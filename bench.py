"""Benchmark: end-to-end minimizer graph build throughput on one chip.

Prints ONE JSON line. Headline: minimizers/s at the REFERENCE scale
(~800 Mbp: 170 genomes x 4.7 Mbp, the 171-Salmonella-class workload the
baseline was measured on), median of N samples; `value_min` and the
192 Mbp secondary scale ride in the same JSON (`scales`), with every raw
sample, so both the typical-case and lower-bound numbers are recorded
(relay transfer bandwidth swings several-fold between builds -- PERF.md).

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
(reference run: 61,907 of 7.94 M kept), so shipping them -- as the
reference's own build does -- is not part of the work a user waits for.
Subgraph search / marker extraction are excluded on both sides (the
reference's 6.55 s build metric excludes them too).
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_MIN_PER_S = 8_346_500 / 6.55  # reference: 4-thread CPU build

K = 21
W = 200
N_SAMPLES = int(os.environ.get('BENCH_SAMPLES', '5'))

# (label, n_genomes, genome_len): reference scale first (headline), then the
# fast 192 Mbp scale used for round-over-round comparisons.
SCALES = [
    ('800M', 170, 4_700_000),
    ('192M', 64, 3_000_000),
]
if os.environ.get('BENCH_GENOMES') or os.environ.get('BENCH_GENOME_LEN'):
    SCALES = [(
        'custom',
        int(os.environ.get('BENCH_GENOMES', '64')),
        int(os.environ.get('BENCH_GENOME_LEN', '3000000')),
    )]


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


def one_build(paths, targets):
    """One timed sample: deferred build + the pipeline's device consumption
    (threshold math on host f64, edge filter, kept-kmer compaction)."""
    from seqwin_tpu.graph.build import build_deferred, kept_node_layout

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
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        t0 = time.time()
        paths, targets = synth_dataset(tmp, n_genomes, genome_len)
        gen = time.time() - t0

        t0 = time.time()
        stats = one_build(paths, targets)
        warm = time.time() - t0

        times = []
        for _ in range(N_SAMPLES):
            t0 = time.time()
            stats = one_build(paths, targets)
            times.append(time.time() - t0)

    n_min = stats[0]
    t_min, t_med = min(times), float(np.median(times))
    print(
        f'# [{label}] {n_min} minimizers, {stats[1]} nodes, {stats[2]} edges '
        f'({stats[3]} kept, {stats[4]} kmers kept); builds {sorted(round(t, 2) for t in times)} '
        f'(warmup {warm:.1f}s, datagen {gen:.1f}s); '
        f'{n_genomes} genomes x {genome_len} bp, k={K}, w={W}',
        file=sys.stderr, flush=True,
    )
    return {
        'n_minimizers': n_min,
        'min_per_s_median': round(n_min / t_med, 1),
        'min_per_s_min': round(n_min / t_min, 1),
        'vs_baseline_median': round(n_min / t_med / BASELINE_MIN_PER_S, 3),
        'vs_baseline_min': round(n_min / t_min / BASELINE_MIN_PER_S, 3),
        'samples_s': [round(t, 3) for t in times],
        'warmup_s': round(warm, 1),
    }


def main() -> None:
    if os.environ.get('BENCH_DEBUG'):
        import logging

        logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)
        logging.getLogger('jax').setLevel(logging.WARNING)
    import seqwin_tpu  # noqa: F401  (x64 on)

    scales = {}
    for label, n_genomes, genome_len in SCALES:
        scales[label] = bench_scale(label, n_genomes, genome_len)

    head = scales[SCALES[0][0]]
    result = {
        'metric': 'graph_build_minimizers_per_s',
        'value': head['min_per_s_median'],
        'unit': 'minimizers/s',
        'vs_baseline': head['vs_baseline_median'],
        'value_min': head['min_per_s_min'],
        'vs_baseline_min': head['vs_baseline_min'],
        'headline_scale': SCALES[0][0],
        'estimator': f'median of {N_SAMPLES} (min also reported)',
        'scales': scales,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
