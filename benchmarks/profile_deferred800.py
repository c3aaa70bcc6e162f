"""Split the 800 Mbp bench timed region into its legs on the real chip.

bench.py's timed sample = build_deferred (chunk pipeline + node merge +
nodes d2h) + host threshold math + filter_edges + kept-kmer compaction.
This prints per-leg wall times so round-5 knows whether the remaining gap
to the good-window ceiling lives in the chunk pipeline or the tail.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_deferred800.py
(ONE TPU process at a time.)
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import seqwin_tpu  # noqa: F401
import jax

import bench
from seqwin_tpu.graph.build import build_deferred, kept_node_layout

N_GENOMES, GENOME_LEN = 170, 4_700_000
K, W = bench.K, bench.W


def one(paths, targets, label):
    t0 = time.time()
    graph, record_offsets, record_ids = build_deferred(
        paths, K, W, targets, n_cpu=8)
    nodes = graph.nodes
    t1 = time.time()

    n_tar = sum(targets)
    n_neg = len(targets) - n_tar
    frac_tar = nodes['n_tar'] / n_tar
    frac_neg = nodes['n_neg'] / n_neg
    nodes['penalty'] = ((1 - frac_tar) ** 2 + frac_neg ** 2) ** 0.5
    s_tar = np.sum(nodes['n_tar'])
    e_absence_tar = 1 - np.sum(frac_tar * nodes['n_tar']) / s_tar
    e_presence_neg = np.sum(frac_neg * nodes['n_tar']) / s_tar
    p_th = min(0.5 * (e_absence_tar * e_presence_neg) ** 0.5, 0.2)
    edge_weight_th = 0.3 * (1 - p_th) * n_tar
    t2 = time.time()

    edges = graph.filter_edges(edge_weight_th)
    _ = int(edges['weight'][:1].sum()) if len(edges) else 0
    t3 = time.time()

    keep_hashes = nodes['hash'][nodes['penalty'] <= p_th]
    keep, out_nodes, total = kept_node_layout(nodes, keep_hashes)
    kmers = graph.compact_kmers(keep, total)
    _ = int(kmers['pos'][:1].sum()) if len(kmers) else 0
    t4 = time.time()
    graph.release()
    print(f'[{label}] build_deferred+nodes={t1-t0:.2f} host_math={t2-t1:.3f} '
          f'filter_edges={t3-t2:.3f} compact_kmers={t4-t3:.3f} '
          f'total={t4-t0:.2f} ({len(nodes)} nodes, {len(edges)} edges kept)',
          flush=True)


def main():
    print('devices:', jax.devices(), flush=True)
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        paths, targets = bench.synth_dataset(Path(td), N_GENOMES, GENOME_LEN)
        print(f'datagen {time.time()-t0:.1f}s', flush=True)
        for rep in range(3):
            one(paths, targets, ['warmup', 'steady', 'steady2'][rep])


if __name__ == '__main__':
    main()
