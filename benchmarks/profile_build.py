"""Per-phase wall-time breakdown of graph.build on the current backend."""
import time
from pathlib import Path

import numpy as np

import seqwin_tpu  # noqa: F401

from seqwin_tpu.engine.aggregate import aggregate_device
from seqwin_tpu.engine.hybrid import scan_chunk_device
from seqwin_tpu.graph.build import build
from seqwin_tpu.io.fasta import parse_fasta_codes

N_GENOMES = 24
GENOME_LEN = 2_000_000
K, W = 21, 200


def synth(tmp: Path):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=GENOME_LEN).astype(np.uint8)
    alphabet = np.frombuffer(b'ACGT', dtype=np.uint8)
    paths, targets = [], []
    for i in range(N_GENOMES):
        g = base.copy()
        idx = rng.integers(0, GENOME_LEN, size=GENOME_LEN // 200)
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        p = tmp / f'g{i}.fasta'
        with open(p, 'w') as f:
            f.write(f'>g{i}\n')
            seq = alphabet[g].tobytes().decode()
            for off in range(0, len(seq), 80):
                f.write(seq[off:off + 80] + '\n')
        paths.append(p)
        targets.append(i < N_GENOMES // 2)
    return paths, targets


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        t0 = time.time()
        paths, targets = synth(tmp)
        print(f'synth: {time.time()-t0:.2f}s', flush=True)
        t0 = time.time()
        parsed = [parse_fasta_codes(p) for p in paths]
        print(f'parse: {time.time()-t0:.2f}s', flush=True)

        # chunked like build(): 2^25 budget
        chunks = []
        cur, cur_b, base_rec = [], 0, 0
        for ids, codes_list in parsed:
            for c in codes_list:
                if cur_b + len(c) > (1 << 25) and cur:
                    chunks.append((cur, base_rec))
                    base_rec += len(cur)
                    cur, cur_b = [], 0
                cur.append(c)
                cur_b += len(c)
        if cur:
            chunks.append((cur, base_rec))

        offsets = np.arange(N_GENOMES + 1, dtype=np.uintp)
        tmask = np.arange(N_GENOMES) < N_GENOMES // 2

        for label in ('warmup', 'steady', 'steady2'):
            t_scan = 0.0
            results = []
            for recs, rb in chunks:
                t0 = time.time()
                results.append(scan_chunk_device(recs, K, W, rb))
                t_scan += time.time() - t0
            t0 = time.time()
            kmers, nodes, edges = aggregate_device(results, offsets, tmask)
            t_agg = time.time() - t0
            print(f'[{label}] scan={t_scan:.2f} aggregate={t_agg:.2f} '
                  f'({len(kmers)} kmers, {len(nodes)} nodes, {len(edges)} edges)', flush=True)

        t0 = time.time()
        out = build(paths, K, W, targets, n_cpu=4)
        dt = time.time() - t0
        print(f'build() end-to-end steady: {dt:.2f}s -> {len(out[0])/dt:,.0f} minimizers/s '
              f'({(N_GENOMES*GENOME_LEN)/dt/1e6:.1f} Mbase/s)', flush=True)


if __name__ == '__main__':
    main()
