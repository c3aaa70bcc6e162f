"""Per-phase wall-time breakdown of graph.build on the current backend."""
import time
from pathlib import Path

import numpy as np

import seqwin_tpu  # noqa: F401
import jax.numpy as jnp

from seqwin_tpu.engine import hybrid
from seqwin_tpu.engine.aggregate import aggregate
from seqwin_tpu.engine.minimizer import next_pow2
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


def run_once(parsed, label):
    t_layout = t_irr = t_p1 = t_p2 = t_host_map = 0.0
    all_oh, all_pos, all_rec = [], [], []
    rec_global = 0
    # one chunk per 2^25 bases
    chunks = []
    cur, cur_b, cur_base = [], 0, 0
    for ids, codes_list in parsed:
        for c in codes_list:
            if cur_b + len(c) > (1 << 25) and cur:
                chunks.append((cur, cur_base))
                cur_base += len(cur)
                cur, cur_b = [], 0
            cur.append(c)
            cur_b += len(c)
    if cur:
        chunks.append((cur, cur_base))

    for recs, rec_base in chunks:
        total = sum(len(c) for c in recs)
        n = next_pow2(total)
        t0 = time.time()
        codes, starts = hybrid._host_layout(recs, n)
        t_layout += time.time() - t0
        t0 = time.time()
        irr_pos, members = hybrid._host_irregular(codes, starts, K, W, n)
        patch_z = hybrid._host_patch_z(codes, members, K)
        t_irr += time.time() - t0

        scap = max(64, next_pow2(len(starts)))
        starts_a = np.full(scap, n, dtype=np.int32)
        starts_a[:len(starts)] = starts
        t0 = time.time()
        z_clean, canon = hybrid.scan_phase1(jnp.asarray(codes), jnp.asarray(starts_a), K, W)
        np.asarray(z_clean[:8])
        t_p1 += time.time() - t0

        pcap = max(256, next_pow2(len(irr_pos) or 1))
        ppos = np.full(pcap, n, np.int32)
        pz = np.full(pcap, -1, np.int32)
        ppos[:len(irr_pos)] = irr_pos
        pz[:len(irr_pos)] = patch_z
        emit_cap = max(1 << 12, next_pow2(int(2.5 * total / (W + 1)) + 64))
        t0 = time.time()
        eidx, e_canon, count = hybrid.scan_phase2(z_clean, canon, jnp.asarray(ppos), jnp.asarray(pz), emit_cap)
        count = int(count)
        eidx_h = np.asarray(eidx[:count]).astype(np.int64)
        ecan_h = np.asarray(e_canon[:count])
        t_p2 += time.time() - t0

        t0 = time.time()
        rec = (np.searchsorted(starts, eidx_h, side='right') - 1).astype(np.int32)
        pos = (eidx_h - starts[rec]).astype(np.uint32)
        from seqwin_tpu.ops.hashing import MULTISHIFT, out_hash_mult
        t = ecan_h * np.uint64(out_hash_mult(K))
        oh = t ^ (t >> np.uint64(MULTISHIFT))
        all_oh.append(oh)
        all_pos.append(pos)
        all_rec.append(rec + rec_base)
        t_host_map += time.time() - t0
        rec_global += len(recs)

    oh = np.concatenate(all_oh)
    pos = np.concatenate(all_pos)
    rec = np.concatenate(all_rec).astype(np.int32)
    t0 = time.time()
    offsets = np.arange(N_GENOMES + 1, dtype=np.uintp)  # 1 record per genome
    asm = (np.searchsorted(offsets, rec, side='right') - 1).astype(np.int32)
    targets = np.arange(N_GENOMES) < N_GENOMES // 2
    kmers, nodes, edges = aggregate(oh, pos, rec, asm, targets)
    t_agg = time.time() - t0
    print(f'[{label}] layout={t_layout:.2f} irregular={t_irr:.2f} phase1={t_p1:.2f} '
          f'phase2={t_p2:.2f} hostmap={t_host_map:.2f} aggregate={t_agg:.2f} '
          f'({len(kmers)} kmers, {len(nodes)} nodes, {len(edges)} edges)', flush=True)


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
        run_once(parsed, 'warmup')
        run_once(parsed, 'steady')
        run_once(parsed, 'steady2')


if __name__ == '__main__':
    main()
