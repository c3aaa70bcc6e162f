"""A/B the emission-extraction variants on the real chip, one 32 Mbp chunk.

Times, per variant, the phase-1 kernel + phase-2 extraction as the pipeline
dispatches them (scan_chunk_device with defer_sync), syncing via np.asarray
of an output slice (block_until_ready is a no-op over the axon relay):

  topk -- z kernel + row-cummax + two-level top_k (round-2 default)
  rank -- z kernel + row-cummax + cumsum + searchsorted
  pfx  -- staircase kernel (prefix-max + local ranks in VMEM) + sparse-only
          phase 2 (scan_phase2_pfx)

Judge criterion (VERDICT round 2, next-round #2): phase-2 < 20 ms/chunk,
kernel min/s ~2x. Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/extract_ab.py  (ONE TPU process at a time).
"""
import os
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax

from seqwin_tpu.engine import hybrid

K, W = 21, 200
N_GENOMES = 16
GENOME_LEN = 2_000_000
REPS = 4


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=GENOME_LEN).astype(np.uint8)
    records = []
    for i in range(N_GENOMES):
        g = base.copy()
        idx = rng.integers(0, GENOME_LEN, size=GENOME_LEN // 200)
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        records.append(g)
    total = sum(len(r) for r in records)
    offsets = np.array([0, N_GENOMES], dtype=np.uintp)

    # SEQWIN_AB_ROLL=1 adds the pltpu.roll lane-shift kernel variant to the
    # sweep (2x the configs, each paying its own remote compile)
    rolls = (0, 1) if os.environ.get('SEQWIN_AB_ROLL') == '1' else (0,)
    results = {}
    for roll in rolls:
        for mode in ('topk', 'rank', 'pfx'):
            os.environ['SEQWIN_TPU_EXTRACT'] = mode
            os.environ['SEQWIN_TPU_ROLL'] = str(roll)
            label = mode if roll == 0 else f'{mode}+roll'
            times = []
            count = None
            try:
                for rep in range(REPS):
                    t0 = time.time()
                    e_oh, e_pos, e_rec, cnt, e_asm = hybrid.scan_chunk_device(
                        records, K, W, min_chunk=1 << 25, defer_sync=True,
                        record_offsets=offsets)
                    np.asarray(e_oh[:8])  # force the full chain
                    dt = time.time() - t0
                    count = int(np.asarray(cnt))
                    times.append(dt)
                    print(f'{label} rep{rep}: {dt:.3f}s (count={count})',
                          flush=True)
            finally:
                os.environ.pop('SEQWIN_TPU_EXTRACT', None)
                os.environ.pop('SEQWIN_TPU_ROLL', None)
            warm = times[1:] or times
            results[label] = (min(warm), sorted(warm)[len(warm) // 2], count)

    print()
    base_cnt = None
    for label, (tmin, tmed, cnt) in results.items():
        if base_cnt is None:
            base_cnt = cnt
        eq = 'count==topk' if cnt == base_cnt else f'COUNT MISMATCH ({cnt})'
        print(f'{label}: min {tmin:.3f}s / med {tmed:.3f}s over {total/1e6:.0f} '
              f'Mbp chunk -> {total / tmin / 1e6:.0f} Mpos/s min  [{eq}]')


if __name__ == '__main__':
    main()
