#!/usr/bin/env python3
"""Pipeline-bubble trace of the deferred chunk build (VERDICT r4 #2).

Measures whether h2d(chunk i+1) + host prep really overlap compute(chunk i)
over the relay, three ways:

1. **Manual pipeline replay** -- dispatch every chunk through the same
   4-worker prep pool the build uses (`scan_chunk_device(defer_sync=True)`),
   then drain the per-chunk device counts IN ORDER with timestamps: the
   inter-chunk drain interval IS the pipeline's steady-state per-chunk cost,
   and the dispatch->first-drain latency shows the fill.
2. **Host event timeline** (`SEQWIN_TPU_TIMELINE=1`,
   `seqwin_tpu/engine/timeline.py`): prep/h2d/dispatch timestamps of the
   REAL `build_deferred`, plus the aggregation marks.
3. **jax.profiler.trace** of one timed build, saved under --out; note the
   axon relay backend exposes no device-side TPU trace, so this captures the
   host dispatch lanes only (kept for completeness).

Run (ONE TPU process at a time!):
    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/profile_trace800.py [--genomes 24] [--out benchmarks/r5]
"""
import argparse
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault('SEQWIN_TPU_TIMELINE', '1')

K, W = 21, 200


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--genomes', type=int, default=24,
                    help='4.7 Mbp genomes; 24 -> ~113 Mbp = 4 chunks')
    ap.add_argument('--genome-len', type=int, default=4_700_000)
    ap.add_argument('--out', type=Path, default=REPO / 'benchmarks' / 'r5')
    ap.add_argument('--skip-jprof', action='store_true')
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    import importlib.util

    spec = importlib.util.spec_from_file_location('bench_mod', REPO / 'bench.py')
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import numpy as np

    import seqwin_tpu  # noqa: F401
    import jax
    from seqwin_tpu.engine import timeline
    from seqwin_tpu.engine.hybrid import scan_chunk_device
    from seqwin_tpu.graph.build import (
        DEFAULT_CHUNK_BASES,
        _group_chunks,
        build_deferred,
    )
    from seqwin_tpu.io.fasta import parse_fasta_codes

    out = {}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        paths, targets = bench.synth_dataset(tmp, args.genomes, args.genome_len)
        parsed = [parse_fasta_codes(p) for p in paths]
        offsets = np.arange(len(paths) + 1, dtype=np.uintp)
        chunk_lists, _ = _group_chunks(parsed, DEFAULT_CHUNK_BASES)
        total_bases = args.genomes * args.genome_len
        bucket = min(DEFAULT_CHUNK_BASES,
                     1 << max(16, (total_bases - 1).bit_length()))
        print(f'# {len(chunk_lists)} chunks of <= {bucket} bases',
              file=sys.stderr, flush=True)

        # --- warmup (remote compiles) ---
        t0 = time.monotonic()
        g, *_ = build_deferred(paths, K, W, targets, n_cpu=8)
        g.release()
        timeline.drain()
        print(f'# warmup {time.monotonic() - t0:.1f}s', file=sys.stderr,
              flush=True)

        # --- 1. manual pipeline replay with per-chunk drain timestamps ---
        for rep in range(2):
            t_start = time.monotonic()
            t_submit, t_drain = [], []
            with ThreadPoolExecutor(max_workers=4) as pool:
                futs = []
                for recs, base in chunk_lists:
                    t_submit.append(time.monotonic() - t_start)
                    futs.append(pool.submit(
                        scan_chunk_device, recs, K, W, base,
                        min_chunk=bucket, defer_sync=True,
                        record_offsets=offsets))
                results = [f.result() for f in futs]
                t_dispatch_done = time.monotonic() - t_start
                for r in results:
                    _ = int(np.asarray(r[3]))  # sync THIS chunk's phase 2
                    t_drain.append(time.monotonic() - t_start)
            events = timeline.drain()  # timestamps are monotonic; t_start-based
            intervals = np.diff([0.0] + t_drain)
            out[f'replay_{rep}'] = {
                'n_chunks': len(chunk_lists),
                'dispatch_done_s': round(t_dispatch_done, 3),
                'drain_s': [round(t, 3) for t in t_drain],
                'drain_intervals_s': [round(float(d), 3) for d in intervals],
                'total_s': round(t_drain[-1], 3),
                'timeline': [(round(t - t_start, 3), ev, at)
                             for t, ev, at in events],
            }
            print(f'# replay {rep}: total {t_drain[-1]:.2f}s, intervals '
                  f'{[round(float(d), 2) for d in intervals]}',
                  file=sys.stderr, flush=True)

        # --- 2. real build_deferred with the host timeline ---
        timeline.drain()
        t0 = time.monotonic()
        g, *_ = build_deferred(paths, K, W, targets, n_cpu=8)
        dt = time.monotonic() - t0
        _ = g.nodes['hash'][:4]
        events = timeline.drain()
        g.release()
        base_t = events[0][0] if events else 0.0
        out['build_deferred'] = {
            'total_s': round(dt, 3),
            'timeline': [(round(t - base_t, 3), ev, at)
                         for t, ev, at in events],
        }
        print(f'# build_deferred {dt:.2f}s', file=sys.stderr, flush=True)

        # --- 3. jax.profiler trace (host lanes only over the relay) ---
        if not args.skip_jprof:
            trace_dir = args.out / 'jax_trace'
            try:
                with jax.profiler.trace(str(trace_dir)):
                    g, *_ = build_deferred(paths, K, W, targets, n_cpu=8)
                    _ = g.nodes['hash'][:4]
                    g.release()
                out['jax_trace_dir'] = str(trace_dir)
            except Exception as e:  # relay backends may refuse
                out['jax_trace_error'] = repr(e)
            timeline.drain()

    path = args.out / 'pipeline_trace.json'
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != 'replay_0'},
                     default=str)[:2000])
    print(f'# written {path}', file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
