#!/usr/bin/env python3
"""Chunk-size / fused-path A/B on the chip (VERDICT r4 #3, PERF r5 trace).

The 800M trace put steady per-chunk drain at ~0.19 s vs ~0.14 s measured
pure compute -- ~0.05 s/chunk of dispatch/sync overhead, i.e. ~1.2 s over
25 chunks. Doubling the chunk halves that; the fused one-program build
removes it entirely for small scales. This measures, warm, per variant:

    800M: chunk 1<<25 (control) vs 1<<26
    192M: chunk 1<<25 (control) vs 1<<26 vs fused(1<<25)

Each variant pays its own remote-compile warmup build first.

Run (ONE TPU process at a time!):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/chunk_ab.py
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

K, W = 21, 200
BASELINE_MIN_PER_S = 8_350_000 / 6.55  # reference: 8.35 M minimizers / 6.55 s


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location('bench_mod', REPO / 'bench.py')
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import seqwin_tpu  # noqa: F401
    from seqwin_tpu.graph.build import build_deferred

    out = {}
    reps = 3
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)

        def mk(p):
            p.mkdir(parents=True, exist_ok=True)
            return p

        scales = {
            '800M': bench.synth_dataset(mk(tmp / 'a'), 170, 4_700_000),
            '192M': bench.synth_dataset(mk(tmp / 'b'), 64, 3_000_000),
        }
        variants = [
            ('800M', 'chunk25', {'SEQWIN_TPU_CHUNK_BASES': str(1 << 25)}),
            ('800M', 'chunk26', {'SEQWIN_TPU_CHUNK_BASES': str(1 << 26)}),
            ('192M', 'chunk25', {'SEQWIN_TPU_CHUNK_BASES': str(1 << 25)}),
            ('192M', 'chunk26', {'SEQWIN_TPU_CHUNK_BASES': str(1 << 26)}),
            ('192M', 'fused25', {'SEQWIN_TPU_CHUNK_BASES': str(1 << 25),
                                 'SEQWIN_TPU_FUSED': '1'}),
        ]

        def run_variant(scale, env):
            paths, targets = scales[scale]
            for k, v in env.items():
                os.environ[k] = v
            try:
                t0 = time.monotonic()
                g, *_ = build_deferred(paths, K, W, targets, n_cpu=8)
                n_min = g.n_kmers
                g.release()
                return round(time.monotonic() - t0, 3), n_min
            finally:
                for k in env:
                    os.environ.pop(k, None)

        # warm every variant's compiled shapes first, then interleave the
        # timed samples round-robin so relay-window drift hits all variants
        # equally (the window can halve bandwidth within an hour, PERF.md)
        for scale, name, env in variants:
            warm, n_min = run_variant(scale, env)
            out[f'{scale}_{name}'] = {'warmup_s': warm, 'samples_s': [],
                                      'n_minimizers': n_min}
            log(f'# warm {scale} {name}: {warm:.1f}s')
        for rep in range(reps):
            for scale, name, env in variants:
                t, _ = run_variant(scale, env)
                out[f'{scale}_{name}']['samples_s'].append(t)
                log(f'# rep{rep} {scale} {name}: {t:.3f}s')
        for scale, name, _ in variants:
            rec = out[f'{scale}_{name}']
            rec['vs_baseline_min'] = round(
                rec['n_minimizers'] / min(rec['samples_s']) / BASELINE_MIN_PER_S, 3)
            log(f'# {scale} {name}: samples {rec["samples_s"]}, '
                f'vs_baseline(min) {rec["vs_baseline_min"]}')

    outp = REPO / 'benchmarks' / 'r5' / 'chunk_ab.json'
    outp.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    log(f'# written {outp}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
