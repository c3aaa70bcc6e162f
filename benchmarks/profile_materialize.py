#!/usr/bin/env python3
"""Materialized-path wire probes (VERDICT r4 #4).

The full-materialization build (`--no-filter` / library `build()`) ships the
whole k-mer stream d2h (~48 MB at 800 Mbp) after the node sort, with nothing
left to overlap -- `vs_baseline_materialized` was 0.44 in bench_r5a (one COLD
sample: the mq-shaped pack program compiled inside the timed region; bench
now warms it). This probe measures, on the real chip:

1. warm direct `build()` wall time (the honest materialized number);
2. d2h strategies for a pack-sized buffer: one blocking fetch, serial slab
   fetches, and 2/4-thread CONCURRENT slab fetches (does the relay pipeline
   parallel streams?);
3. d2h while an unrelated device program chain runs (does transfer overlap
   compute over the relay?);
4. h2d/d2h duplex: concurrent opposite-direction transfers.

Run (ONE TPU process at a time!):
    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/profile_materialize.py [--genomes 170]
"""
import argparse
import json
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

K, W = 21, 200


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--genomes', type=int, default=170)
    ap.add_argument('--genome-len', type=int, default=4_700_000)
    ap.add_argument('--out', type=Path,
                    default=REPO / 'benchmarks' / 'r5' / 'materialize_probe.json')
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location('bench_mod', REPO / 'bench.py')
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import numpy as np

    import seqwin_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from seqwin_tpu.graph.build import build, build_deferred

    out = {}

    # --- wire strategy probes (cheap; before the big builds) ---
    nwords = 12 << 20  # 48 MB of u32 -- the 800M kmer-pack payload size
    n_slabs = 8
    slab = nwords // n_slabs

    @jax.jit
    def make(x):
        return jnp.cumsum(x) + x  # arbitrary; materializes a real buffer

    @jax.jit
    def make_slabs(x):
        return tuple(x[i * slab:(i + 1) * slab] for i in range(n_slabs))

    x0 = jnp.ones(nwords, jnp.uint32)
    x = make(x0)
    np.asarray(x[:8]); [np.asarray(s[:8]) for s in make_slabs(x)]  # warm

    # NB: jax arrays cache their host copy after the first np.asarray --
    # every timed fetch below pulls a FRESH `make` output buffer.
    def timed(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 3))
        return ts

    mb = nwords * 4 / 1e6
    t_whole = timed(lambda: np.asarray(make(x0)))
    log(f'# d2h whole {mb:.0f} MB: {t_whole} -> {mb/min(t_whole):.1f} MB/s')
    t_serial = timed(lambda: [np.asarray(s) for s in make_slabs(x0)])
    log(f'# d2h serial x{n_slabs}: {t_serial} -> {mb/min(t_serial):.1f} MB/s')
    for nw in (2, 4):
        with ThreadPoolExecutor(max_workers=nw) as pool:
            t_conc = timed(
                lambda: list(pool.map(np.asarray, make_slabs(x0))))
        log(f'# d2h {nw}-thread x{n_slabs}: {t_conc} -> {mb/min(t_conc):.1f} MB/s')
        out[f'd2h_conc{nw}_s'] = t_conc
    out.update(d2h_whole_s=t_whole, d2h_serial_s=t_serial, mb=mb)

    # --- d2h while device compute runs ---
    @jax.jit
    def burn(y):
        def body(_, v):
            return jnp.sin(v) * 1.0001 + 0.1
        return jax.lax.fori_loop(0, 60, body, y)

    y0 = jnp.ones((2048, 2048), jnp.float32)
    yb = burn(y0); np.asarray(yb[:1, :8])
    t0 = time.monotonic()
    yb = burn(y0)
    _ = np.asarray(yb[:1, :8])
    t_burn = time.monotonic() - t0
    log(f'# burn alone: {t_burn:.3f}s')
    xfresh = make(x0)
    t0 = time.monotonic()
    yb = burn(y0)
    got = np.asarray(xfresh)  # transfer while burn executes
    t_x = time.monotonic() - t0
    _ = np.asarray(yb[:1, :8])
    t_both = time.monotonic() - t0
    del got
    log(f'# d2h-during-burn: d2h done {t_x:.3f}s, both {t_both:.3f}s '
        f'(serial would be ~{t_burn + min(t_whole):.3f}s)')
    out.update(burn_s=round(t_burn, 3), d2h_during_burn_s=round(t_x, 3),
               both_s=round(t_both, 3))

    # --- h2d/d2h duplex ---
    h = np.ones(nwords, np.uint32)
    put = jax.jit(lambda v: v + jnp.uint32(1))
    w = put(jnp.asarray(h)); np.asarray(w[:8])
    t0 = time.monotonic()
    w = put(jnp.asarray(h)); np.asarray(w[:8])
    t_h2d = time.monotonic() - t0
    log(f'# h2d {mb:.0f} MB alone: {t_h2d:.3f}s -> {mb/t_h2d:.1f} MB/s')
    xfresh2 = make(x0)
    with ThreadPoolExecutor(max_workers=2) as pool:
        t0 = time.monotonic()
        fu = pool.submit(lambda: (np.asarray(put(jnp.asarray(h))[:8]),))
        fd = pool.submit(lambda: np.asarray(xfresh2))
        fu.result(); fd.result()
        t_duplex = time.monotonic() - t0
    log(f'# duplex h2d+d2h: {t_duplex:.3f}s (serial ~{t_h2d + min(t_whole):.3f}s)')
    out.update(h2d_s=round(t_h2d, 3), duplex_s=round(t_duplex, 3))

    # --- warm direct build() + deferred baseline ---
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        paths, targets = bench.synth_dataset(tmp, args.genomes, args.genome_len)
        t0 = time.monotonic()
        g, *_ = build_deferred(paths, K, W, targets, n_cpu=8)
        g.release()
        log(f'# deferred warmup {time.monotonic() - t0:.1f}s')
        t0 = time.monotonic()
        g, *_ = build_deferred(paths, K, W, targets, n_cpu=8)
        t_def = time.monotonic() - t0
        g.release()
        log(f'# deferred warm: {t_def:.2f}s')
        ts_mat = []
        for rep in range(3):
            t0 = time.monotonic()
            kmers, nodes, edges, offs, _ = build(paths, K, W, targets, n_cpu=8)
            ts_mat.append(round(time.monotonic() - t0, 2))
            log(f'# direct build rep{rep}: {ts_mat[-1]:.2f}s '
                f'({len(kmers)} kmers, {len(nodes)} nodes, {len(edges)} edges)')
            del kmers, nodes, edges
        out.update(deferred_s=round(t_def, 2), direct_build_s=ts_mat,
                   vs_baseline_materialized=round(6.55 / min(ts_mat), 3))

    args.out.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    log(f'# written {args.out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
