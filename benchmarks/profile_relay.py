"""Relay latency/bandwidth probe + aggregate_device sub-stage timing."""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from seqwin_tpu.engine.aggregate import _merge_edges, _merge_nodes, aggregate_device

i32 = jnp.int32


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # --- d2h round-trip latency vs size ---
    for size in (8, 1 << 12, 1 << 16, 1 << 20, 1 << 22, 1 << 24):
        x = jnp.asarray(np.zeros(size, np.uint8))
        np.asarray(x[:8])
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            np.asarray(x)
        dt = (time.time() - t0) / reps
        print(f'd2h {size:>9} B: {dt*1e3:8.1f} ms  ({size/dt/1e6:8.1f} MB/s)', flush=True)

    # --- h2d ---
    for size in (1 << 20, 1 << 23):
        h = np.zeros(size, np.uint8)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            y = jnp.asarray(h) + jnp.uint8(0)
            np.asarray(y[:8])
        dt = (time.time() - t0) / reps
        print(f'h2d {size:>9} B: {dt*1e3:8.1f} ms  ({size/dt/1e6:8.1f} MB/s)', flush=True)

    # --- aggregate_device sub-stages at bench-chunk scale ---
    emit_cap = 1 << 19
    n_chunks = 6
    m_per = 318_000
    chunks = []
    for c in range(n_chunks):
        oh = np.zeros(emit_cap, np.uint64)
        pos = np.zeros(emit_cap, np.uint32)
        rec = np.full(emit_cap, -1, np.int32)
        asm = np.zeros(emit_cap, np.int32)
        oh[:m_per] = rng.integers(0, 1 << 62, size=m_per, dtype=np.int64).astype(np.uint64)
        # heavy duplication like real minimizer streams
        oh[:m_per] >>= np.uint64(14)
        pos[:m_per] = rng.integers(0, 2_000_000, size=m_per)
        rec[:m_per] = rng.integers(0, 16, size=m_per)
        asm[:m_per] = rec[:m_per]
        chunks.append(tuple(jnp.asarray(v) for v in (oh, pos, rec, asm)))
    offsets = np.arange(17, dtype=np.uintp)
    tmask = np.arange(16) < 8

    full = [(c[0], c[1], c[2], m_per, c[3]) for c in chunks]
    for label in ('warmup', 'steady', 'steady2'):
        t0 = time.time()
        kmers, nodes, edges = aggregate_device(full, offsets, tmask)
        print(f'aggregate_device [{label}]: {time.time()-t0:.3f}s '
              f'({len(kmers)} kmers {len(nodes)} nodes {len(edges)} edges)', flush=True)

    # now the stages: concat + merges with sync, then transfers
    t0 = time.time()
    oh = jnp.concatenate([c[0] for c in chunks])
    pos = jnp.concatenate([c[1] for c in chunks])
    rec = jnp.concatenate([c[2] for c in chunks])
    asm = jnp.concatenate([c[3] for c in chunks])
    np.asarray(oh[:8])
    print(f'concat: {time.time()-t0:.3f}s', flush=True)

    m = n_chunks * m_per
    tmask_j = jnp.asarray(tmask)
    node_cap = 1 << 20
    for label in ('warmup', 'steady'):
        t0 = time.time()
        out = _merge_nodes(oh, pos, rec, asm, tmask_j, i32(m), node_cap)
        np.asarray(out[0][:8])
        print(f'_merge_nodes [{label}]: {time.time()-t0:.3f}s', flush=True)
    xu = jnp.zeros(0, jnp.uint64)
    xa = jnp.zeros(0, i32)
    for label in ('warmup', 'steady'):
        t0 = time.time()
        eout = _merge_edges(oh, rec, asm, 1 << 20, xu, xu, xa, i32(0))
        np.asarray(eout[0][:8])
        print(f'_merge_edges [{label}]: {time.time()-t0:.3f}s', flush=True)

    n_nodes = int(out[7])
    t0 = time.time()
    cols = [np.asarray(out[0][:m]), np.asarray(out[1][:m])]
    print(f'kmers d2h 2x{m}: {time.time()-t0:.3f}s', flush=True)
    t0 = time.time()
    ncols = [np.asarray(out[i][:n_nodes]) for i in range(2, 7)]
    print(f'node d2h 5x{n_nodes}: {time.time()-t0:.3f}s', flush=True)
    n_edges = int(eout[3])
    t0 = time.time()
    ecols = [np.asarray(eout[i][:n_edges]) for i in range(3)]
    print(f'edge d2h 3x{n_edges}: {time.time()-t0:.3f}s', flush=True)


if __name__ == '__main__':
    main()
