"""Stage timings with forced materialization (the relay's block_until_ready
returns early, so every measurement fetches a slice of the result)."""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

N = 1 << 24
K, W = 21, 200
EMIT_CAP = 1 << 19
i64 = jnp.int64


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    for x in leaves:
        np.asarray(x.reshape(-1)[:8])


def timed(name, fn, *args, reps=2):
    sync(fn(*args))  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.time() - t0) / reps
    print(f'{name:32s} {dt*1e3:9.1f} ms  {N/dt/1e6:8.1f} Mbase/s', flush=True)


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    codes = jax.device_put(rng.integers(0, 4, size=N).astype(np.uint8))
    h64 = jax.device_put(rng.integers(0, 1 << 62, size=N).astype(np.uint64))
    sync((codes, h64))

    from seqwin_tpu.engine import minimizer as M

    @jax.jit
    def hashes(codes):
        n = codes.shape[0]
        iota = jnp.arange(n, dtype=i64)
        im33 = (iota % 33).astype(jnp.int32)
        im31 = (iota % 31).astype(jnp.int32)
        neg33 = (33 - im33) % 33
        neg31 = (31 - im31) % 31
        a = M._srol_parts(M._select_seed(codes, M.SEEDS), neg33, neg31)
        b = M._srol_parts(M._select_seed(codes, M.SEEDS_COMP), im33, im31)
        wf = M._window_xor(a, K)
        wr = M._window_xor(b, K)
        fwd = M._srol_parts(wf, ((im33 + K - 1) % 33), ((im31 + K - 1) % 31))
        rev = M._srol_parts(wr, neg33, neg31)
        return fwd + rev

    @jax.jit
    def cumsum_i64(codes):
        return jnp.cumsum((codes > 3).astype(i64))

    @jax.jit
    def cummax_i64(h):
        return jax.lax.cummax(h.astype(i64))

    @jax.jit
    def scatter_u64(h):
        valid = h > jnp.uint64(1 << 61)
        vpos = jnp.cumsum(valid.astype(i64)) - 1
        tgt = jnp.where(valid, vpos, i64(N))
        return jnp.zeros((N,), dtype=jnp.uint64).at[tgt].set(h, mode='drop')

    @jax.jit
    def sort_compact(codes, h):
        invalid = (codes > 2).astype(jnp.uint8)
        pos = jnp.arange(N, dtype=jnp.uint32)
        rec = jnp.zeros(N, dtype=jnp.int32)
        return jax.lax.sort((invalid, pos, h, rec), num_keys=1, is_stable=True)

    @jax.jit
    def gather_monotone(h):
        idx = jnp.minimum(jnp.arange(N, dtype=jnp.int32) * 2, N - 1)
        return h[idx]

    @jax.jit
    def topk_big(h):
        z = h.astype(i64)
        return jax.lax.top_k(z, EMIT_CAP)

    @jax.jit
    def winmin_scans(h):
        mh = h
        idx = jnp.arange(N, dtype=i64)
        rows = N // W + (1 if N % W else 0)
        pad = rows * W - N
        if pad:
            mh = jnp.concatenate([mh, jnp.full((pad,), jnp.uint64((1 << 64) - 1))])
            idx = jnp.concatenate([idx, jnp.full((pad,), i64(-1))])
        pm, pi = mh.reshape(rows, W), idx.reshape(rows, W)
        sm, si = pm, pi
        s = 1
        while s < W:
            lm = jnp.concatenate([jnp.full((rows, s), jnp.uint64((1 << 64) - 1)), pm[:, :-s]], axis=1)
            li = jnp.concatenate([jnp.full((rows, s), i64(-1)), pi[:, :-s]], axis=1)
            pm, pi = M._combine_rmin(lm, li, pm, pi)
            rm = jnp.concatenate([sm[:, s:], jnp.full((rows, s), jnp.uint64((1 << 64) - 1))], axis=1)
            ri = jnp.concatenate([si[:, s:], jnp.full((rows, s), i64(-1))], axis=1)
            sm, si = M._combine_rmin(sm, si, rm, ri)
            s <<= 1
        return pi

    def full(codes):
        is_start = jnp.zeros((N,), dtype=bool).at[0].set(True)
        return M.scan_minimizers(codes, is_start, K, W, EMIT_CAP)

    timed('hashes(elementwise+winxor)', hashes, codes)
    timed('cumsum i64', cumsum_i64, codes)
    timed('cummax i64', cummax_i64, h64)
    timed('scatter compact u64', scatter_u64, h64)
    timed('sort compact u8+u32+u64+i32', sort_compact, codes, h64)
    timed('gather monotone u64', gather_monotone, h64)
    timed('top_k 2^19 of 2^24', topk_big, h64)
    timed('winmin two-block scans', winmin_scans, h64)
    timed('FULL scan', full, codes, reps=1)


if __name__ == '__main__':
    main()
