"""Stage-level profiling of the scan pipeline on the current JAX backend."""
import time

import numpy as np

import seqwin_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from seqwin_tpu.engine import minimizer as M

N = 1 << 24
K, W = 21, 200
EMIT_CAP = 1 << 19


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f'{name:28s} {dt*1e3:9.1f} ms  {N/dt/1e6:9.1f} Mbase/s')
    return out


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 4, size=N).astype(np.uint8)
    is_start_h = np.zeros(N, dtype=bool)
    is_start_h[0] = True

    t0 = time.time()
    codes = jax.device_put(codes_h)
    is_start = jax.device_put(is_start_h)
    jax.block_until_ready((codes, is_start))
    print(f'h2d {N/1e6:.0f}MB+{N/1e6:.0f}MB: {time.time()-t0:.2f}s')

    i64 = jnp.int64

    @jax.jit
    def stage_seeds(codes):
        n = codes.shape[0]
        iota = jnp.arange(n, dtype=i64)
        im33 = (iota % 33).astype(jnp.int32)
        im31 = (iota % 31).astype(jnp.int32)
        neg33 = (33 - im33) % 33
        neg31 = (31 - im31) % 31
        a = M._srol_parts(M._select_seed(codes, M.SEEDS), neg33, neg31)
        b = M._srol_parts(M._select_seed(codes, M.SEEDS_COMP), im33, im31)
        return a ^ b

    @jax.jit
    def stage_hashes(codes):
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
        f33 = ((im33 + (K - 1)) % 33).astype(jnp.int32)
        f31 = ((im31 + (K - 1)) % 31).astype(jnp.int32)
        fwd = M._srol_parts(wf, f33, f31)
        rev = M._srol_parts(wr, neg33, neg31)
        canon = fwd + rev
        t = canon * jnp.uint64(1 ^ ((K * 0x90B45D39FB6DA1FA) & ((1 << 64) - 1)))
        return canon ^ (t ^ (t >> jnp.uint64(27)))

    @jax.jit
    def stage_cumsum(codes):
        return jnp.cumsum((codes > 3).astype(i64))

    @jax.jit
    def stage_cummax(codes):
        return jax.lax.cummax(codes.astype(i64))

    @jax.jit
    def stage_scatter(codes):
        n = codes.shape[0]
        valid = codes <= 3
        vpos = jnp.cumsum(valid.astype(i64)) - 1
        tgt = jnp.where(valid, vpos, i64(n))
        x = codes.astype(jnp.uint32)
        out = jnp.zeros((n,), dtype=jnp.uint32).at[tgt].set(x, mode='drop')
        return out

    @jax.jit
    def stage_sort_compact(codes):
        invalid = (codes > 3).astype(jnp.uint8)
        x = codes.astype(jnp.uint32)
        return jax.lax.sort((invalid, x), num_keys=1, is_stable=True)

    @jax.jit
    def stage_winmin(codes):
        # two-block rightmost-argmin over W on a u64 stream
        n = codes.shape[0]
        mh = codes.astype(jnp.uint64) * jnp.uint64(0x9E3779B97F4A7C15)
        idx = jnp.arange(n, dtype=i64)
        rows = n // W if n % W == 0 else n // W + 1
        pad = rows * W - n
        if pad:
            mh = jnp.concatenate([mh, jnp.full((pad,), jnp.uint64(-1))])
            idx = jnp.concatenate([idx, jnp.full((pad,), i64(-1))])
        pm = mh.reshape(rows, W)
        pi = idx.reshape(rows, W)
        sm, si = pm, pi
        s = 1
        while s < W:
            lm = jnp.concatenate([jnp.full((rows, s), jnp.uint64(-1)), pm[:, :-s]], axis=1)
            li = jnp.concatenate([jnp.full((rows, s), i64(-1)), pi[:, :-s]], axis=1)
            pm, pi = M._combine_rmin(lm, li, pm, pi)
            rm = jnp.concatenate([sm[:, s:], jnp.full((rows, s), jnp.uint64(-1))], axis=1)
            ri = jnp.concatenate([si[:, s:], jnp.full((rows, s), i64(-1))], axis=1)
            sm, si = M._combine_rmin(sm, si, rm, ri)
            s <<= 1
        return pi.reshape(-1)[:n], si.reshape(-1)[:n]

    def full(codes, is_start):
        return M.scan_minimizers(codes, is_start, K, W, EMIT_CAP)

    timed('seeds+rot', stage_seeds, codes)
    timed('hashes (seeds+winxor+rot)', stage_hashes, codes)
    timed('cumsum i64', stage_cumsum, codes)
    timed('cummax i64', stage_cummax, codes)
    timed('scatter compact (u32)', stage_scatter, codes)
    timed('sort compact (u8+u32)', stage_sort_compact, codes)
    timed('window argmin scans', stage_winmin, codes)
    res = timed('FULL scan_minimizers', full, codes, is_start)
    print('count:', int(res.count))

    # aggregation sort on emitted-sized arrays
    m = 1 << 19
    oh = rng.integers(0, 1 << 63, size=m, dtype=np.int64).astype(np.uint64)
    pos = rng.integers(0, 1 << 30, size=m).astype(np.uint32)
    rec = rng.integers(0, 1 << 20, size=m).astype(np.int32)
    asm = rec // 4

    @jax.jit
    def agg_sort(oh, pos, rec, asm):
        pad = (rec < 0).astype(jnp.uint8)
        return jax.lax.sort((pad, oh, pos, rec, asm), num_keys=2, is_stable=True)

    args = [jax.device_put(x) for x in (oh, pos, rec, asm)]
    jax.block_until_ready(args)
    t0 = time.time()
    out = agg_sort(*args)
    jax.block_until_ready(out)
    print(f'agg stable sort {m} x5 ops (compile+run): {time.time()-t0:.2f}s')
    t0 = time.time()
    out = agg_sort(*args)
    jax.block_until_ready(out)
    print(f'agg stable sort steady: {(time.time()-t0)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
