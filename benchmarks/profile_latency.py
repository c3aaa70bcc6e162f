"""Measure real per-call latency and materialization cost over the device link."""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

N = 1 << 24
K, W = 21, 200


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 4, size=N).astype(np.uint8)
    is_start_h = np.zeros(N, dtype=bool)
    is_start_h[0] = True
    codes = jax.device_put(codes_h)
    is_start = jax.device_put(is_start_h)
    jax.block_until_ready((codes, is_start))

    @jax.jit
    def tiny(x):
        return x + 1

    x = jax.device_put(np.zeros(8, np.int32))
    jax.block_until_ready(tiny(x))
    t0 = time.time()
    for _ in range(10):
        jax.block_until_ready(tiny(x))
    print(f'tiny call round-trip: {(time.time()-t0)/10*1e3:.1f} ms')

    from seqwin_tpu.engine.minimizer import scan_minimizers

    emit_cap = 1 << 19
    res = scan_minimizers(codes, is_start, K, W, emit_cap)
    jax.block_until_ready(res)
    print('warm')

    t0 = time.time()
    res = scan_minimizers(codes, is_start, K, W, emit_cap)
    jax.block_until_ready(res)
    t_block = time.time() - t0
    t0 = time.time()
    cnt = int(res.count)
    oh_h = np.asarray(res.out_hash)
    t_fetch = time.time() - t0
    print(f'scan block_until_ready: {t_block*1e3:.1f} ms; fetch count+oh: {t_fetch*1e3:.1f} ms; count={cnt}')

    # full sync: run + fetch scalar (forces everything)
    for rep in range(3):
        t0 = time.time()
        res = scan_minimizers(codes, is_start, K, W, emit_cap)
        cnt = int(res.count)
        print(f'scan+fetch rep{rep}: {(time.time()-t0)*1e3:.1f} ms count={cnt}')

    # including h2d each time (as build() does)
    for rep in range(3):
        t0 = time.time()
        c = jnp.asarray(codes_h)
        s = jnp.asarray(is_start_h)
        res = scan_minimizers(c, s, K, W, emit_cap)
        cnt = int(res.count)
        oh = np.asarray(res.out_hash[:cnt])
        pos = np.asarray(res.pos[:cnt])
        rec = np.asarray(res.rec[:cnt])
        print(f'h2d+scan+d2h rep{rep}: {(time.time()-t0)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
