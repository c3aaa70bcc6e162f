"""Compare the fused Pallas phase-1 kernel vs the XLA phase-1 on TPU."""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from seqwin_tpu.engine import hybrid
from seqwin_tpu.engine.pallas_scan import L, pallas_phase1, phase1_shapes

K, W = 21, 200
TOTAL = 32_000_000


def sync(out):
    for x in jax.tree_util.tree_leaves(out):
        np.asarray(x.reshape(-1)[:8])


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    rec_len = 2_000_000
    records = [rng.integers(0, 4, size=rec_len).astype(np.uint8) for _ in range(TOTAL // rec_len)]

    total = sum(len(c) for c in records)
    rtotal, n, offset = phase1_shapes(total, K, W)
    codes = np.full(n, 255, dtype=np.uint8)
    off = offset
    starts = []
    for c in records:
        codes[off:off + len(c)] = c
        starts.append(off)
        off += len(c)
    for s in starts:
        codes[s] |= 64
    aug2d = jnp.asarray(codes.reshape(rtotal, L))
    codes_j = jnp.asarray(codes)

    t0 = time.time()
    out = hybrid.scan_phase1(codes_j, K, W)
    sync(out)
    print(f'xla phase1 compile+run: {time.time()-t0:.1f}s', flush=True)
    t0 = time.time()
    out = hybrid.scan_phase1(codes_j, K, W)
    sync(out)
    t_xla = time.time() - t0
    print(f'xla phase1 steady: {t_xla*1e3:.0f} ms ({n/t_xla/1e6:.0f} Mpos/s)', flush=True)
    z_ref = np.asarray(out[0])

    # kernel variant sweep: output mode x lane-shift implementation
    # (SEQWIN_TPU_ROLL A/B; VERDICT r3 #6 wants the measured Mpos/s delta)
    pfx_ref = None
    for label, kw in (
        ('z+hashes', dict(with_hashes=True, out='z')),
        ('z-only', dict(with_hashes=False, out='z')),
        ('pfx', dict(with_hashes=False, out='pfx')),
        ('z+hashes roll', dict(with_hashes=True, out='z', use_roll=True)),
        ('z-only roll', dict(with_hashes=False, out='z', use_roll=True)),
        ('pfx roll', dict(with_hashes=False, out='pfx', use_roll=True)),
    ):
        t0 = time.time()
        zp = pallas_phase1(aug2d, K, W, **kw)
        sync(zp)
        print(f'pallas [{label}] compile+run: {time.time()-t0:.1f}s', flush=True)
        t0 = time.time()
        zp = pallas_phase1(aug2d, K, W, **kw)
        sync(zp)
        t_pal = time.time() - t0
        print(f'pallas [{label}] steady: {t_pal*1e3:.0f} ms '
              f'({n/t_pal/1e6:.0f} Mpos/s)', flush=True)
        if kw['out'] == 'z':
            z = np.asarray(zp[0])
            ok = np.array_equal(z, z_ref)
            print(f'bit-exact z on TPU [{label}]:', ok, flush=True)
            if not ok:
                bad = np.flatnonzero(z != z_ref)
                print('mismatches:', len(bad), bad[:10], z[bad[:5]], z_ref[bad[:5]])
        else:
            got = tuple(np.asarray(x) for x in zp)
            if pfx_ref is None:
                pfx_ref = got
                print(f'pfx reference recorded [{label}]', flush=True)
            else:
                ok = all(np.array_equal(a, b) for a, b in zip(got, pfx_ref))
                print(f'bit-exact pfx on TPU [{label}]:', ok, flush=True)


if __name__ == '__main__':
    main()
