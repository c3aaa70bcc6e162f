"""Probe Mosaic capabilities needed by the fused scan kernel:
per-element variable shifts, u32 split-rotations, lane-axis concatenates."""
import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seqwin_tpu.ops.hashing import srol

M31 = (1 << 31) - 1


def rot33_u32(lo, b, r):
    """33-bit split rotation on (lo u32, b u32 in {0,1}) by r (i32 in [0, 32]).

    Mosaic toolchain notes: jnp.clip recurses and unsigned min/max crash the
    remote compiler, so all shift-amount arithmetic stays in int32 (values
    are tiny) and is cast to uint32 only at the shift sites.
    """
    rc_i = jnp.minimum(jnp.maximum(r, 1), 31)  # i32 in [1, 31]
    rc = rc_i.astype(jnp.uint32)
    s_i = 33 - rc_i  # i32 in [2, 32]
    sc = jnp.minimum(s_i, 31).astype(jnp.uint32)
    s_u = s_i.astype(jnp.uint32)
    l_shr = jnp.where(s_i < 32, (b << (jnp.uint32(32) - s_u)) | (lo >> sc), b)
    mid_lo = (lo << rc) | l_shr
    mid_b = (lo >> (jnp.uint32(32) - rc)) & jnp.uint32(1)
    hi_lo = (b << jnp.uint32(31)) | (lo >> jnp.uint32(1))
    hi_b = lo & jnp.uint32(1)
    out_lo = jnp.where(r == 0, lo, jnp.where(r == 32, hi_lo, mid_lo))
    out_b = jnp.where(r == 0, b, jnp.where(r == 32, hi_b, mid_b))
    return out_lo, out_b


def rot31_u32(h, r):
    """31-bit rotation on h (u32, < 2^31) by r (i32 in [0, 30])."""
    ru = r.astype(jnp.uint32)
    rs = (31 - r).astype(jnp.uint32)
    return ((h << ru) | (h >> rs)) & jnp.uint32(M31)


def srol_pair(lo, hi, r33, r31):
    """srol^d on a u64 as (lo, hi) u32 pair; r33 = d%33, r31 = d%31 (i32)."""
    b = hi & jnp.uint32(1)
    h31 = hi >> jnp.uint32(1)
    nlo, nb = rot33_u32(lo, b, r33)
    nh = rot31_u32(h31, r31)
    return nlo, (nh << jnp.uint32(1)) | nb


def kernel(lo_ref, hi_ref, r33_ref, r31_ref, out_lo_ref, out_hi_ref):
    lo, hi = lo_ref[:], hi_ref[:]
    r33 = r33_ref[:]
    r31 = r31_ref[:]
    nlo, nhi = srol_pair(lo, hi, r33, r31)
    # also exercise lane-axis concatenate shifting
    shifted = jnp.concatenate([nlo[:, 3:], nlo[:, :3]], axis=1)
    out_lo_ref[:] = shifted
    out_hi_ref[:] = nhi


def main():
    rows, lanes = 64, 256
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 63, size=(rows, lanes), dtype=np.int64).astype(np.uint64)
    d = rng.integers(0, 1023, size=(rows, lanes)).astype(np.int32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    r33 = (d % 33).astype(np.int32)
    r31 = (d % 31).astype(np.int32)

    fn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    out_lo, out_hi = jax.jit(fn)(lo, hi, r33, r31)
    out_lo = np.asarray(out_lo)
    out_hi = np.asarray(out_hi)

    # reference
    ref = np.array([[srol(int(x[i, j]), int(d[i, j])) for j in range(lanes)] for i in range(rows)],
                   dtype=np.uint64)
    ref_lo = (ref & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    ref_lo_shifted = np.concatenate([ref_lo[:, 3:], ref_lo[:, :3]], axis=1)
    ref_hi = (ref >> np.uint64(32)).astype(np.uint32)
    ok_lo = np.array_equal(out_lo, ref_lo_shifted)
    ok_hi = np.array_equal(out_hi, ref_hi)
    print('PROBE lo:', ok_lo, 'hi:', ok_hi)
    if not (ok_lo and ok_hi):
        bad = np.argwhere(out_hi != ref_hi)[:5]
        print('first bad hi:', bad, out_hi[tuple(bad[0])] if len(bad) else '')


if __name__ == '__main__':
    main()
