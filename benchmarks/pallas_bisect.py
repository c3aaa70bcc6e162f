"""Bisect which stage of the (grid-free) fused kernel breaks Mosaic."""
import re

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seqwin_tpu.engine.pallas_scan import (
    L, _mod_const, _or_ladder, _sel_seed, _shl_flat, _shr_flat, _srol_pair,
    _take_right, _xor_ladder, i32, u32, _SENT,
)
from seqwin_tpu.ops.hashing import SEEDS, SEEDS_COMP

K, W = 21, 200
TB = 128
ROWS_IN = 136


def build(stage):
    def kernel(scal_ref, codes_ref, o1, o2):
        raw = codes_ref[:].astype(i32)
        code = raw & i32(63)
        start = (raw & i32(64)) != 0
        base_row = scal_ref[0, 0]
        rid = jax.lax.broadcasted_iota(i32, (ROWS_IN, L), 0)
        lid = jax.lax.broadcasted_iota(i32, (ROWS_IN, L), 1)
        p = (base_row + rid) * L + lid
        t33 = scal_ref[0, 1]
        t31 = scal_ref[0, 2]
        tw = scal_ref[0, 3]
        r33p = _mod_const(_mod_const(rid, 33, ROWS_IN) * (L % 33), 33, 33 * 33)
        r31p = _mod_const(_mod_const(rid, 31, ROWS_IN) * (L % 31), 31, 31 * 31)
        pm33 = _mod_const(t33 + r33p + _mod_const(lid, 33, L), 33, 3 * 33)
        pm31 = _mod_const(t31 + r31p + _mod_const(lid, 31, L), 31, 3 * 31)
        lm = L % W
        rwp = _mod_const(_mod_const(rid, W, ROWS_IN) * lm, W, W * W)
        seg_off = _mod_const(tw + rwp + _mod_const(lid, W, L), W, 3 * W)
        neg33 = jnp.where(pm33 == 0, i32(0), i32(33) - pm33)
        neg31 = jnp.where(pm31 == 0, i32(0), i32(31) - pm31)
        if stage == 'mods':
            o1[:] = (pm33 + seg_off)[:TB]
            o2[:] = (pm31 + neg33 + neg31)[:TB].astype(u32)
            return
        a_lo, a_hi = _sel_seed(code, SEEDS)
        a_lo, a_hi = _srol_pair(a_lo, a_hi, neg33, neg31)
        b_lo, b_hi = _sel_seed(code, SEEDS_COMP)
        b_lo, b_hi = _srol_pair(b_lo, b_hi, pm33, pm31)
        if stage == 'seeds':
            o1[:] = (a_lo ^ b_lo)[:TB].astype(i32)
            o2[:] = (a_hi ^ b_hi)[:TB]
            return
        wf_lo, wf_hi = _xor_ladder(a_lo, a_hi, K)
        wr_lo, wr_hi = _xor_ladder(b_lo, b_hi, K)
        f33 = _mod_const(pm33 + ((K - 1) % 33), 33, 2 * 33)
        f31 = _mod_const(pm31 + ((K - 1) % 31), 31, 2 * 31)
        fwd_lo, fwd_hi = _srol_pair(wf_lo, wf_hi, f33, f31)
        rev_lo, rev_hi = _srol_pair(wr_lo, wr_hi, neg33, neg31)
        c_lo = fwd_lo + rev_lo
        carry = (c_lo < fwd_lo).astype(u32)
        c_hi = fwd_hi + rev_hi + carry
        if stage == 'hash':
            o1[:] = c_lo[:TB].astype(i32)
            o2[:] = c_hi[:TB]
            return
        invalid = code > 3
        bad = _or_ladder(invalid, K)
        start_in = _or_ladder(_shl_flat(start, 1), K - 1)
        valid = (~bad) & (~start_in) & (p <= i32(10_000_000))
        blocker = (~valid) | start
        blk_fwd = _or_ladder(blocker, W)
        has_blk_back = _shr_flat(blk_fwd, W - 1)
        clean = valid & (p >= i32(W - 1)) & (~has_blk_back)
        if stage == 'valid':
            o1[:] = clean[:TB].astype(i32)
            o2[:] = valid[:TB].astype(u32)
            return
        mh_lo = jnp.where(valid, c_lo, u32(_SENT))
        mh_hi = jnp.where(valid, c_hi, u32(_SENT))
        idx = jnp.where(valid, p, i32(-1))
        pm_lo, pm_hi, pm_i = mh_lo, mh_hi, idx
        sm_lo, sm_hi, sm_i = mh_lo, mh_hi, idx
        s = 1
        while s < W:
            cl_lo = _shr_flat(pm_lo, s)
            cl_hi = _shr_flat(pm_hi, s)
            cl_i = _shr_flat(pm_i, s)
            tr = _take_right(cl_lo, cl_hi, pm_lo, pm_hi)
            use = seg_off >= s
            pm_lo = jnp.where(use & ~tr, cl_lo, pm_lo)
            pm_hi = jnp.where(use & ~tr, cl_hi, pm_hi)
            pm_i = jnp.where(use & ~tr, cl_i, pm_i)
            cr_lo = _shl_flat(sm_lo, s)
            cr_hi = _shl_flat(sm_hi, s)
            cr_i = _shl_flat(sm_i, s)
            tr2 = _take_right(sm_lo, sm_hi, cr_lo, cr_hi)
            use2 = seg_off <= W - 1 - s
            sm_lo = jnp.where(use2 & tr2, cr_lo, sm_lo)
            sm_hi = jnp.where(use2 & tr2, cr_hi, sm_hi)
            sm_i = jnp.where(use2 & tr2, cr_i, sm_i)
            s <<= 1
        t_lo = _shr_flat(sm_lo, W - 1)
        t_hi = _shr_flat(sm_hi, W - 1)
        t_i = _shr_flat(sm_i, W - 1)
        tr3 = _take_right(t_lo, t_hi, pm_lo, pm_hi)
        win_i = jnp.where(tr3, pm_i, t_i)
        o1[:] = win_i[:TB]
        o2[:] = jnp.where(clean, u32(1), u32(0))[:TB]

    return kernel


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(ROWS_IN, L)).astype(np.uint8)
    scal = np.array([[0, 0, 0, 0]], dtype=np.int32)

    for stage in ('mods', 'seeds', 'hash', 'valid', 'full'):
        kern = build(stage)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=(
                    jax.ShapeDtypeStruct((TB, L), jnp.int32),
                    jax.ShapeDtypeStruct((TB, L), jnp.uint32),
                ),
                in_specs=[
                    pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
            )(jnp.asarray(scal), jnp.asarray(codes))
            np.asarray(out[0][:2, :2])
            print(f'STAGE {stage}: OK', flush=True)
        except Exception as e:
            m = re.search(r'(Mosaic failed|failed to legalize|Invalid|Recursion)[^\n]*', str(e))
            print(f'STAGE {stage}: FAIL {(m.group(0) if m else str(e))[:110]}', flush=True)


if __name__ == '__main__':
    main()
