"""Fused Pallas kernel for phase 1 of the minimizer scan.

One pass over the base stream computes, per position: ntHash forward/reverse
hashes (u32-pair arithmetic -- Mosaic has no 64-bit lanes), validity masks,
the w-wide rightmost-argmin in position space, and the clean-window z values
(`engine/hybrid.py` semantics). Everything lives in VMEM; HBM traffic is one
read of the packed code stream and one write of (z, canon_lo, canon_hi).

Layout: the flat stream is viewed as rows of width w. Tiles are TB rows; each
tile loads a halo of 1 row before and A rows after (windows look back w-1
positions, hash/validity ladders look ahead up to w + k positions), so the
grid is embarrassingly parallel -- no sequential carry. The host guarantees
row 0 is padding (records start at offset w), which provides the first tile's
back halo.

Input encoding: one uint8 per base -- bits 0..5 the base code (0..3 valid,
else invalid) and bit 6 the record-start flag.

Mosaic toolchain quirks handled here (see benchmarks/pallas_probe.py):
- jnp.clip recurses during lowering -> use jnp.minimum/jnp.maximum;
- unsigned min/max crash the remote compiler -> shift-amount arithmetic is
  kept in int32 and cast to uint32 only at shift sites.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.hashing import M64, SEEDS, SEEDS_COMP

u32 = jnp.uint32
i32 = jnp.int32

_SENT_LO = np.uint32(0xFFFFFFFF)
_SENT_HI = np.uint32(0xFFFFFFFF)


def _mod_const(x, m: int, max_val: int):
    """x mod m for 0 <= x < max_val, via conditional subtraction (Mosaic's
    jnp.remainder lowering recurses, so no hardware mod)."""
    sub = m
    subs = []
    while sub * 2 <= max_val:
        sub *= 2
    while sub >= m:
        subs.append(sub)
        sub //= 2
    for s in subs:
        x = jnp.where(x >= s, x - s, x)
    return x


def _rot33(lo, b, r):
    """33-bit split rotation of (lo, b=bit32) by r (i32 in [0, 32])."""
    rc_i = jnp.minimum(jnp.maximum(r, 1), 31)
    rc = rc_i.astype(u32)
    s_i = 33 - rc_i  # [2, 32]
    sc = jnp.minimum(s_i, 31).astype(u32)
    s_u = s_i.astype(u32)
    l_shr = jnp.where(s_i < 32, (b << (u32(32) - s_u)) | (lo >> sc), b)
    mid_lo = (lo << rc) | l_shr
    mid_b = (lo >> (u32(32) - rc)) & u32(1)
    hi_lo = (b << u32(31)) | (lo >> u32(1))
    hi_b = lo & u32(1)
    out_lo = jnp.where(r == 0, lo, jnp.where(r == 32, hi_lo, mid_lo))
    out_b = jnp.where(r == 0, b, jnp.where(r == 32, hi_b, mid_b))
    return out_lo, out_b


def _rot31(h, r):
    """31-bit rotation of h (< 2^31) by r (i32 in [0, 30])."""
    ru = r.astype(u32)
    rs = (31 - r).astype(u32)
    return ((h << ru) | (h >> rs)) & u32((1 << 31) - 1)


def _srol_pair(lo, hi, r33, r31):
    b = hi & u32(1)
    h31 = hi >> u32(1)
    nlo, nb = _rot33(lo, b, r33)
    nh = _rot31(h31, r31)
    return nlo, (nh << u32(1)) | nb


def _sel_seed(code, seeds):
    """code (i32 0..3, invalid>3) -> (lo, hi) u32 constants; invalid -> 0."""
    lo = jnp.where(code == 0, u32(seeds[0] & 0xFFFFFFFF), u32(0))
    hi = jnp.where(code == 0, u32(seeds[0] >> 32), u32(0))
    lo = jnp.where(code == 1, u32(seeds[1] & 0xFFFFFFFF), lo)
    hi = jnp.where(code == 1, u32(seeds[1] >> 32), hi)
    lo = jnp.where(code == 2, u32(seeds[2] & 0xFFFFFFFF), lo)
    hi = jnp.where(code == 2, u32(seeds[2] >> 32), hi)
    lo = jnp.where(code == 3, u32(seeds[3] & 0xFFFFFFFF), lo)
    hi = jnp.where(code == 3, u32(seeds[3] >> 32), hi)
    return lo, hi


def _shl_flat(x, s: int, w: int):
    """y[r, l] = x at flat offset +s (rows are width-w segments of the flat
    stream). Valid wherever the source lies inside the block."""
    q, rl = divmod(s, w)
    if q:
        x = jnp.concatenate([x[q:], x[-q:]], axis=0)  # garbage tail rows
    if rl:
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        x = jnp.concatenate([x[:, rl:], nxt[:, :rl]], axis=1)
    return x


def _shr_flat(x, s: int, w: int):
    """y[r, l] = x at flat offset -s. Valid where the source is in-block."""
    q, rl = divmod(s, w)
    if q:
        x = jnp.concatenate([x[:q], x[:-q]], axis=0)  # garbage head rows
    if rl:
        prv = jnp.concatenate([x[:1], x[:-1]], axis=0)
        x = jnp.concatenate([prv[:, w - rl:], x[:, :w - rl]], axis=1)
    return x


def _xor_ladder(lo, hi, k: int, w: int):
    """(XOR over flat window of k) for a u32 pair, disjoint decomposition."""
    res_lo = res_hi = None
    res_len = 0
    p_lo, p_hi = lo, hi
    j = 0
    kk = k
    while kk:
        if kk & 1:
            if res_lo is None:
                res_lo, res_hi = p_lo, p_hi
                res_len = 1 << j
            else:
                res_lo = res_lo ^ _shl_flat(p_lo, res_len, w)
                res_hi = res_hi ^ _shl_flat(p_hi, res_len, w)
                res_len += 1 << j
        kk >>= 1
        if kk:
            p_lo = p_lo ^ _shl_flat(p_lo, 1 << j, w)
            p_hi = p_hi ^ _shl_flat(p_hi, 1 << j, w)
            j += 1
    return res_lo, res_hi


def _or_ladder(x, m: int, w: int):
    """OR over flat forward window of m (overlap-tolerant doubling)."""
    span = 1
    acc = x
    while span < m:
        step = min(span, m - span)
        acc = acc | _shl_flat(acc, step, w)
        span += step
    return acc


def _combine_rmin_pair(l_lo, l_hi, l_idx, r_lo, r_hi, r_idx):
    """Rightmost-min combine on u64-as-pairs: take right iff r <= l."""
    take_r = (r_hi < l_hi) | ((r_hi == l_hi) & (r_lo <= l_lo))
    return (
        jnp.where(take_r, r_lo, l_lo),
        jnp.where(take_r, r_hi, l_hi),
        jnp.where(take_r, r_idx, l_idx),
    )


def _row_shr(x, s: int, fill):
    """Within-row (lane) shift right by s with fill."""
    r, w = x.shape
    return jnp.concatenate([jnp.full((r, s), fill, dtype=x.dtype), x[:, :-s]], axis=1)


def _row_shl(x, s: int, fill):
    r, w = x.shape
    return jnp.concatenate([x[:, s:], jnp.full((r, s), fill, dtype=x.dtype)], axis=1)


# Fetched halo rows after the tile. Generously padded so that the block row
# count (tb + 32) and all tile offsets stay multiples of 32 -- the safe
# alignment for 8-bit DMA tiling.
HALO_FETCH = 31


def _make_kernel(k: int, w: int, tb: int, halo_after: int, n_total: int):
    rows_in = tb + 1 + halo_after

    def kernel(tilemod_ref, codes_ref, z_ref, clo_ref, chi_ref):
        tile = pl.program_id(0)
        raw = codes_ref[:].astype(i32)
        code = raw & i32(63)
        start = (raw & i32(64)) != 0

        # global flat position of each element
        base_row = tile * tb  # block covers stream rows [base_row, base_row+rows_in)
        rid = jax.lax.broadcasted_iota(i32, (rows_in, w), 0)
        lid = jax.lax.broadcasted_iota(i32, (rows_in, w), 1)
        p = (base_row + rid) * w + lid

        # p mod 33 / mod 31 decomposed: (tile part, prefetched) + (row part)
        # + (lane part), folded with conditional subtraction -- Mosaic has no
        # usable mod.
        t33 = tilemod_ref[tile, 0]
        t31 = tilemod_ref[tile, 1]
        r33p = _mod_const(_mod_const(rid, 33, rows_in) * (w % 33), 33, 33 * 33)
        r31p = _mod_const(_mod_const(rid, 31, rows_in) * (w % 31), 31, 31 * 31)
        l33 = _mod_const(lid, 33, w)
        l31 = _mod_const(lid, 31, w)
        pm33 = _mod_const(t33 + r33p + l33, 33, 3 * 33)
        pm31 = _mod_const(t31 + r31p + l31, 31, 3 * 31)
        # NOTE: scalar literals as where-branches recurse in Mosaic tracing;
        # keep every branch an array or an explicitly typed scalar.
        neg33 = jnp.where(pm33 == 0, i32(0), i32(33) - pm33)
        neg31 = jnp.where(pm31 == 0, i32(0), i32(31) - pm31)

        a_lo, a_hi = _sel_seed(code, SEEDS)
        a_lo, a_hi = _srol_pair(a_lo, a_hi, neg33, neg31)
        b_lo, b_hi = _sel_seed(code, SEEDS_COMP)
        b_lo, b_hi = _srol_pair(b_lo, b_hi, pm33, pm31)

        wf_lo, wf_hi = _xor_ladder(a_lo, a_hi, k, w)
        wr_lo, wr_hi = _xor_ladder(b_lo, b_hi, k, w)

        f33 = _mod_const(pm33 + ((k - 1) % 33), 33, 2 * 33)
        f31 = _mod_const(pm31 + ((k - 1) % 31), 31, 2 * 31)
        fwd_lo, fwd_hi = _srol_pair(wf_lo, wf_hi, f33, f31)
        rev_lo, rev_hi = _srol_pair(wr_lo, wr_hi, neg33, neg31)

        # canonical = fwd + rev (mod 2^64)
        c_lo = fwd_lo + rev_lo
        carry = (c_lo < fwd_lo).astype(u32)
        c_hi = fwd_hi + rev_hi + carry

        # validity
        invalid = code > 3
        bad = _or_ladder(invalid, k, w)
        if k > 1:
            start_in = _or_ladder(_shl_flat(start, 1, w), k - 1, w)
        else:
            start_in = jnp.zeros_like(start)
        valid = (~bad) & (~start_in) & (p <= i32(n_total - k))

        # clean mask
        blocker = (~valid) | start
        blk_fwd = _or_ladder(blocker, w, w)
        has_blk_back = _shr_flat(blk_fwd, w - 1, w)
        clean = valid & (p >= i32(w - 1)) & (~has_blk_back)

        # windowed rightmost-argmin in position space
        mh_lo = jnp.where(valid, c_lo, u32(_SENT_LO))
        mh_hi = jnp.where(valid, c_hi, u32(_SENT_HI))
        idx = jnp.where(valid, p, i32(-1))
        pm_lo, pm_hi, pm_i = mh_lo, mh_hi, idx
        sm_lo, sm_hi, sm_i = mh_lo, mh_hi, idx
        s = 1
        while s < w:
            pm_lo, pm_hi, pm_i = _combine_rmin_pair(
                _row_shr(pm_lo, s, u32(_SENT_LO)),
                _row_shr(pm_hi, s, u32(_SENT_HI)),
                _row_shr(pm_i, s, i32(-1)),
                pm_lo, pm_hi, pm_i,
            )
            sm_lo, sm_hi, sm_i = _combine_rmin_pair(
                sm_lo, sm_hi, sm_i,
                _row_shl(sm_lo, s, u32(_SENT_LO)),
                _row_shl(sm_hi, s, u32(_SENT_HI)),
                _row_shl(sm_i, s, i32(-1)),
            )
            s <<= 1
        t_lo = _shr_flat(sm_lo, w - 1, w)
        t_hi = _shr_flat(sm_hi, w - 1, w)
        t_i = _shr_flat(sm_i, w - 1, w)
        win_lo, win_hi, win_i = _combine_rmin_pair(t_lo, t_hi, t_i, pm_lo, pm_hi, pm_i)

        not_max = ~((win_lo == u32(_SENT_LO)) & (win_hi == u32(_SENT_HI)))
        z = jnp.where(clean & not_max, win_i, i32(-1))

        # emit center rows [1, tb+1)
        z_ref[:] = z[1:tb + 1]
        clo_ref[:] = c_lo[1:tb + 1]
        chi_ref[:] = c_hi[1:tb + 1]

    return kernel, rows_in


@functools.partial(jax.jit, static_argnames=('k', 'w', 'tb', 'interpret'))
def pallas_phase1(codes_aug_2d, k: int, w: int, tb: int = 128, interpret: bool = False):
    """Run the fused scan kernel over a (R, w) uint8 stream.

    Args:
        codes_aug_2d: uint8[R, w]; row 0 must be padding; bit6 = record start.
            R - 1 - HALO_FETCH must be a positive multiple of tb (use
            `phase1_shapes` to size the buffer).

    Returns:
        (z i32[R*w], canon_lo u32[R*w], canon_hi u32[R*w]) in flat positions
        (row 0 included; its z is -1 and canon values are arbitrary).
    """
    rtotal, ww = codes_aug_2d.shape
    assert ww == w
    halo_needed = 2 + (k + w - 2) // w
    assert halo_needed <= HALO_FETCH, 'k too large for the fetched halo'
    r_out = rtotal - 1 - HALO_FETCH
    assert r_out % tb == 0 and r_out > 0
    n_total = rtotal * w
    kernel, rows_in = _make_kernel(k, w, tb, HALO_FETCH, n_total)
    tiles = r_out // tb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((tb, w), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, w), lambda i, *_: (i, 0)),
            pl.BlockSpec((tb, w), lambda i, *_: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_in, w), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def outer_kernel(tilemod_ref, codes_hbm, z_ref, clo_ref, chi_ref, scratch, sem):
        tile = pl.program_id(0)
        cp = pltpu.make_async_copy(
            codes_hbm.at[pl.ds(tile * tb, rows_in), :],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()
        kernel(tilemod_ref, scratch, z_ref, clo_ref, chi_ref)

    tilemod = np.stack(
        [
            np.array([(i * tb * w) % 33 for i in range(tiles)], dtype=np.int32),
            np.array([(i * tb * w) % 31 for i in range(tiles)], dtype=np.int32),
        ],
        axis=1,
    )

    z2d, lo2d, hi2d = pl.pallas_call(
        outer_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r_out, w), i32),
            jax.ShapeDtypeStruct((r_out, w), u32),
            jax.ShapeDtypeStruct((r_out, w), u32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(tilemod), codes_aug_2d)

    pad_row_z = jnp.full((1, w), i32(-1))
    pad_row_u = jnp.zeros((1, w), dtype=u32)
    z = jnp.concatenate([pad_row_z, z2d]).reshape(-1)
    lo = jnp.concatenate([pad_row_u, lo2d]).reshape(-1)
    hi = jnp.concatenate([pad_row_u, hi2d]).reshape(-1)
    return z, lo, hi


def phase1_shapes(total_bases: int, k: int, w: int, tb: int = 128):
    """(rows_total, n_flat) for a stream of ``total_bases`` real bases placed
    at offset w (row 0 is padding). Output rows are rounded to a power of two
    (>= tb) so jit re-traces stay bounded across datasets."""
    data_rows = max(1, -(-total_bases // w))
    r_out = max(tb, 1 << (data_rows - 1).bit_length())
    rtotal = 1 + r_out + HALO_FETCH
    return rtotal, rtotal * w
