"""Fused Pallas kernel for phase 1 of the minimizer scan.

One pass over the base stream computes, per position: ntHash forward/reverse
hashes (u32-pair arithmetic -- Mosaic has no 64-bit lanes), validity masks,
the w-wide rightmost-argmin in position space, and the clean-window z values
(`engine/hybrid.py` semantics). Everything lives in VMEM; HBM traffic is one
read of the packed code stream and one write of (z, canon_lo, canon_hi).

Layout: the flat stream is stored as rows of 128 lanes (the TPU-aligned minor
dimension). The w-window argmin uses *segmented* prefix/suffix scans that
reset at w-aligned flat boundaries -- the generalization of the classic
two-block trick to a layout width independent of w. Tiles are TB rows plus a
halo (hb rows back for the window lookback, ha rows ahead for the hash /
validity ladders), so the grid is embarrassingly parallel. The host places
records at flat offset hb*128, guaranteeing the first tile's back halo is
padding.

Input encoding: one uint8 per base -- bits 0..5 the base code (0..3 valid,
else invalid) and bit 6 the record-start flag.

Mosaic toolchain quirks handled here (see benchmarks/pallas_probe.py):
- jnp.clip and jnp.remainder recurse during lowering -> conditional-
  subtraction ladders and prefetched per-tile residues instead;
- unsigned min/max crash the remote compiler -> shift-amount arithmetic in
  int32, cast to uint32 only at shift sites;
- scalar literals as jnp.where branches recurse -> always typed scalars;
- DMA slices need 128-aligned minor dims -> the 128-lane layout itself.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.hashing import SEEDS, SEEDS_COMP

u32 = jnp.uint32
i32 = jnp.int32

L = 128  # lane width of the flat layout

_SENT = np.uint32(0xFFFFFFFF)


def _mod_const(x, m: int, max_val: int):
    """x mod m for 0 <= x < max_val via conditional subtraction."""
    if max_val <= m:
        return x
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
    """33-bit split rotation on (lo u32, b u32 in {0,1}) by r (i32 in [0, 32])."""
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
    """31-bit rotation of h (u32 < 2^31) by r (i32 in [0, 30])."""
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
    lo = jnp.where(code == 0, u32(seeds[0] & 0xFFFFFFFF), u32(0))
    hi = jnp.where(code == 0, u32(seeds[0] >> 32), u32(0))
    lo = jnp.where(code == 1, u32(seeds[1] & 0xFFFFFFFF), lo)
    hi = jnp.where(code == 1, u32(seeds[1] >> 32), hi)
    lo = jnp.where(code == 2, u32(seeds[2] & 0xFFFFFFFF), lo)
    hi = jnp.where(code == 2, u32(seeds[2] >> 32), hi)
    lo = jnp.where(code == 3, u32(seeds[3] & 0xFFFFFFFF), lo)
    hi = jnp.where(code == 3, u32(seeds[3] >> 32), hi)
    return lo, hi


def _shl_flat(x, s: int):
    """y[r, l] = x at flat offset +s (row-major, L lanes per row)."""
    q, rl = divmod(s, L)
    if q:
        x = jnp.concatenate([x[q:], x[-q:]], axis=0)  # garbage tail rows
    if rl:
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        x = jnp.concatenate([x[:, rl:], nxt[:, :rl]], axis=1)
    return x


def _shr_flat(x, s: int):
    """y[r, l] = x at flat offset -s."""
    q, rl = divmod(s, L)
    if q:
        x = jnp.concatenate([x[:q], x[:-q]], axis=0)  # garbage head rows
    if rl:
        prv = jnp.concatenate([x[:1], x[:-1]], axis=0)
        x = jnp.concatenate([prv[:, L - rl:], x[:, :L - rl]], axis=1)
    return x


def _shl_flat_roll(x, s: int):
    """`_shl_flat` with the lane move as ONE pltpu.roll (native vreg lane
    rotate) + a row shift + a lane-mask select, instead of two slice+concat
    relayouts. SEQWIN_TPU_ROLL=1 A/B knob (PERF.md round-4 kernel lever)."""
    q, rl = divmod(s, L)
    if q:
        x = jnp.concatenate([x[q:], x[-q:]], axis=0)
    if rl:
        # Shift amount MUST be an i32 scalar: a Python int lowers to i64 and
        # real-chip Mosaic rejects it ('tpu.dynamic_rotate' operand #1 must be
        # 32-bit) -- the CPU interpreter accepts either (chip-only landmine).
        rolled = pltpu.roll(x, i32(L - rl), 1)  # rolled[r,l] = x[r,(l+rl)%L]
        nxt = jnp.concatenate([rolled[1:], rolled[-1:]], axis=0)
        lid = jax.lax.broadcasted_iota(i32, x.shape, 1)
        x = jnp.where(lid < i32(L - rl), rolled, nxt)
    return x


def _shr_flat_roll(x, s: int):
    """`_shr_flat` via pltpu.roll; see `_shl_flat_roll`."""
    q, rl = divmod(s, L)
    if q:
        x = jnp.concatenate([x[:q], x[:-q]], axis=0)
    if rl:
        rolled = pltpu.roll(x, i32(rl), 1)  # rolled[r,l] = x[r,(l-rl)%L]; i32: see _shl_flat_roll
        prv = jnp.concatenate([rolled[:1], rolled[:-1]], axis=0)
        lid = jax.lax.broadcasted_iota(i32, x.shape, 1)
        x = jnp.where(lid >= i32(rl), rolled, prv)
    return x


def _xor_ladder(lo, hi, k: int, shl=_shl_flat):
    """XOR over flat forward window of k (disjoint binary decomposition)."""
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
                res_lo = res_lo ^ shl(p_lo, res_len)
                res_hi = res_hi ^ shl(p_hi, res_len)
                res_len += 1 << j
        kk >>= 1
        if kk:
            p_lo = p_lo ^ shl(p_lo, 1 << j)
            p_hi = p_hi ^ shl(p_hi, 1 << j)
            j += 1
    return res_lo, res_hi


def _or_ladder(x, m: int, shl=_shl_flat):
    """OR over flat forward window of m (overlap-tolerant doubling)."""
    span = 1
    acc = x
    while span < m:
        step = min(span, m - span)
        acc = acc | shl(acc, step)
        span += step
    return acc


def _take_right(l_lo, l_hi, r_lo, r_hi):
    return (r_hi < l_hi) | ((r_hi == l_hi) & (r_lo <= l_lo))


def _make_kernel(k: int, w: int, tb: int, hb: int, rows_in: int, n_total: int,
                 with_hashes: bool = True, out_mode: str = 'z',
                 use_roll: bool = False):
    """``out_mode='z'``: write the per-position window-argmin z.
    ``out_mode='pfx'``: fold the emission scan into the kernel -- write the
    tile-local inclusive prefix-max of z (the emission staircase) plus the
    tile-local count of output-region staircase increases (local emission
    rank). Both ladders run at VMEM speed; phase 2 then needs NO N-wide
    XLA scan (`engine/hybrid.scan_phase2_pfx`)."""

    _shl = _shl_flat_roll if use_roll else _shl_flat
    _shr = _shr_flat_roll if use_roll else _shr_flat

    def kernel(scal_ref, codes_ref, z_ref, clo_ref=None, chi_ref=None):
        # scal_ref (SMEM i32[1,4]): [base_row, base%33, base%31, base%w]
        # NOTE: masks that get shifted/concatenated are kept in i32 -- bool
        # vector relayouts crash this Mosaic ("Invalid vector register cast").
        raw = codes_ref[:].astype(i32)
        code = raw & i32(63)
        start_i = (raw >> i32(6)) & i32(1)

        base_row = scal_ref[0, 0]
        rid = jax.lax.broadcasted_iota(i32, (rows_in, L), 0)
        lid = jax.lax.broadcasted_iota(i32, (rows_in, L), 1)
        p = (base_row + rid) * L + lid

        # p mod {33, 31, w}: per-tile residue (SMEM) + row part + lane part
        t33 = scal_ref[0, 1]
        t31 = scal_ref[0, 2]
        tw = scal_ref[0, 3]
        r33p = _mod_const(_mod_const(rid, 33, rows_in) * (L % 33), 33, 33 * 33)
        r31p = _mod_const(_mod_const(rid, 31, rows_in) * (L % 31), 31, 31 * 31)
        pm33 = _mod_const(t33 + r33p + _mod_const(lid, 33, L), 33, 3 * 33)
        pm31 = _mod_const(t31 + r31p + _mod_const(lid, 31, L), 31, 3 * 31)
        if w > 1:
            lm = L % w
            rwp = _mod_const(_mod_const(rid, w, rows_in) * lm, w, w * w) if lm else jnp.zeros_like(rid)
            seg_off = _mod_const(tw + rwp + _mod_const(lid, w, L), w, 3 * w)
        else:
            seg_off = jnp.zeros_like(p)
        neg33 = jnp.where(pm33 == 0, i32(0), i32(33) - pm33)
        neg31 = jnp.where(pm31 == 0, i32(0), i32(31) - pm31)

        a_lo, a_hi = _sel_seed(code, SEEDS)
        a_lo, a_hi = _srol_pair(a_lo, a_hi, neg33, neg31)
        b_lo, b_hi = _sel_seed(code, SEEDS_COMP)
        b_lo, b_hi = _srol_pair(b_lo, b_hi, pm33, pm31)

        wf_lo, wf_hi = _xor_ladder(a_lo, a_hi, k, _shl)
        wr_lo, wr_hi = _xor_ladder(b_lo, b_hi, k, _shl)

        f33 = _mod_const(pm33 + ((k - 1) % 33), 33, 2 * 33)
        f31 = _mod_const(pm31 + ((k - 1) % 31), 31, 2 * 31)
        fwd_lo, fwd_hi = _srol_pair(wf_lo, wf_hi, f33, f31)
        rev_lo, rev_hi = _srol_pair(wr_lo, wr_hi, neg33, neg31)

        c_lo = fwd_lo + rev_lo
        carry = (c_lo < fwd_lo).astype(u32)
        c_hi = fwd_hi + rev_hi + carry

        invalid_i = (code > 3).astype(i32)
        bad_i = _or_ladder(invalid_i, k, _shl)
        if k > 1:
            start_in_i = _or_ladder(_shl(start_i, 1), k - 1, _shl)
        else:
            start_in_i = jnp.zeros_like(start_i)
        in_range_i = (p <= i32(n_total - k)).astype(i32)
        valid_i = jnp.where((bad_i | start_in_i) == 0, in_range_i, i32(0))
        valid = valid_i != 0

        blocker_i = (i32(1) - valid_i) | start_i
        blk_fwd_i = _or_ladder(blocker_i, w, _shl)
        has_blk_back_i = _shr(blk_fwd_i, w - 1) if w > 1 else blocker_i
        clean = valid & (p >= i32(w - 1)) & (has_blk_back_i == 0)

        # segmented rightmost-argmin over w-aligned flat segments
        mh_lo = jnp.where(valid, c_lo, u32(_SENT))
        mh_hi = jnp.where(valid, c_hi, u32(_SENT))
        idx = jnp.where(valid, p, i32(-1))
        pm_lo, pm_hi, pm_i = mh_lo, mh_hi, idx
        sm_lo, sm_hi, sm_i = mh_lo, mh_hi, idx
        s = 1
        while s < w:
            # prefix: pull from the left, only within the same segment
            cl_lo = _shr(pm_lo, s)
            cl_hi = _shr(pm_hi, s)
            cl_i = _shr(pm_i, s)
            tr = _take_right(cl_lo, cl_hi, pm_lo, pm_hi)
            use = seg_off >= s
            pm_lo = jnp.where(use & ~tr, cl_lo, pm_lo)
            pm_hi = jnp.where(use & ~tr, cl_hi, pm_hi)
            pm_i = jnp.where(use & ~tr, cl_i, pm_i)
            # suffix: pull from the right, only within the same segment
            cr_lo = _shl(sm_lo, s)
            cr_hi = _shl(sm_hi, s)
            cr_i = _shl(sm_i, s)
            tr2 = _take_right(sm_lo, sm_hi, cr_lo, cr_hi)
            use2 = seg_off <= w - 1 - s
            sm_lo = jnp.where(use2 & tr2, cr_lo, sm_lo)
            sm_hi = jnp.where(use2 & tr2, cr_hi, sm_hi)
            sm_i = jnp.where(use2 & tr2, cr_i, sm_i)
            s <<= 1
        if w > 1:
            t_lo = _shr(sm_lo, w - 1)
            t_hi = _shr(sm_hi, w - 1)
            t_i = _shr(sm_i, w - 1)
            tr3 = _take_right(t_lo, t_hi, pm_lo, pm_hi)
            win_lo = jnp.where(tr3, pm_lo, t_lo)
            win_hi = jnp.where(tr3, pm_hi, t_hi)
            win_i = jnp.where(tr3, pm_i, t_i)
        else:
            win_lo, win_hi, win_i = pm_lo, pm_hi, pm_i

        not_max = ~((win_lo == u32(_SENT)) & (win_hi == u32(_SENT)))
        z = jnp.where(clean & not_max, win_i, i32(-1))

        if out_mode == 'pfx':
            # Hillis-Steele in-tile prefix-max of z over row-major flat
            # order, RESET at the output region's start: the back halo's
            # values belong to the previous tile and are fully covered by
            # the cross-tile carry (phase 2's K_t dedups re-climbs), so the
            # staircase here is the tile's own -- which is also what the
            # XLA emulation (`hybrid.pfx_from_z`) computes, keeping the two
            # paths bit-equal. Causal shifts never read the forward halo.
            tpos = rid * i32(L) + lid
            out0 = i32(hb * L)
            tot = rows_in * L
            pfx = z
            s = 1
            while s < tot:
                sh = _shr(pfx, s)
                pfx = jnp.where(tpos >= i32(s) + out0,
                                jnp.maximum(pfx, sh), pfx)
                s <<= 1
            # staircase increases, counted over the output region only
            prev = jnp.where(tpos >= out0 + i32(1), _shr(pfx, 1), i32(-1))
            inc = ((pfx > prev) & (rid >= i32(hb))).astype(i32)
            lr = inc
            s = 1
            while s < tot:
                sh = _shr(lr, s)
                lr = lr + jnp.where(tpos >= i32(s), sh, i32(0))
                s <<= 1
            z_ref[:] = pfx[hb:hb + tb]
            clo_ref[:] = lr[hb:hb + tb]  # lrank rides the second output slot
            return

        z_ref[:] = z[hb:hb + tb]
        if with_hashes:
            clo_ref[:] = c_lo[hb:hb + tb]
            chi_ref[:] = c_hi[hb:hb + tb]

    return kernel


def _halos(k: int, w: int) -> tuple[int, int]:
    """(hb, ha): halo rows before/after a tile."""
    hb = -(-(w - 1) // L) if w > 1 else 0
    ha = -(-(w + k) // L) + 1
    return hb, ha


def pallas_phase1(codes_aug_2d, k: int, w: int, tb: int = 512,
                  interpret: bool = False, with_hashes: bool = True,
                  out: str = 'z', use_roll: bool | None = None,
                  unroll: int | None = None):
    """See `_pallas_phase1_jit`. ``use_roll=None`` resolves SEQWIN_TPU_ROLL
    here, OUTSIDE the jit cache, so the flag is always part of the compiled
    program's static key (the same trace-time-env hazard ShardSpec.extract
    documents). NOTE: callers that trace this inside their own jitted
    programs (fused/distributed) freeze the flag at their trace time."""
    if use_roll is None:
        import os

        # Default ON since round 4: measured on-chip at kernel level the roll
        # lane shifts win on both production configs (z-only 902 vs 669
        # Mpos/s, pfx 489 vs 456; bit-exact; benchmarks/r4/bench_pallas_r4.log)
        # and are neutral-within-noise at pipeline level (extract_ab_r4b.log).
        use_roll = os.environ.get('SEQWIN_TPU_ROLL', '1') == '1'
    if unroll is None:
        import os

        unroll = int(os.environ.get('SEQWIN_TPU_TILE_UNROLL', '1'))
    return _pallas_phase1_jit(
        codes_aug_2d, k, w, tb, interpret, with_hashes, out, use_roll,
        unroll)


@functools.partial(
    jax.jit,
    static_argnames=('k', 'w', 'tb', 'interpret', 'with_hashes', 'out',
                     'use_roll', 'unroll'))
def _pallas_phase1_jit(codes_aug_2d, k: int, w: int, tb: int = 512,
                       interpret: bool = False, with_hashes: bool = True,
                       out: str = 'z', use_roll: bool = False,
                       unroll: int = 1):
    """Run the fused scan kernel over an (R, 128) uint8 stream.

    Args:
        codes_aug_2d: uint8[R, 128]; the first hb rows and the last >= ha rows
            must be padding (use `phase1_shapes`). Bit 6 = record start.
        with_hashes: also write the canonical hash halves. The hot path
            passes False -- phase 2 recomputes hashes only at emitted
            positions (~1/(w/2) density), cutting the kernel's HBM writes
            from 12 to 4 bytes/position (PERF.md round-3 lever).

    Returns:
        (z i32[R*128], canon_lo u32[R*128], canon_hi u32[R*128]); the leading
        hb rows and trailing halo rows carry z = -1 / canon = 0. Without
        ``with_hashes`` the canon entries are (None, None).
    """
    rtotal, ww = codes_aug_2d.shape
    assert ww == L
    assert out in ('z', 'pfx')
    if out == 'pfx':
        assert not with_hashes, 'pfx mode recomputes hashes in phase 2'
    hb, ha = _halos(k, w)
    r_out = rtotal - hb - ha
    r_out -= r_out % tb
    assert r_out > 0
    rows_in = tb + hb + ha
    assert hb + r_out + (rows_in - tb - hb) <= rtotal
    n_total = rtotal * L
    kernel = _make_kernel(k, w, tb, hb, rows_in, n_total, with_hashes, out,
                          use_roll)
    tiles = r_out // tb

    n_out = 3 if with_hashes else (2 if out == 'pfx' else 1)
    out_dtypes = (i32, i32) if out == 'pfx' else (i32, u32, u32)
    # NOTE: this toolchain's Mosaic cannot compile *gridded* pallas kernels
    # ("failed to legalize func.return"), so tiling happens at the XLA level:
    # a grid-free kernel per tile, sequenced by lax.map over dynamic slices.
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((tb, L), dt)
            for dt in (out_dtypes[:n_out])
        ),
        in_specs=[
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_out)
        ),
        interpret=interpret,
    )

    def one_tile(base_row):
        base = base_row * L
        tile_codes = jax.lax.dynamic_slice(codes_aug_2d, (base_row, i32(0)), (rows_in, L))
        scal = jnp.stack([base_row, base % 33, base % 31, base % w]).astype(i32).reshape(1, 4)
        return call(scal, tile_codes)

    # lax.map sequences the grid-free tile calls; each iteration carries
    # fixed while-loop overhead, so UNROLL tiles per iteration when the
    # count divides (pure call reordering -- outputs are bit-identical)
    if unroll > 1 and tiles % unroll == 0:
        def body(i):
            parts = [one_tile((i * unroll + j) * tb) for j in range(unroll)]
            return tuple(
                jnp.concatenate([p[o] for p in parts], axis=0)
                for o in range(n_out))

        outs = jax.lax.map(body, jnp.arange(tiles // unroll, dtype=i32))
    else:
        outs = jax.lax.map(lambda i: one_tile(i * tb),
                           jnp.arange(tiles, dtype=i32))
    tail = rtotal - hb - r_out

    z2d = outs[0].reshape(r_out, L)
    head_z = jnp.full((hb, L), i32(-1))
    tail_z = jnp.full((tail, L), i32(-1))
    z = jnp.concatenate([head_z, z2d, tail_z]).reshape(-1)
    if out == 'pfx':
        # (zpfx, lrank) tile grids for scan_phase2_pfx: [tiles, tb*L]
        return z2d.reshape(tiles, tb * L), outs[1].reshape(tiles, tb * L)
    if not with_hashes:
        return z, None, None

    head_u = jnp.zeros((hb, L), dtype=u32)
    tail_u = jnp.zeros((tail, L), dtype=u32)
    lo = jnp.concatenate([head_u, outs[1].reshape(r_out, L), tail_u]).reshape(-1)
    hi = jnp.concatenate([head_u, outs[2].reshape(r_out, L), tail_u]).reshape(-1)
    return z, lo, hi


def phase1_shapes(total_bases: int, k: int, w: int, tb: int = 512,
                  quant: str = 'pow2'):
    """(rows_total, n_flat, offset) for a stream of ``total_bases`` real bases.

    The stream starts at ``offset`` (= hb rows of padding); output rows are
    rounded up so jit re-traces stay bounded:
    - ``quant='pow2'``: power-of-two multiple of tb (single-chip chunking;
      one shape bucket per run);
    - ``quant='eighth'``: pow2/8 steps (<= 12.5%% padding) -- used by the
      distributed layout, where every device pays the padded scan and pow2
      rounding costs up to 2x step time (benchmarks/scaling_accounting.py).
    """
    hb, ha = _halos(k, w)
    data_rows = max(1, -(-total_bases // L))
    r_out = max(tb, 1 << (data_rows - 1).bit_length())
    if quant == 'eighth' and r_out > tb:
        step = max(tb, r_out // 8)
        r_fine = -(-data_rows // step) * step
        r_out = min(r_out, max(tb, r_fine))
    rtotal = hb + r_out + ha
    return rtotal, rtotal * L, hb * L
