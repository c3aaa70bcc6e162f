"""Compaction-free minimizer scan: clean windows on device, irregular windows
patched by the host.

Motivation (measured on TPU v5e at 16M elements): XLA scatter ~2s, variadic
stable sort ~200ms, elementwise/scan stages ~30-50ms. The exact semantics
need windows over *valid* k-mers, which naively requires compacting the valid
stream (a sort). This module removes compaction entirely:

- A window ending at valid k-mer position ``p`` whose last ``w`` *positions*
  are all valid k-mers is **clean**: its valid-index window equals the
  position window [p-w+1, p], so the two-block rightmost-argmin runs directly
  in position space (pure VPU work).
- Windows whose span contains an invalid k-mer position (``N`` runs, record
  junctions, record heads) are **irregular**. Their locations depend only on
  the base codes and record layout -- both host-known -- so the host
  enumerates them, computes their canonical hashes itself (vectorized table
  ntHash, `ops/host_hash.py`), resolves the exact rightmost-argmin per
  window, and ships a sparse z-patch to the device.
- Emission is the usual prefix-max over z, with z being the *flat position*
  of the window minimum: positions are strictly increasing in valid-index
  order, so the emission decisions match the reference exactly
  (`/root/reference/cpp/vendor/btllib/minimizer.cpp:44-48`).

Division of labor (keeps the device path lean):
- device: hashes, validity masks, window argmin, emission scan, extraction --
  elementwise/scan/top_k only; outputs emitted flat positions + their
  canonical hashes.
- host: record layout, irregular windows, final (record, position) mapping
  via searchsorted over record starts, and the cheap derived second hash.

Differentially tested against both the sort-based `scan_core` and the NumPy
oracle, including heavy-N and short-record cases.
"""
from __future__ import annotations

import functools
import logging

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

from ..ops.hashing import M64, MULTISHIFT, SEEDS, SEEDS_COMP, out_hash_mult
from .minimizer import (
    _combine_rmin,
    _select_seed,
    _shift_right,
    _srol_parts,
    _window_any,
    _window_xor,
    next_pow2,
)

_U64 = jnp.uint64
i32 = jnp.int32


def _u64(x: int):
    return jnp.uint64(x)


@functools.partial(jax.jit, static_argnames=('k', 'w', 'with_hashes'))
def scan_phase1(codes_aug, k: int, w: int, with_hashes: bool = True):
    """Device call 1: hashes + validity + clean-window argmin.

    Args:
        codes_aug: uint8[N]; bits 0..5 = base code (0..3 valid), bit 6 = the
            record-start flag; padding bytes are 255.
        with_hashes: also return the canonical hash halves; the hot path
            passes False (phase 2 recomputes hashes at emitted positions
            only), saving the 8 B/pos canon output arrays.

    Returns:
        (z_clean i32[N], c_lo u32[N], c_hi u32[N]) -- the canonical hash as
        split u32 halves, matching the Pallas kernel's output layout (joining
        to u64 would materialize an 8 B/pos array only to be gathered at
        ~1/100 density in phase 2; measured 63 ms per 32 Mbp chunk on TPU).
        (None, None) canon halves when ``with_hashes`` is False.
    """
    n = codes_aug.shape[0]
    iota = jnp.arange(n, dtype=i32)
    codes = codes_aug & jnp.uint8(63)
    is_start = (codes_aug & jnp.uint8(64)) != 0

    im33 = iota % 33
    im31 = iota % 31
    neg33 = (33 - im33) % 33
    neg31 = (31 - im31) % 31
    a = _srol_parts(_select_seed(codes, SEEDS), neg33, neg31)
    b = _srol_parts(_select_seed(codes, SEEDS_COMP), im33, im31)
    wf = _window_xor(a, k)
    wr = _window_xor(b, k)
    f33 = (im33 + (k - 1)) % 33
    f31 = (im31 + (k - 1)) % 31
    fwd = _srol_parts(wf, f33, f31)
    rev = _srol_parts(wr, neg33, neg31)
    canon = fwd + rev

    # validity without any per-base record scan: a k-mer is invalid iff its
    # window contains a non-ACGT base, or a record START strictly inside it
    # (cross-record window), or it runs past the buffer.
    invalid = codes > 3
    bad_base = _window_any(invalid, k)
    start_inside = (
        _window_any(jnp.concatenate([is_start[1:], jnp.asarray([False])]), k - 1)
        if k > 1 else jnp.zeros((n,), dtype=bool)
    )
    valid = (~bad_base) & (~start_inside) & (iota <= i32(n - k))

    # clean window: last w positions are all valid k-mers and contain no
    # record start (the start check matters only for k == 1, where junction
    # k-mers are not invalid; for k >= 2 it is implied but kept for a uniform
    # host/device blocker definition).
    blocker = (~valid) | is_start
    blk_fwd = _window_any(blocker, w)  # OR over [p, p+w-1]
    has_blocker_back = _shift_right(blk_fwd, w - 1, jnp.asarray(True))
    clean = valid & (iota >= i32(w - 1)) & (~has_blocker_back)

    # position-space two-block rightmost-argmin over width w
    mh = jnp.where(valid, canon, _u64(M64))
    idx = jnp.where(valid, iota, i32(-1))
    pad = (-n) % w
    if pad:
        mh_p = jnp.concatenate([mh, jnp.full((pad,), _u64(M64))])
        idx_p = jnp.concatenate([idx, jnp.full((pad,), i32(-1))])
    else:
        mh_p, idx_p = mh, idx
    rows = (n + pad) // w
    pm, pi = mh_p.reshape(rows, w), idx_p.reshape(rows, w)
    sm, si = pm, pi
    s = 1
    while s < w:
        lm = jnp.concatenate([jnp.full((rows, s), _u64(M64)), pm[:, :-s]], axis=1)
        li = jnp.concatenate([jnp.full((rows, s), i32(-1)), pi[:, :-s]], axis=1)
        pm, pi = _combine_rmin(lm, li, pm, pi)
        rm = jnp.concatenate([sm[:, s:], jnp.full((rows, s), _u64(M64))], axis=1)
        ri = jnp.concatenate([si[:, s:], jnp.full((rows, s), i32(-1))], axis=1)
        sm, si = _combine_rmin(sm, si, rm, ri)
        s <<= 1
    p_mh = pm.reshape(-1)[:n]
    p_idx = pi.reshape(-1)[:n]
    t_mh = _shift_right(sm.reshape(-1), w - 1, _u64(M64))[:n]
    t_idx = _shift_right(si.reshape(-1), w - 1, i32(-1))[:n]
    win_mh, win_idx = _combine_rmin(t_mh, t_idx, p_mh, p_idx)

    z_clean = jnp.where(clean & (win_mh != _u64(M64)), win_idx, i32(-1))
    if not with_hashes:
        return z_clean, None, None
    c_lo = (canon & _u64(0xFFFFFFFF)).astype(jnp.uint32)
    c_hi = (canon >> _u64(32)).astype(jnp.uint32)
    return z_clean, c_lo, c_hi


_EMIT_ROW = 1 << 13  # row width of the two-level emission extraction


def _emission_rows(z):
    """Row-blocked emission flags for a (patched) z stream.

    The emission rule -- candidate z strictly above the running max of all
    previous z (`/root/reference/cpp/vendor/btllib/minimizer.cpp:44-48`) --
    evaluated as a per-row cummax plus one exclusive cummax over row maxima.
    Shared by `scan_phase2` and the distributed count pre-pass
    (`parallel/distributed.py::_count_step`) so both see identical flags.

    Returns (zr [T, B], emit [T, B]).
    """
    n = z.shape[0]
    B = _EMIT_ROW
    pad = (-n) % B
    z_p = jnp.concatenate([z, jnp.full((pad,), i32(-1))]) if pad else z
    T = (n + pad) // B
    zr = z_p.reshape(T, B)
    cm = jax.lax.cummax(zr, axis=1)
    cmx = jnp.concatenate([jnp.full((T, 1), i32(-2)), cm[:, :-1]], axis=1)
    carry = jnp.concatenate(
        [jnp.full((1,), i32(-2)), jax.lax.cummax(cm[:, -1])[:-1]])
    emit = (zr >= 0) & (zr > cmx) & (zr > carry[:, None])
    return zr, emit


@functools.lru_cache(maxsize=None)
def _rot_seed_tables(k: int):
    """Pre-rotated per-offset seed tables for recomputing the canonical hash
    at a known position: fwd[j][c] = srol^(k-1-j)(SEED[c]),
    rev[j][c] = srol^j(SEED_COMP[c]) (u64 numpy constants, 5th row = 0 for
    out-of-range codes on dead lanes)."""
    from ..ops.hashing import srol

    fwd = np.zeros((k, 8), dtype=np.uint64)
    rev = np.zeros((k, 8), dtype=np.uint64)
    for j in range(k):
        for c in range(4):
            fwd[j, c] = srol(SEEDS[c], (k - 1 - j) % 1023)
            rev[j, c] = srol(SEEDS_COMP[c], j % 1023)
    return fwd, rev


def _canon_at_emitted(codes_aug, safe, k: int):
    """Canonical ntHash at the gathered (emitted) positions: k sparse gathers
    of the code stream + table folds. Emitted positions are valid k-mers by
    construction, so no validity masking is needed; dead lanes produce
    garbage that callers mask with ``live``."""
    fwd_t, rev_t = _rot_seed_tables(k)
    n = codes_aug.shape[0]
    codes = (codes_aug & jnp.uint8(63)).astype(i32)
    fwd = jnp.zeros(safe.shape, _U64)
    rev = jnp.zeros(safe.shape, _U64)
    for j in range(k):
        cj = jnp.minimum(codes[jnp.minimum(safe + j, n - 1)], i32(7))
        fwd = fwd ^ jnp.asarray(fwd_t[j])[cj]
        rev = rev ^ jnp.asarray(rev_t[j])[cj]
    return fwd + rev


def _pack_codes_u32(codes_aug):
    """Device repack of the (augmented) byte stream into the 2-bit/base u32
    layout of the native h2d transfer: word[i] bits 2j..2j+1 = codes[16i+j]&3
    (little-endian byte order, identical to `io/native` packing). Tail-padded
    with two extra words so the 3-word funnel gather in
    `_canon_at_emitted_packed` never reads out of bounds. Garbage 2-bit
    values at invalid/padding bytes are harmless: only valid k-mer positions
    are ever hashed (dead lanes are masked by callers)."""
    n = codes_aug.shape[0]
    pad = (-n) % 16
    c = (codes_aug & jnp.uint8(3)).astype(jnp.uint32)
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad,), jnp.uint32)])
    sh = jnp.arange(16, dtype=jnp.uint32) * jnp.uint32(2)
    w = jnp.sum(c.reshape(-1, 16) << sh[None, :], axis=1, dtype=jnp.uint32)
    return jnp.concatenate([w, jnp.zeros((2,), jnp.uint32)])


def _packed_u8_to_u32(packed_u8):
    """Bitcast the native 2-bit packed byte buffer (n/4 u8, n % 16 == 0) to
    the u32 word view `_canon_at_emitted_packed` gathers from, with the same
    +2-word tail pad as `_pack_codes_u32`."""
    pu32 = jax.lax.bitcast_convert_type(
        packed_u8.reshape(-1, 4), jnp.uint32).reshape(-1)
    return jnp.concatenate([pu32, jnp.zeros((2,), jnp.uint32)])


def _canon_at_emitted_packed(packed_u32, safe, k: int):
    """`_canon_at_emitted` reading the 2-bit packed stream: TWO u32 gathers
    (plus one for the funnel tail) instead of k byte gathers -- measured 5x
    faster at emit-cap 512K on TPU (benchmarks/r4/profile_phase2b.log:
    192 ms -> 39 ms), and the packed buffer is what h2d ships anyway.

    Requires k <= 32 (bases j < 16 decode from the lo funnel word, j < 32
    from hi). Bit-exact vs the byte path for valid positions (chip-verified);
    dead lanes produce garbage that callers mask with ``live``."""
    assert k <= 32, 'funnel decode covers k <= 32; use _canon_at_emitted'
    fwd_t, rev_t = _rot_seed_tables(k)
    fwd_j = jnp.asarray(np.ascontiguousarray(fwd_t[:, :4]))  # [k, 4] u64
    rev_j = jnp.asarray(np.ascontiguousarray(rev_t[:, :4]))
    base = safe >> 4                       # u32 word index (16 bases/word)
    # keep the funnel in PURE u32: a mixed u32>>i32 shift promotes to int64
    # under the package's jax_enable_x64 (exact but 64-bit emulated on the
    # VPU) and to an int32 ARITHMETIC shift without x64 (sign-extension
    # corrupts the spliced w1 bits) -- explicit u32 is exact either way
    sh = ((safe & i32(15)) << 1).astype(jnp.uint32)
    w0 = packed_u32[base]
    w1 = packed_u32[base + 1]
    w2 = packed_u32[base + 2]
    # funnel words: lo = bases 0..15 of the k-mer, hi = bases 16..31.
    # The splice shift is written (x << 1) << (31 - sh) so the sh == 0 arm
    # (masked off by the where) still computes a DEFINED value -- a plain
    # `x << (32 - sh)` would be a shift by 32 there, which XLA leaves
    # undefined per backend even in dead branches.
    one, t1 = jnp.uint32(1), jnp.uint32(31) - sh
    lo = jnp.where(sh > 0, (w0 >> sh) | ((w1 << one) << t1), w0)
    hi = jnp.where(sh > 0, (w1 >> sh) | ((w2 << one) << t1), w1)
    fwd = jnp.zeros(safe.shape, _U64)
    rev = jnp.zeros(safe.shape, _U64)
    for j in range(k):
        word = lo if j < 16 else hi
        cj = ((word >> jnp.uint32((j % 16) * 2)) & jnp.uint32(3)).astype(i32)
        fwd = fwd ^ fwd_j[j][cj]
        rev = rev ^ rev_j[j][cj]
    return fwd + rev


def _canon_dispatch(codes_aug, safe, k: int, packed_u8=None):
    """Pick the fastest exact canon-at-position path: native packed buffer
    when the caller has it on device, else an in-program repack (still ~3x
    the byte-gather path), else the k-byte-gather fallback for k > 32."""
    if k > 32:
        return _canon_at_emitted(codes_aug, safe, k)
    if packed_u8 is not None:
        return _canon_at_emitted_packed(_packed_u8_to_u32(packed_u8), safe, k)
    return _canon_at_emitted_packed(_pack_codes_u32(codes_aug), safe, k)


def extract_mode() -> str:
    """Resolve the emission-extraction variant from SEQWIN_TPU_EXTRACT
    ('topk' default; 'rank' and 'pfx' alternatives) with loud rejection of
    typos, so every engine path (per-chunk, fused, main distributed, and
    the sequence-sharded block program) A/Bs the same code. All four paths
    implement all three variants natively since round 4."""
    import os

    mode = os.environ.get('SEQWIN_TPU_EXTRACT', 'topk')
    if mode not in ('topk', 'rank', 'pfx'):
        raise ValueError(
            f"SEQWIN_TPU_EXTRACT={mode!r}: expected 'topk', 'rank' or 'pfx'")
    return mode


def use_pallas_phase1() -> bool:
    """Resolve the phase-1 implementation: the Mosaic kernel on real TPU
    backends, the XLA scan elsewhere; SEQWIN_TPU_PHASE1 overrides."""
    import os

    mode = os.environ.get('SEQWIN_TPU_PHASE1', 'auto')
    if mode == 'auto':
        return jax.default_backend() in ('tpu', 'axon')
    return mode == 'pallas'


def pfx_phase1(codes_aug, k: int, w: int, n_bases: int, offset: int,
               use_pallas: bool):
    """Phase 1 for the 'pfx' extraction: per-tile emission staircases
    (zpfx) + local ranks (lrank), from the Mosaic kernel on TPU or the XLA
    emulation elsewhere. Returns (zpfx, lrank, ts) ready for
    `scan_phase2_pfx`. Shared by every engine path (per-chunk, fused, main
    distributed, sequence-sharded blocks) so they A/B the same code."""
    if use_pallas:
        from .pallas_scan import L as _LANES, pallas_phase1

        interpret = jax.default_backend() not in ('tpu', 'axon')
        zpfx, lrank = pallas_phase1(
            codes_aug.reshape(-1, _LANES), k, w,
            interpret=interpret, with_hashes=False, out='pfx',
        )
        return zpfx, lrank, zpfx.shape[1]
    z_clean, _, _ = scan_phase1(codes_aug, k, w, with_hashes=False)
    ts = min(n_bases, 1 << 16)
    zpfx, lrank = pfx_from_z(z_clean, offset, ts)
    return zpfx, lrank, ts


@functools.partial(jax.jit, static_argnames=('offset', 'ts'))
def pfx_from_z(z, offset: int, ts: int):
    """XLA emulation of the kernel's 'pfx' outputs (non-TPU fallback and
    the differential oracle for the Mosaic ladders): tile-grid inclusive
    prefix-max of z and tile-local emission ranks, [T, ts] each."""
    body = z[offset:]
    # pad to a whole tile with -1 (no emissions, staircase-neutral) -- a
    # truncation here would silently drop the tail's minimizers whenever the
    # padded chunk size is not a tile multiple (non-pow2 chunk budgets)
    pad = (-body.shape[0]) % ts
    if pad:
        body = jnp.concatenate([body, jnp.full((pad,), i32(-1))])
    T = body.shape[0] // ts
    zt = body.reshape(T, ts)
    zpfx = jax.lax.cummax(zt, axis=1)
    prev = jnp.concatenate([jnp.full((T, 1), i32(-1)), zpfx[:, :-1]], axis=1)
    lrank = jnp.cumsum((zpfx > prev).astype(i32), axis=1)
    return zpfx, lrank


def _bsearch_rows(flat, row, tgt, ts: int, side_left: bool):
    """First in-row index where flat[row*ts + idx] >= tgt (side_left) or
    > tgt (not side_left); rows gathered point-wise (no [Q, ts] slices)."""
    lo = jnp.zeros_like(row)
    hi = jnp.full_like(row, i32(ts))
    steps = max(1, ts.bit_length())
    base = row * i32(ts)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        v = flat[base + jnp.minimum(mid, i32(ts - 1))]
        go = (v < tgt) if side_left else (v <= tgt)
        go = go & (mid < hi)
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    return lo


@functools.partial(jax.jit, static_argnames=('emit_cap', 'k', 'offset', 'ts'))
def scan_phase2_pfx(zpfx, lrank, codes_aug, patch_pos, patch_z, starts,
                    rec_base, asm_tab, emit_cap: int, k: int,
                    offset: int, ts: int, packed_u8=None):
    """Phase 2 with the emission scan already folded into phase 1: no
    N-wide XLA op remains -- everything here is tile-count (T), patch-count
    (pcap) or emit_cap scale gather arithmetic -- EXCEPT when no 2-bit
    packed buffer reaches `_canon_dispatch` (byte route, or a chunk size
    not divisible by 16): the canon recomputation then runs `_pack_codes_u32`,
    one N-wide repack, in-program. Every production caller passes
    ``packed_u8`` so the repack is a fallback, not the steady-state path.

    Foundation (also what `scan_phase2`'s global cummax rests on): the
    window-argmin sequence of one stream is a monotone staircase -- the
    rightmost-tie argmin advances monotonically under sliding within a
    record (`/root/reference/cpp/vendor/btllib/minimizer.cpp:44-48`), and
    positions grow across records. Emissions are therefore exactly the
    staircase's distinct values, and irregular-window patches merge in on
    the sparse side:

    - kernel tiles: per-tile staircase zpfx + local ranks lrank; the
      cross-tile carry is an exclusive max over T tile maxima, and the
      emissions a tile double-counts (its staircase re-climbing values the
      carry already passed) are exactly a PREFIX of its local emissions
      (K_t, one binary search per tile).
    - patches (values of windows the kernel marked dirty) form their own
      staircase (cummax over patch_z in position order); each side
      suppresses the other's non-advances, and final output slots are
      resolved by rank arithmetic over the two monotone lists.

    Returns (e_oh, e_pos, e_rec, count, e_asm) exactly like `scan_phase2`.
    """
    T = zpfx.shape[0]
    zp_flat = zpfx.reshape(-1)
    lr_flat = lrank.reshape(-1)
    n_grid = offset + T * ts

    # --- cross-tile carry + per-tile double-count correction K_t ---
    tile_max = zpfx[:, -1]
    carry = jnp.concatenate(
        [jnp.full((1,), i32(-1)),
         jax.lax.cummax(tile_max)[:-1]])
    rows = jnp.arange(T, dtype=i32)
    # last in-tile index with zpfx <= carry (monotone rows)
    q = _bsearch_rows(zp_flat, rows, carry, ts, side_left=False) - 1
    K = jnp.where(q >= 0, lr_flat[rows * i32(ts) + jnp.maximum(q, 0)], i32(0))
    local_cnt = lrank[:, -1]
    surv = local_cnt - K
    cum = jnp.cumsum(surv)
    count_g = cum[-1] if T else i32(0)

    # --- the j-th clean emission: tile, in-tile rank target, position ---
    j = jnp.arange(emit_cap, dtype=i32)
    t_j = jnp.searchsorted(cum, j, side='right').astype(i32)
    t_c = jnp.minimum(t_j, i32(T - 1))
    base = cum[t_c] - surv[t_c]
    tgt = j - base + K[t_c] + 1
    pos_in = _bsearch_rows(lr_flat, t_c, tgt, ts, side_left=True)
    pin_c = jnp.minimum(pos_in, i32(ts - 1))
    gv = zp_flat[t_c * i32(ts) + pin_c]            # emitted value (min pos)
    live_g = j < jnp.minimum(count_g, i32(emit_cap))
    gp = jnp.where(live_g, offset + t_c * i32(ts) + pos_in, i32(2 ** 30))

    # --- patch staircase (values of host-patched irregular windows) ---
    pcap = patch_pos.shape[0]
    pm = jax.lax.cummax(patch_z)
    pm_prev = jnp.concatenate([jnp.full((1,), i32(-1)), pm[:-1]])
    qp = jnp.minimum(jnp.maximum(patch_pos - i32(offset), 0), i32(T * ts - 1))
    tq = qp // i32(ts)
    g_at = jnp.maximum(zp_flat[qp], carry[tq])     # clean prefix at q
    in_grid = (patch_pos >= i32(offset)) & (patch_pos < i32(n_grid))
    flag_p = (pm > pm_prev) & (pm > g_at) & in_grid & (patch_z >= 0)
    pfs = jnp.cumsum(flag_p.astype(i32))
    count_p = pfs[-1] if pcap else i32(0)

    # --- cross-suppression + merge ranks (all monotone-list arithmetic) ---
    jq = jnp.searchsorted(patch_pos, gp, side='left').astype(i32)
    pmq = jnp.where(jq > 0, pm[jnp.maximum(jq - 1, 0)], i32(-1))
    sup_g = live_g & (pmq >= gv)
    keep_g = live_g & ~sup_g
    surv_ord = jnp.cumsum(keep_g.astype(i32))      # inclusive
    nsup = jnp.cumsum(sup_g.astype(i32))
    # patch ranks: #surviving G with position < q, + own survivor ordinal
    m_g = jnp.searchsorted(gp, patch_pos, side='left').astype(i32)
    gs_before = m_g - jnp.where(m_g > 0, nsup[jnp.maximum(m_g - 1, 0)], i32(0))
    rank_p = pfs - 1 + gs_before

    count = count_g - (nsup[-1] if emit_cap else i32(0)) + count_p
    # the suppression/merge bookkeeping (nsup, surv_ord, gp) only covers the
    # first emit_cap CLEAN emissions; if the clean count alone overflows,
    # patch suppressions could pull the reported total back under the cap
    # and the caller would accept a corrupt tail -- force the retry instead
    # (the topk path's cap_row bump is the same guard)
    count = jnp.where(count_g > i32(emit_cap),
                      jnp.maximum(count, i32(emit_cap + 1)), count)

    # --- resolve output slots ---
    r = jnp.arange(emit_cap, dtype=i32)
    # patch survivors by ordinal: strictly increasing final ranks
    ordp = jnp.searchsorted(pfs, jnp.arange(pcap, dtype=i32) + 1,
                            side='left').astype(i32)
    ordp_c = jnp.minimum(ordp, i32(pcap - 1))
    prank_ord = jnp.where(jnp.arange(pcap, dtype=i32) < count_p,
                          rank_p[ordp_c], i32(2 ** 30))
    pu = jnp.searchsorted(prank_ord, r, side='left').astype(i32)
    pu_c = jnp.minimum(pu, i32(pcap - 1))
    is_p = (pu < i32(pcap)) & (prank_ord[pu_c] == r)
    eidx_p = pm[ordp_c[pu_c]]
    # G survivor with ordinal (r - #patch survivors ranked below r)
    s_ord = r - pu
    gj = jnp.searchsorted(surv_ord, s_ord + 1, side='left').astype(i32)
    eidx_g = gv[jnp.minimum(gj, i32(emit_cap - 1))]
    live = r < jnp.minimum(count, i32(emit_cap))
    eidx = jnp.where(live, jnp.where(is_p, eidx_p, eidx_g), i32(-1))

    # --- identical mapping tail to scan_phase2 ---
    safe = jnp.clip(eidx, 0, codes_aug.shape[0] - 1)
    live_e = eidx >= 0
    e_canon = _canon_dispatch(codes_aug, safe, k, packed_u8)
    t = e_canon * _u64(out_hash_mult(k))
    e_oh = jnp.where(live_e, t ^ (t >> _u64(MULTISHIFT)), _u64(0))
    rec_local = jnp.searchsorted(starts, eidx, side='right').astype(i32) - 1
    rec_local = jnp.clip(rec_local, 0, starts.shape[0] - 1)
    e_pos = jnp.where(live_e, eidx - starts[rec_local], i32(0)).astype(jnp.uint32)
    e_rec = jnp.where(live_e, rec_local + rec_base, i32(-1))
    e_asm = jnp.where(live_e, asm_tab[rec_local], i32(0))
    return e_oh, e_pos, e_rec, count, e_asm


@functools.partial(jax.jit, static_argnames=('emit_cap', 'k', 'extract'))
def scan_phase2(z_clean, codes_aug, patch_pos, patch_z, starts, rec_base,
                asm_tab, emit_cap: int, k: int, extract: str = 'topk',
                packed_u8=None):
    """Device call 2: z-patch, emission prefix-max, two-level extraction, and
    the final (record, position, out-hash) mapping -- all device-resident so
    no per-chunk host round-trip is needed.

    The emission rule (candidate z strictly above the running max of all
    previous z, `/root/reference/cpp/vendor/btllib/minimizer.cpp:44-48`) is
    evaluated row-blocked: per row of ``_EMIT_ROW`` positions, a row-local
    cummax plus one exclusive cummax over row maxima reproduces the global
    running max exactly, and extraction runs as a cheap batched per-row
    ``top_k`` followed by a second-level ``top_k`` over the ~N/w candidate
    slots -- never over the full stream. Rows with more than ``cap_row``
    emissions force an emission-capacity retry (count > emit_cap), which
    doubles both caps; cap_row == row width makes overflow impossible, so the
    ladder terminates.

    Hashes are RECOMPUTED here, only at the emit-cap-sized gather
    (`_canon_at_emitted`): the phase-1 kernel then writes just z (4 B/pos
    instead of 12 B/pos of z + canon halves), which is most of its HBM
    traffic.

    Args:
        codes_aug: uint8[>= n - k] augmented code stream (bit 6 = record
            start; padding 255) -- the same array phase 1 scanned.
        starts: int32[S] record start offsets padded with a value > any
            position (used for the flat-position -> record searchsorted).
        rec_base: int32 scalar, global record index of this chunk's record 0.
        asm_tab: int32[S] local record index -> assembly index (host-built;
            padding entries may hold anything -- dead lanes are masked).

    Returns:
        (e_oh u64[emit_cap], e_pos u32[emit_cap], e_rec i32[emit_cap] (-1 pad),
         count i32, e_asm i32[emit_cap])
    """
    n = z_clean.shape[0]
    z = z_clean.at[patch_pos].set(patch_z, mode='drop')

    B = _EMIT_ROW
    zr, emit = _emission_rows(z)
    row_cnt = jnp.sum(emit.astype(i32), axis=1)
    count = jnp.sum(row_cnt)

    if extract == 'rank':
        # rank extraction: inclusive cumsum of emit flags is monotone, so the
        # stream position of the (j+1)-th emission is one searchsorted per
        # output slot; the emitted value is z at that position (the window
        # minimum's position). No top_k, no per-row capacity -- count exact.
        emit_flat = emit.reshape(-1)[:n]
        ranks = jnp.cumsum(emit_flat.astype(i32))
        j = jnp.arange(emit_cap, dtype=i32)
        at = jnp.searchsorted(ranks, j + 1, side='left').astype(i32)
        eidx = z[jnp.clip(at, 0, n - 1)]
        eidx = jnp.where(j < jnp.minimum(count, i32(emit_cap)), eidx, i32(-1))
    else:
        # per-row capacity scaled to the stream's expected emission density
        # (emit_cap encodes ~2.5 n / (w + 1)); doubles along the retry ladder
        cap_row = min(max(32, next_pow2(2 * emit_cap * B // max(n, 1) + 32)), B)
        count = jnp.where(jnp.max(row_cnt) > cap_row,
                          jnp.maximum(count, i32(emit_cap + 1)), count)
        zz = jnp.where(emit, zr, i32(-1))
        topv, _ = jax.lax.top_k(zz, cap_row)          # [T, cap_row] descending
        flat = topv[:, ::-1].reshape(-1)              # globally ascending reals
        if flat.shape[0] < emit_cap:
            flat = jnp.concatenate(
                [jnp.full((emit_cap - flat.shape[0],), i32(-1)), flat])
        top2, _ = jax.lax.top_k(flat, emit_cap)
        asc = top2[::-1]
        n_pad = emit_cap - jnp.minimum(count, i32(emit_cap))
        eidx = jnp.roll(asc, -n_pad)
    safe = jnp.clip(eidx, 0, codes_aug.shape[0] - 1)
    live = eidx >= 0
    e_canon = _canon_dispatch(codes_aug, safe, k, packed_u8)
    t = e_canon * _u64(out_hash_mult(k))
    e_oh = jnp.where(live, t ^ (t >> _u64(MULTISHIFT)), _u64(0))
    rec_local = jnp.searchsorted(starts, eidx, side='right').astype(i32) - 1
    rec_local = jnp.clip(rec_local, 0, starts.shape[0] - 1)
    e_pos = jnp.where(live, eidx - starts[rec_local], i32(0)).astype(jnp.uint32)
    e_rec = jnp.where(live, rec_local + rec_base, i32(-1))
    # assembly index for the aggregation stage: a host-built local-record ->
    # assembly table makes this one tiny gather (a second searchsorted here
    # measured ~60 ms per 32 Mbp chunk on TPU)
    e_asm = jnp.where(live, asm_tab[rec_local], i32(0))
    return e_oh, e_pos, e_rec, count, e_asm


@functools.partial(jax.jit, static_argnames=('n', 'offset'))
def _unpack_aug(packed, starts, inv, stream_end, n: int, offset: int):
    """Reconstruct the augmented code stream from a 2-bit packed transfer:
    unpack 4 bases/byte, mask the front/back padding, restore invalid bases
    (sparse), and set the record-start flag (bit 6, sparse)."""
    shifts = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    c = ((packed[:, None] >> shifts[None, :]) & jnp.uint8(3)).reshape(-1)
    iota = jnp.arange(n, dtype=i32)
    pad = (iota < i32(offset)) | (iota >= stream_end)
    c = jnp.where(pad, jnp.uint8(255), c)
    c = c.at[inv].set(jnp.uint8(255), mode='drop')
    c = c.at[starts].add(jnp.uint8(64), mode='drop')
    return c


def _host_layout(record_codes: list[np.ndarray], n: int, offset: int = 0):
    """Concatenate records at ``offset``; per-base codes + record-start offsets."""
    codes = np.full(n, 255, dtype=np.uint8)
    starts = np.zeros(len(record_codes), dtype=np.int64)
    off = offset
    for ri, c in enumerate(record_codes):
        L = len(c)
        codes[off:off + L] = c
        starts[ri] = off
        off += L
    return codes, starts


def _merge_intervals(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge overlapping/adjacent inclusive intervals."""
    if len(a) == 0:
        return a, b
    order = np.argsort(a, kind='stable')
    a, b = a[order], b[order]
    b_run = np.maximum.accumulate(b)
    new = np.ones(len(a), dtype=bool)
    new[1:] = a[1:] > b_run[:-1] + 1
    starts_i = np.flatnonzero(new)
    ends_i = np.append(starts_i[1:], len(a)) - 1
    return a[starts_i], b_run[ends_i]


class _SparseValidity:
    """Interval view of the invalid-k-mer set of one chunk.

    Built in O(#invalid-bases + #records); answers validity, rank, and
    rank->position queries with binary searches over merged intervals.
    The k-mer domain is [0, total - k].
    """

    def __init__(self, codes: np.ndarray, starts: np.ndarray, k: int, total: int,
                 inv_points: np.ndarray | None = None):
        self.k = k
        self.total = total
        self.last = total - k  # inclusive k-mer domain end (may be < 0)
        if inv_points is not None:
            inv = np.asarray(inv_points, dtype=np.int64)
            inv = inv[inv < total]
        else:
            # strip the record-start flag (bit 6) before the validity test
            inv = np.flatnonzero((codes[:total] & 63) > 3).astype(np.int64)
        a_parts = [np.maximum(inv - k + 1, 0)]
        b_parts = [np.minimum(inv, max(self.last, 0))]
        if k > 1 and len(starts) > 1:
            s = np.asarray(starts[1:], dtype=np.int64)
            a_parts.append(np.maximum(s - k + 1, 0))
            b_parts.append(np.minimum(s - 1, max(self.last, 0)))
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        keep = a <= b
        self.A, self.B = _merge_intervals(a[keep], b[keep])
        lens = self.B - self.A + 1
        self.cumlen = np.concatenate(([0], np.cumsum(lens)))

    def invalid_leq(self, x) -> np.ndarray:
        """#invalid k-mer positions <= x (vectorized)."""
        x = np.minimum(np.asarray(x, dtype=np.int64), self.last)
        if len(self.A) == 0:
            return np.zeros_like(x)
        j = np.searchsorted(self.A, x, side='right') - 1
        jc = np.maximum(j, 0)
        partial = np.clip(np.minimum(x, self.B[jc]) - self.A[jc] + 1, 0, None)
        out = np.where(j >= 0, self.cumlen[jc] + partial, 0)
        return np.where(x < 0, 0, out)

    def is_valid(self, pos: np.ndarray) -> np.ndarray:
        pos = np.asarray(pos, dtype=np.int64)
        ok = (pos >= 0) & (pos <= self.last)
        if len(self.A) == 0:
            return ok
        j = np.searchsorted(self.A, pos, side='right') - 1
        jc = np.maximum(j, 0)
        in_iv = (j >= 0) & (pos <= self.B[jc])
        return ok & ~in_iv

    def rank(self, pos) -> np.ndarray:
        """Global valid rank (0-based) of a valid k-mer position."""
        pos = np.asarray(pos, dtype=np.int64)
        return pos - self.invalid_leq(pos)

    def pos_of_rank(self, q) -> np.ndarray:
        """Position of the q-th (0-based) valid k-mer."""
        q = np.asarray(q, dtype=np.int64)
        if len(self.A) == 0:
            return q
        # gap g starts at B[g-1]+1 (gap 0 starts at 0); valid count before it
        gap_start = np.concatenate(([0], self.B + 1))
        valid_before = gap_start - np.concatenate(([0], self.cumlen[1:]))
        g = np.searchsorted(valid_before, q, side='right') - 1
        return gap_start[g] + (q - valid_before[g])


def _irregular_positions(sv: '_SparseValidity', starts: np.ndarray, w: int):
    """Positions of irregular window ends, sparsely.

    A window ending at valid k-mer ``p`` (with >= w valid k-mers so far in its
    record) is irregular iff a *blocker* -- an invalid k-mer position or a
    record start -- lies in [p-w+1, p]. Candidates are enumerated per merged
    blocker interval, so the cost is O(#blockers * w), independent of N.
    The blocker definition mirrors `scan_phase1`'s ``clean`` mask exactly.

    Returns sorted int64[Q].
    """
    starts64 = np.asarray(starts, dtype=np.int64)

    # blocker intervals = invalid k-mer intervals + [s, s] per record start
    blk_a = np.concatenate([sv.A, starts64])
    blk_b = np.concatenate([sv.B, np.minimum(starts64, sv.last)])
    keep = blk_a <= blk_b
    blk_a, blk_b = _merge_intervals(blk_a[keep], blk_b[keep])

    cand_list = [
        np.arange(a, min(b + w - 1, sv.last) + 1, dtype=np.int64)
        for a, b in zip(blk_a, blk_b)
    ]
    if not cand_list:
        return np.zeros(0, np.int64)
    cand = np.unique(np.concatenate(cand_list))
    cand = cand[sv.is_valid(cand)]
    if len(cand) == 0:
        return np.zeros(0, np.int64)

    # rank within record = global rank - valid count before the record start
    c_rec = np.searchsorted(starts64, cand, side='right') - 1
    rec_start = starts64[c_rec]
    vb = rec_start - sv.invalid_leq(rec_start - 1)
    rank_in_rec = sv.rank(cand) - vb
    return cand[rank_in_rec >= w - 1]


_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def host_patches(starts: np.ndarray, k: int, w: int, n: int,
                 total: int | None = None,
                 inv_points: np.ndarray | None = None,
                 codes: np.ndarray | None = None,
                 packed: np.ndarray | None = None):
    """Irregular windows and their exact rightmost-argmin patches, on host.

    The device phase-1 scan assumes every window of w consecutive positions
    is w consecutive VALID k-mers of ONE record; windows near blockers
    (invalid bases, record starts) violate that and are patched here. The
    argmin runs as a sliding-window rightmost-min in *valid-rank space*:
    candidate windows are grouped into contiguous rank ranges, each needed
    rank is hashed ONCE, and a two-block (per-block prefix/suffix rightmost
    argmin) pass answers every window -- O(Q + w * #groups) hashed positions.
    The previous [Q, w] member-matrix design hashed O(Q * w) positions,
    which at realistic N densities (assembly gaps) meant GBs of member
    positions and minutes of host time per chunk (measured: 194 Ns in
    9.4 Mbp -> 38k windows -> 62 s; this path: ~100x fewer hashes).

    Exactly one of ``codes`` (augmented byte stream) / ``packed`` (2-bit
    stream, requires ``inv_points``) supplies the hash input.

    Returns (irr_pos int32[Q], patch_z int32[Q]); ``patch_z`` is the stream
    position of each window's rightmost minimal member (-1 = no minimum,
    defensive parity with the legacy guard).
    """
    if total is None:
        total = n
    sv = _SparseValidity(codes, starts, k, total, inv_points=inv_points)
    empty = (np.zeros(0, np.int32), np.zeros(0, np.int32))
    if sv.last < 0:
        return empty
    irr_pos = _irregular_positions(sv, starts, w)
    Q = len(irr_pos)
    if Q == 0:
        return empty

    # group windows into contiguous rank ranges: window ends at rank r cover
    # [r-w+1, r]; consecutive ends <= w ranks apart share one range
    ranks = sv.rank(irr_pos)
    brk = np.empty(Q, bool)
    brk[0] = True
    brk[1:] = np.diff(ranks) > w
    gid = np.cumsum(brk) - 1
    first = np.flatnonzero(brk)
    last_i = np.append(first[1:], Q) - 1
    lo = ranks[first] - (w - 1)          # >= 0: rank_in_rec >= w-1
    hi = ranks[last_i]
    lens = hi - lo + 1
    flat_off = np.concatenate(([0], np.cumsum(lens)))
    r_tot = int(flat_off[-1])

    # hash every needed rank once
    all_ranks = np.arange(r_tot, dtype=np.int64) + np.repeat(lo - flat_off[:-1], lens)
    pos = sv.pos_of_rank(all_ranks)
    if packed is not None:
        from ..ops.host_hash import canon_at_packed

        h = canon_at_packed(packed, pos, k)
    else:
        from ..ops.host_hash import canon_at

        h = canon_at(codes, pos, k)

    # two-block sliding rightmost-min over the flat rank array (block = w):
    # a window [s, e=s+w-1] is exactly suffix-of-block(s) + prefix-of-block(e),
    # and both parts lie inside [s, e], so blocks spanning group boundaries
    # never leak values into any real window. Sentinel pad never queried.
    nb = -(-r_tot // w)
    hh = np.full(nb * w, _SENTINEL, np.uint64)
    hh[:r_tot] = h
    hh = hh.reshape(nb, w)
    iota = np.arange(w)
    # L: rightmost argmin of block[0..j] -- flag where h equals its running
    # min (ties re-flag: rightmost wins), then last flagged index
    runmin = np.minimum.accumulate(hh, axis=1)
    lidx = np.maximum.accumulate(
        np.where(hh == runmin, iota[None, :], -1), axis=1)
    # R: rightmost argmin of block[j..end] -- in reversed coords the
    # rightmost tie is the LAST strict improvement of the running min
    rev = hh[:, ::-1]
    runminr = np.minimum.accumulate(rev, axis=1)
    rflag = np.empty(rev.shape, bool)
    rflag[:, 0] = True
    rflag[:, 1:] = runminr[:, 1:] < runminr[:, :-1]
    ridx_rev = np.maximum.accumulate(np.where(rflag, iota[None, :], -1), axis=1)

    f_e = flat_off[gid] + (ranks - lo[gid])
    f_s = f_e - (w - 1)
    be, ce = np.divmod(f_e, w)
    bs, cs = np.divmod(f_s, w)
    lmin = runmin[be, ce]
    lflat = be * w + lidx[be, ce]
    crev = w - 1 - cs
    rmin = runminr[bs, crev]
    rflat = bs * w + (w - 1 - ridx_rev[bs, crev])
    use_l = lmin <= rmin  # L part is the right half: ties stay rightmost
    zflat = np.where(use_l, lflat, rflat)
    zmin = np.minimum(lmin, rmin)
    z_rank = zflat - flat_off[gid] + lo[gid]
    z_pos = sv.pos_of_rank(z_rank)
    patch_z = np.where(zmin == _SENTINEL, -1, z_pos).astype(np.int32)
    return irr_pos.astype(np.int32), patch_z


def _asm_table(record_offsets, rec_base: int, n_records: int, cap: int) -> np.ndarray:
    """int32[cap] table: local record index -> assembly index.

    Built from the global cumulative record counts (`record_offsets`) for the
    records [rec_base, rec_base + n_records); padding rows hold the last
    assembly (harmless -- consumers mask dead lanes).
    """
    tab = np.zeros(cap, dtype=np.int32)
    if record_offsets is not None and n_records:
        off_h = np.asarray(record_offsets, dtype=np.int64)
        recs = rec_base + np.arange(n_records, dtype=np.int64)
        tab[:n_records] = np.clip(
            np.searchsorted(off_h, recs, side='right') - 1, 0, len(off_h) - 2
        ).astype(np.int32)
        tab[n_records:] = tab[max(n_records - 1, 0)]
    return tab


def scan_chunk_device(
    record_codes: list[np.ndarray],
    k: int,
    w: int,
    rec_base: int = 0,
    min_chunk: int = 1 << 16,
    defer_sync: bool = False,
    record_offsets=None,
):
    """Scan one chunk; emitted minimizers stay device-resident.

    With ``defer_sync`` the emitted count is returned as a device scalar and
    no overflow check happens here -- the caller checks all counts at the end
    and re-runs any overflowed chunk (`rescan_chunk`), which lets host prep of
    the next chunk overlap device compute of this one.

    Returns:
        (e_oh, e_pos, e_rec, count, e_asm) device arrays padded to the
        emission capacity (e_rec == -1 on padding; record ids are global via
        ``rec_base``); ``count`` is an int, or a device scalar when
        defer_sync. ``e_asm`` is the per-entry assembly index when
        ``record_offsets`` is given (else zeros).
    """
    total = int(sum(len(c) for c in record_codes))
    if total == 0 or not record_codes:
        return None, None, None, 0, None
    from . import timeline

    timeline.mark('prep_start', rec_base=rec_base, bases=total)

    # the fused Mosaic kernel is the fast path on real TPUs; elsewhere the
    # XLA phase-1 avoids the (slow) pallas interpreter
    use_pallas = use_pallas_phase1()
    # Pad every chunk of a run to the same bucket (min_chunk = the chunk
    # budget): remote-compile round-trips dominate warmup, so one shape per
    # program beats tighter padding.
    if use_pallas:
        from .pallas_scan import pallas_phase1, phase1_shapes

        rtotal, n, offset = phase1_shapes(max(total, min_chunk), k, w)
    else:
        n = max(min_chunk, next_pow2(total))
        offset = 0
    stream_end = offset + total

    # layout: native packed transfer (2 bits/base + sparse exceptions) when
    # the C++ library is available, else the plain augmented byte stream
    from ..io import native

    laid = native.layout_chunk_packed(record_codes, n, offset) if n % 4 == 0 else None
    if laid is not None:
        packed, starts, inv_rec = laid
        inv_points = np.concatenate([np.arange(offset, dtype=np.int64), inv_rec])
        irr_pos, patch_z = host_patches(
            starts, k, w, n, total=stream_end, inv_points=inv_points,
            packed=packed,
        )

        starts_u = np.unique(starts)  # empty records share start offsets
        sucap = max(64, next_pow2(len(starts_u)))
        starts_ua = np.full(sucap, n, dtype=np.int32)
        starts_ua[:len(starts_u)] = starts_u
        icap = max(256, next_pow2(len(inv_rec) or 1))
        inv_a = np.full(icap, n, dtype=np.int32)
        inv_a[:len(inv_rec)] = inv_rec
        timeline.mark('h2d_submit', rec_base=rec_base, bytes=packed.nbytes)
        packed_d = jnp.asarray(packed)
        timeline.mark('h2d_returned', rec_base=rec_base)
        codes_aug = _unpack_aug(
            packed_d, jnp.asarray(starts_ua), jnp.asarray(inv_a),
            jnp.int32(stream_end), n, offset,
        )
        # phase 2 re-reads the packed buffer for the canon-hash funnel
        # gathers (needs n % 16 for the u32 view); measured 5x over the
        # byte-gather path (benchmarks/r4/profile_phase2b.log)
        if n % 16:
            packed_d = None
    else:
        codes, starts = _host_layout(record_codes, n, offset=offset)
        codes[starts] |= 64
        irr_pos, patch_z = host_patches(
            starts, k, w, n, total=stream_end, codes=codes,
        )
        codes_aug = jnp.asarray(codes)
        packed_d = None

    scap = max(64, next_pow2(len(starts)))
    starts_a = np.full(scap, n, dtype=np.int32)
    starts_a[:len(starts)] = starts
    starts_j = jnp.asarray(starts_a)
    extract = extract_mode()
    zpfx = lrank = None
    ts_pfx = 0
    if use_pallas:
        # compiled Mosaic needs a TPU; fall back to the interpreter elsewhere
        interpret = jax.default_backend() not in ('tpu', 'axon')
        from .pallas_scan import L as _LANES

        if extract == 'pfx':
            # emission scan folded into the kernel: tile staircase + ranks
            zpfx, lrank = pallas_phase1(
                codes_aug.reshape(rtotal, _LANES), k, w, interpret=interpret,
                with_hashes=False, out='pfx',
            )
            ts_pfx = zpfx.shape[1]
            z_clean = None
        else:
            # z-only kernel output: phase 2 recomputes hashes at emissions
            z_clean, _, _ = pallas_phase1(
                codes_aug.reshape(rtotal, _LANES), k, w, interpret=interpret,
                with_hashes=False,
            )
            tail = n - z_clean.shape[0]
            if tail:
                z_clean = jnp.concatenate([z_clean, jnp.full((tail,), i32(-1))])
    else:
        z_clean, _, _ = scan_phase1(codes_aug, k, w, with_hashes=False)
        if extract == 'pfx':
            ts_pfx = min(n, 1 << 16)
            zpfx, lrank = pfx_from_z(z_clean, offset, ts_pfx)
            z_clean = None

    pcap = max(256, next_pow2(len(irr_pos) or 1))
    patch_pos_a = np.full(pcap, n, dtype=np.int32)
    patch_z_a = np.full(pcap, -1, dtype=np.int32)
    patch_pos_a[:len(irr_pos)] = irr_pos
    patch_z_a[:len(irr_pos)] = patch_z

    # local record -> assembly table, aligned with `starts` (shared shape)
    off_j = jnp.asarray(_asm_table(record_offsets, rec_base, len(starts), scap))

    # size the emission capacity from the padded buffer so all chunks of a
    # run share one phase-2 shape
    emit_cap = min(max(1 << 12, next_pow2(int(2.5 * n / (w + 1)) + 64)), n)

    def phase2(cap):
        if extract == 'pfx':
            return scan_phase2_pfx(
                zpfx, lrank, codes_aug, jnp.asarray(patch_pos_a),
                jnp.asarray(patch_z_a), starts_j, jnp.int32(rec_base), off_j,
                cap, k, offset, ts_pfx, packed_u8=packed_d,
            )
        return scan_phase2(
            z_clean, codes_aug, jnp.asarray(patch_pos_a), jnp.asarray(patch_z_a),
            starts_j, jnp.int32(rec_base), off_j, cap, k, extract,
            packed_u8=packed_d,
        )

    if defer_sync:
        res = phase2(emit_cap)  # count is a device scalar
        timeline.mark('dispatched', rec_base=rec_base)
        return res
    while True:
        e_oh, e_pos, e_rec, count, e_asm = phase2(emit_cap)
        count = int(count)
        if count <= emit_cap:
            return e_oh, e_pos, e_rec, count, e_asm
        emit_cap = next_pow2(count)


def _record_block_plan(codes: np.ndarray, k: int, w: int, budget: int):
    """Host: split one oversized record into exact scan blocks with halos.

    Each block re-scans a halo of exactly w-1 valid k-mers preceding its
    first new window, so every window the block emits for is fully visible.
    Returns [(slice_start, slice_stop), ...] in record coordinates, or None
    when splitting is degenerate (few valid k-mers).
    """
    L = len(codes)
    nk = L - k + 1
    if nk <= 0:
        return None
    bad = codes > 3
    cb = np.cumsum(bad, dtype=np.int64)
    badin = cb[k - 1:].copy()
    badin[1:] -= cb[:nk - 1]
    vpos = np.flatnonzero(badin == 0)
    m = len(vpos)
    if m < w + 1:
        return None
    blocks = []
    e_prev = w - 2  # last window-ending rank already handled
    start = 0
    while e_prev < m - 1:
        target = start + budget
        e = int(np.searchsorted(vpos, target - k, side='right')) - 1
        e = min(max(e, e_prev + 1), m - 1)
        blocks.append((start, min(L, int(vpos[e]) + k)))
        start = int(vpos[min(max(0, e - w + 2), m - 1)])  # w-1 valid-kmer halo
        e_prev = e
    return blocks


@jax.jit
def _block_adjust(oh, pos, rec, asm, count, off, carry):
    """Rebase a block's emissions to record coordinates and drop the halo's
    re-emissions (positions <= carry, always a prefix: emissions ascend)."""
    idx = jnp.arange(pos.shape[0], dtype=i32)
    valid = idx < count
    gpos = pos.astype(jnp.int64) + off
    keep = valid & (gpos > carry)
    n_keep = jnp.sum(keep.astype(i32))
    n_drop = count - n_keep
    oh2 = jnp.roll(oh, -n_drop)
    pos2 = jnp.roll(gpos.astype(jnp.uint32), -n_drop)
    rec2 = jnp.where(idx < n_keep, jnp.roll(rec, -n_drop), i32(-1))
    asm2 = jnp.roll(asm, -n_drop)
    has = n_keep > 0
    new_carry = jnp.where(has, gpos[jnp.maximum(count - 1, 0)], carry)
    last_oh = oh2[jnp.maximum(n_keep - 1, 0)]
    return oh2, pos2, rec2, asm2, n_keep, new_carry, oh2[0], last_oh


def scan_record_blocks(
    codes: np.ndarray,
    k: int,
    w: int,
    rec_idx: int,
    budget: int,
    min_chunk: int = 1 << 16,
    record_offsets=None,
):
    """Exact chunked scan of ONE record larger than the chunk budget.

    Sequence-length scaling (SURVEY.md §2.3): the reference streams a whole
    record through one thread's ring buffer (`cpp/src/seqwin/graph.cpp:106-110`),
    so record length is bounded only by host RAM. Here a long record is cut
    into blocks that each fit the device chunk budget. Exactness argument:
    the rightmost-min window argmin position is monotone non-decreasing as
    the window slides, so the global emission state at any cut is fully
    captured by one scalar -- the last emitted position (carry). Each block
    is scanned with a halo of w-1 preceding valid k-mers; candidates at
    positions <= carry are exactly the halo's re-emissions and are dropped.

    Returns (chunk_tuples, bridge_pairs): finalized (oh, pos, rec, count,
    asm) 5-tuples for `aggregate_device`, plus (u, v, assembly) adjacency
    pairs for edges spanning block junctions (lost to chunk padding in the
    concatenated stream).
    """
    codes = np.asarray(codes)
    plan = _record_block_plan(codes, k, w, budget)
    if plan is None or len(plan) <= 1:
        res = scan_chunk_device(
            [codes], k, w, rec_idx, min_chunk, record_offsets=record_offsets
        )
        return [res], []
    if record_offsets is not None:
        off_h = np.asarray(record_offsets, dtype=np.int64)
        asm_idx = int(np.searchsorted(off_h, rec_idx, side='right') - 1)
    else:
        asm_idx = 0

    results, pairs = [], []
    carry = -1
    carry_oh = None
    for b0, b1 in plan:
        r = scan_chunk_device(
            [codes[b0:b1]], k, w, rec_idx, min_chunk, defer_sync=True,
            record_offsets=record_offsets,
        )
        count = int(np.asarray(r[3]))
        if count > r[0].shape[0]:  # emission-capacity overflow: exact re-run
            r = scan_chunk_device(
                [codes[b0:b1]], k, w, rec_idx, min_chunk,
                record_offsets=record_offsets,
            )
            count = int(r[3])
        oh2, pos2, rec2, asm2, n_keep, new_carry, first_oh, last_oh = _block_adjust(
            r[0], r[1], r[2], r[4], jnp.int32(count), jnp.int64(b0), jnp.int64(carry)
        )
        n_keep = int(np.asarray(n_keep))
        if n_keep > 0:
            f_oh = int(np.asarray(first_oh))
            if carry_oh is not None:
                pairs.append((min(carry_oh, f_oh), max(carry_oh, f_oh), asm_idx))
            carry_oh = int(np.asarray(last_oh))
            carry = int(np.asarray(new_carry))
            results.append((oh2, pos2, rec2, n_keep, asm2))
    return results, pairs


def scan_records_hybrid(
    record_codes: list[np.ndarray],
    k: int,
    w: int,
    min_chunk: int = 1 << 16,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host driver for the hybrid scan. Same contract as
    `minimizer.scan_records_host` (exact, scan-ordered emissions)."""
    e_oh, e_pos, e_rec, count, _ = scan_chunk_device(record_codes, k, w, 0, min_chunk)
    if e_oh is None:
        return (np.zeros(0, np.uint64), np.zeros(0, np.uint32), np.zeros(0, np.int32))
    return (
        np.asarray(e_oh[:count]),
        np.asarray(e_pos[:count]),
        np.asarray(e_rec[:count]),
    )
