"""Data-parallel ntHash + minimizer selection (pure XLA, native uint64).

This is the TPU-native re-expression of the reference's sequential hot loop
(`/root/reference/cpp/vendor/btllib/nthash_kmer.hpp:315-333` rolling hash, one
base per iteration; `/root/reference/cpp/vendor/btllib/minimizer.cpp:14-90`
ring-buffer window minimum). Instead of rolling, every k-mer hash is computed
independently via the closed form (see `ops/hashing.py`):

    fwd(p) = srol^{k-1+p mod 1023}( XOR_{j=p..p+k-1} srol^{-j mod 1023}(SEED[s_j]) )
    rev(p) = srol^{-p mod 1023}   ( XOR_{j=p..p+k-1} srol^{+j mod 1023}(COMP[s_j]) )

The per-position rotation amounts reduce mod 33 / mod 31 independently, so
everything is elementwise VPU work. The windowed XOR of width k is built with
an O(log k) disjoint-decomposition ladder; the w-wide rightmost-argmin uses
the classic two-block prefix/suffix scan; emission ("position advanced") is a
single prefix-max.

All records of a chunk are processed in one flat concatenated stream --
record boundaries are enforced through a per-base record-ordinal array, and
the emission prefix-max needs no per-record reset because compacted k-mer
indices are globally increasing across records (a later record's candidates
always exceed every earlier record's running maximum).

Works on any JAX backend; requires jax_enable_x64 (native uint64 is supported
by XLA:TPU, where it lowers to 32-bit pairs).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.hashing import M64, MULTISHIFT, SEEDS, SEEDS_COMP, out_hash_mult

_U64 = jnp.uint64


def _u64(x: int):
    return jnp.uint64(x)


def _srol_parts(x, r33, r31):
    """Split-rotate uint64 ``x`` left by per-element amounts (r33 in [0,33),
    r31 in [0,31)), matching btllib srol semantics
    (`hashing_internals.hpp:29-51`)."""
    m33 = _u64((1 << 33) - 1)
    m31 = _u64((1 << 31) - 1)
    lo = x & m33
    hi = x >> _u64(33)
    r33 = r33.astype(_U64)
    r31 = r31.astype(_U64)
    lo = ((lo << r33) | (lo >> (_u64(33) - r33))) & m33
    hi = ((hi << r31) | (hi >> (_u64(31) - r31))) & m31
    return (hi << _u64(33)) | lo


def _select_seed(codes, seeds):
    """codes uint8 (0..3, 255) -> uint64 seed; invalid -> 0 (SEED_N)."""
    out = jnp.where(codes == 0, _u64(seeds[0]), _u64(0))
    out = jnp.where(codes == 1, _u64(seeds[1]), out)
    out = jnp.where(codes == 2, _u64(seeds[2]), out)
    out = jnp.where(codes == 3, _u64(seeds[3]), out)
    return out


def _shift_left(arr, m, fill):
    """out[i] = arr[i+m] (fill past the end). Static m."""
    if m == 0:
        return arr
    return jnp.concatenate([arr[m:], jnp.full((m,), fill, dtype=arr.dtype)])


def _shift_right(arr, m, fill):
    """out[i] = arr[i-m] (fill before the start). Static m."""
    if m == 0:
        return arr
    return jnp.concatenate([jnp.full((m,), fill, dtype=arr.dtype), arr[:-m]])


def _window_xor(a, k: int):
    """W[p] = XOR of a[p..p+k-1], via disjoint binary decomposition of k
    (XOR windows must not overlap: overlap cancels)."""
    result = None
    result_len = 0
    power = a  # window of length 2^j starting at p
    j = 0
    kk = k
    while kk:
        if kk & 1:
            if result is None:
                result = power
                result_len = 1 << j
            else:
                result = result ^ _shift_left(power, result_len, _u64(0))
                result_len += 1 << j
        kk >>= 1
        if kk:
            power = power ^ _shift_left(power, 1 << j, _u64(0))
            j += 1
    return result


def _window_any(flags, k: int):
    """OR over flags[p..p+k-1]; overlap-tolerant doubling."""
    span = 1
    acc = flags
    while span < k:
        step = min(span, k - span)
        acc = acc | _shift_left(acc, step, jnp.asarray(True))
        span += step
    return acc


def _combine_rmin(lmh, lidx, rmh, ridx):
    """Rightmost-min combine: pick the right element iff r.mh <= l.mh.
    Mirrors the ``<=`` tie-break of the reference rescan
    (`minimizer.cpp:36-38`)."""
    take_r = rmh <= lmh
    return jnp.where(take_r, rmh, lmh), jnp.where(take_r, ridx, lidx)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ScanResult:
    out_hash: jax.Array  # uint64[emit_cap]
    pos: jax.Array       # uint32[emit_cap]
    rec: jax.Array       # int32[emit_cap]  (-1 = padding)
    count: jax.Array     # int64 scalar: number of emitted minimizers


def scan_core(codes, is_start, k: int, w: int, emit_cap: int) -> ScanResult:
    """Emit minimizers for a flat stream of concatenated records.

    Args:
        codes: uint8[N] base codes (0..3 bases, 255 invalid/padding).
        is_start: bool[N], True at the first base of every record. The first
            element must be True (or the stream empty of records).
        k, w: k-mer length and minimizer window (static).
        emit_cap: static output capacity. If the true count exceeds it the
            result is truncated -- check ``count`` and retry with a larger cap.

    Returns:
        ScanResult with emitted (out_hash, pos-within-record, record-ordinal)
        in genome scan order, padded to emit_cap.
    """
    n = codes.shape[0]
    i64 = jnp.int64
    iota = jnp.arange(n, dtype=i64)

    # --- per-base record ordinal and in-record position ---
    rec = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    rec_start = jax.lax.cummax(jnp.where(is_start, iota, i64(0)))
    base_pos = iota - rec_start

    # --- per-base rotated seeds (common-frame trick) ---
    im33 = (iota % 33).astype(jnp.int32)
    im31 = (iota % 31).astype(jnp.int32)
    neg33 = (33 - im33) % 33
    neg31 = (31 - im31) % 31
    a = _srol_parts(_select_seed(codes, SEEDS), neg33, neg31)
    b = _srol_parts(_select_seed(codes, SEEDS_COMP), im33, im31)

    # --- windowed XOR of width k, then rotate into final frame ---
    wf = _window_xor(a, k)
    wr = _window_xor(b, k)
    f33 = ((im33 + (k - 1)) % 33).astype(jnp.int32)
    f31 = ((im31 + (k - 1)) % 31).astype(jnp.int32)
    fwd = _srol_parts(wf, f33, f31)
    rev = _srol_parts(wr, neg33, neg31)
    canon = fwd + rev
    t = canon * _u64(out_hash_mult(k))
    oh = t ^ (t >> _u64(MULTISHIFT))

    # --- k-mer validity (N-handling + record containment) ---
    invalid = codes > 3
    bad_win = _window_any(invalid, k)
    rec_end = _shift_left(rec, k - 1, jnp.int32(-1))
    valid = (~bad_win) & (rec == rec_end) & (iota <= i64(n - k)) & (rec >= 0)

    # --- compaction of valid k-mers (order preserved) ---
    # One stable sort on the validity flag: TPU scatter is pathologically slow
    # (~10x a variadic sort at 16M elements), so compaction is sort-based.
    # (pos, rec) ride along packed into one u64 lane.
    inv_key = (~valid).astype(jnp.uint8)
    mh_in = jnp.where(valid, canon, _u64(M64))
    oh_in = jnp.where(valid, oh, _u64(0))
    pr_in = jnp.where(
        valid,
        ((rec.astype(_U64) + _u64(1)) << _u64(32)) | base_pos.astype(_U64),
        _u64(0),
    )
    _, mh_c, oh_c, pr_c = jax.lax.sort(
        (inv_key, mh_in, oh_in, pr_in), num_keys=1, is_stable=True
    )
    pos_c = (pr_c & _u64(0xFFFFFFFF)).astype(i64)
    rec_c = (pr_c >> _u64(32)).astype(jnp.int32) - 1

    # --- w-window rightmost-argmin via two-block prefix/suffix scans ---
    pad = (-n) % w
    if pad:
        mh_p = jnp.concatenate([mh_c, jnp.full((pad,), _u64(M64))])
        idx_p = jnp.concatenate([jnp.arange(n, dtype=i64), jnp.full((pad,), i64(-1))])
    else:
        mh_p = mh_c
        idx_p = jnp.arange(n, dtype=i64)
    rows = (n + pad) // w
    pm = mh_p.reshape(rows, w)
    pi = idx_p.reshape(rows, w)
    sm, si = pm, pi
    s = 1
    while s < w:
        # prefix: combine(left-shifted-in, self); suffix: combine(self, right)
        lm = jnp.concatenate([jnp.full((rows, s), _u64(M64)), pm[:, :-s]], axis=1)
        li = jnp.concatenate([jnp.full((rows, s), i64(-1)), pi[:, :-s]], axis=1)
        pm, pi = _combine_rmin(lm, li, pm, pi)
        rm = jnp.concatenate([sm[:, s:], jnp.full((rows, s), _u64(M64))], axis=1)
        ri = jnp.concatenate([si[:, s:], jnp.full((rows, s), i64(-1))], axis=1)
        sm, si = _combine_rmin(sm, si, rm, ri)
        s <<= 1
    p_mh = pm.reshape(-1)[:n]
    p_idx = pi.reshape(-1)[:n]
    s_mh = sm.reshape(-1)
    s_idx = si.reshape(-1)
    # window ending at i: suffix of previous block starting at i-w+1 + prefix
    t_mh = _shift_right(s_mh, w - 1, _u64(M64))[:n]
    t_idx = _shift_right(s_idx, w - 1, i64(-1))[:n]
    off = jnp.arange(n, dtype=jnp.int32) % w
    full_block = off == (w - 1)
    c_mh, c_idx = _combine_rmin(t_mh, t_idx, p_mh, p_idx)
    win_mh = jnp.where(full_block, p_mh, c_mh)
    win_idx = jnp.where(full_block, p_idx, c_idx)

    # window validity: w valid k-mers, all in one record
    rec_left = _shift_right(rec_c, w - 1, jnp.int32(-2))
    iota_n = jnp.arange(n, dtype=i64)
    win_ok = (iota_n >= i64(w - 1)) & (rec_left == rec_c) & (rec_c >= 0)

    # --- emission: candidate index must exceed running max (minimizer.cpp:44-48) ---
    z = jnp.where(win_ok & (win_mh != _u64(M64)), win_idx, i64(-1))
    cmax_excl = _shift_right(jax.lax.cummax(z), 1, i64(-2))
    emit_win = (z >= 0) & (z > cmax_excl)

    # Extract emitted entry indices with top_k (scatter-free): emitted indices
    # are distinct, so the emit_cap largest z values, reversed, are exactly the
    # emitted entries in ascending (scan) order.
    count = jnp.sum(emit_win.astype(i64))
    zz = jnp.where(emit_win, z, i64(-1))
    topv, _ = jax.lax.top_k(zz, emit_cap)
    asc = topv[::-1]  # ascending, padded with -1 at the front
    n_pad = emit_cap - jnp.minimum(count, i64(emit_cap))
    eidx = jnp.roll(asc, -n_pad)  # real entries first, -1 padding at the end
    safe = jnp.clip(eidx, 0, n - 1)
    live = eidx >= 0
    e_oh = jnp.where(live, oh_c[safe], _u64(0))
    e_pos = jnp.where(live, pos_c[safe], i64(0))
    e_rec = jnp.where(live, rec_c[safe], jnp.int32(-1))
    return ScanResult(e_oh, e_pos.astype(jnp.uint32), e_rec, count)


scan_minimizers = functools.partial(jax.jit, static_argnames=('k', 'w', 'emit_cap'))(scan_core)


def next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def scan_records_host(
    record_codes: list[np.ndarray],
    k: int,
    w: int,
    min_chunk: int = 1 << 16,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host driver: concatenate records, pad to a bucketed size, run the device
    scan, and return numpy (out_hash u64, pos u32, rec i32) in scan order.

    Retries with a larger emit capacity if the first guess is exceeded.
    """
    total = int(sum(len(c) for c in record_codes))
    if total == 0 or not record_codes:
        return (np.zeros(0, np.uint64), np.zeros(0, np.uint32), np.zeros(0, np.int32))
    n = max(min_chunk, next_pow2(total))
    codes = np.full(n, 255, dtype=np.uint8)
    is_start = np.zeros(n, dtype=bool)
    off = 0
    for c in record_codes:
        codes[off:off + len(c)] = c
        is_start[off] = True
        off += len(c)
    # Records of length zero still need a start flag so ordinals line up; a
    # zero-length record contributes no bases -- give it a start at the next
    # offset (shared with the next record's start is impossible: mark and let
    # cumsum count it) -- handled by inserting starts in order at `off`.
    # (Zero-length records cannot produce minimizers; ordinals must still
    # advance. We rebuild is_start including empties below.)
    if any(len(c) == 0 for c in record_codes):
        return _scan_with_empty_records(record_codes, k, w, min_chunk)

    emit_cap = max(1 << 12, next_pow2(4 * total // (w + 1) + 64))
    while True:
        res = scan_minimizers(jnp.asarray(codes), jnp.asarray(is_start), k, w, emit_cap)
        count = int(res.count)
        if count <= emit_cap:
            oh = np.asarray(res.out_hash[:count])
            pos = np.asarray(res.pos[:count])
            rec = np.asarray(res.rec[:count])
            return oh, pos, rec
        emit_cap = next_pow2(count)


def _scan_with_empty_records(record_codes, k, w, min_chunk):
    """Fallback preserving record ordinals when zero-length records exist."""
    nonempty = [(i, c) for i, c in enumerate(record_codes) if len(c) > 0]
    oh, pos, rec = scan_records_host([c for _, c in nonempty], k, w, min_chunk)
    remap = np.array([i for i, _ in nonempty], dtype=np.int32)
    rec = remap[rec] if len(rec) else rec
    return oh, pos, rec
