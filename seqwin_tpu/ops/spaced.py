"""Spaced-seed ntHash (btllib `SeedNtHash` semantics), TPU-native.

The reference vendors spaced-seed hashing but never calls it
(`/root/reference/cpp/vendor/btllib/nthash_seed.hpp:128-232`, no references
from `cpp/src/`); this module implements the capability as a first-class
extension so sketching/matching workloads that need spaced seeds are covered.

Semantics (`ntmsm64`, behavior derived not copied):

    fwd(i) = XOR_{j : seed[j]=='1'} srol^{k-1-j}(SEED[s_{i+j}])
    rev(i) = XOR_{j : seed[j]=='1'} srol^{j}(SEED_COMP[s_{i+j}])
    h0     = fwd + rev (mod 2^64)                       # canonical
    h_e    = t ^ (t >> 27),  t = h0 * (e ^ k*MULTISEED) # extended, e >= 1
    valid(i) <=> every CARE position of the window is an ACGT base

The TPU formulation is the closed form from SURVEY.md §7 generalized: with
c_p = srol^{-p mod 1023}(SEED[s_p]) and X = prefix-XOR of c_p,

    fwd(i) = srol^{(k-1+i) mod 1023}( XOR_{[a,b) in care blocks} X[i+b]^X[i+a] )

-- care blocks become gather-free interval XORs of ONE scan, so any seed
pattern costs O(#blocks) vector ops per position instead of O(k).
"""
from __future__ import annotations

import functools
import logging

import numpy as np

import jax
import jax.numpy as jnp

from .hashing import M64, MULTISEED, MULTISHIFT, SEEDS, SEEDS_COMP, srol

logger = logging.getLogger(__name__)


def parse_seed(pattern: str) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Validate a '1'/'0' spaced-seed pattern -> (care mask bool[k], care
    blocks [(start, stop), ...]). Warns (like the reference) when the pattern
    is not palindromic, since reverse-complement hashing is then inconsistent.
    """
    if not pattern or any(c not in '01' for c in pattern):
        raise ValueError(f'spaced seed must be a non-empty 1/0 string: {pattern!r}')
    if pattern[0] != '1' or pattern[-1] != '1':
        raise ValueError(f'spaced seed must start and end with 1: {pattern!r}')
    if pattern != pattern[::-1]:
        logger.warning(
            f'spaced seed {pattern} is not symmetric; '
            'reverse-complement hashing will be inconsistent')
    mask = np.frombuffer(pattern.encode(), dtype=np.uint8) == ord('1')
    blocks: list[tuple[int, int]] = []
    j = 0
    k = len(pattern)
    while j < k:
        if mask[j]:
            b = j
            while b < k and mask[b]:
                b += 1
            blocks.append((j, b))
            j = b
        else:
            j += 1
    return mask, blocks


def _extend(h0: np.ndarray, k: int, n_hashes: int) -> np.ndarray:
    """[Q, n_hashes] extended hash values (e=0 is the canonical hash)."""
    out = np.empty((len(h0), n_hashes), dtype=np.uint64)
    out[:, 0] = h0
    with np.errstate(over='ignore'):
        for e in range(1, n_hashes):
            t = h0 * np.uint64((e ^ (k * MULTISEED)) & M64)
            out[:, e] = t ^ (t >> np.uint64(MULTISHIFT))
    return out


def spaced_oracle(codes: np.ndarray, pattern: str, n_hashes: int = 1):
    """Per-position reference implementation (slow, obviously correct).

    Returns (hashes u64[n_valid, n_hashes], positions int64[n_valid]).
    """
    mask, _ = parse_seed(pattern)
    k = len(pattern)
    n = len(codes)
    care = np.flatnonzero(mask)
    positions, h0s = [], []
    for p in range(max(0, n - k + 1)):
        window = codes[p:p + k]
        cs = window[care]
        if np.any(cs > 3):
            continue
        fwd = rev = 0
        for j in care:
            c = int(window[j])
            fwd ^= srol(SEEDS[c], k - 1 - int(j))
            rev ^= srol(SEEDS_COMP[c], int(j))
        h0s.append((fwd + rev) & M64)
        positions.append(p)
    h0 = np.array(h0s, dtype=np.uint64)
    return _extend(h0, k, n_hashes), np.array(positions, dtype=np.int64)


_table_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _rot_tables(k: int) -> tuple[np.ndarray, np.ndarray]:
    cached = _table_cache.get(k)
    if cached is None:
        fwd = np.zeros((k, 5), dtype=np.uint64)
        rev = np.zeros((k, 5), dtype=np.uint64)
        for j in range(k):
            for c in range(4):
                fwd[j, c] = srol(SEEDS[c], (k - 1 - j) % 1023)
                rev[j, c] = srol(SEEDS_COMP[c], j % 1023)
        cached = _table_cache[k] = (fwd, rev)
    return cached


def spaced_hashes_host(codes: np.ndarray, pattern: str, n_hashes: int = 1):
    """Vectorized NumPy spaced-seed hashing (rotated-table folds over the
    care positions only). Same returns as `spaced_oracle`."""
    mask, _ = parse_seed(pattern)
    k = len(pattern)
    n = len(codes)
    if n < k:
        return np.zeros((0, n_hashes), np.uint64), np.zeros(0, np.int64)
    care = np.flatnonzero(mask).astype(np.int64)
    starts = np.arange(n - k + 1, dtype=np.int64)
    win = codes[starts[:, None] + care[None, :]]
    valid = ~np.any(win > 3, axis=1)
    pos = starts[valid]
    c = np.minimum(win[valid].astype(np.int64), 4)
    fwd_tab, rev_tab = _rot_tables(k)
    fwd = np.bitwise_xor.reduce(fwd_tab[care[None, :], c], axis=1)
    rev = np.bitwise_xor.reduce(rev_tab[care[None, :], c], axis=1)
    with np.errstate(over='ignore'):
        h0 = fwd + rev
    return _extend(h0, k, n_hashes), pos


@functools.partial(
    jax.jit, static_argnames=('pattern', 'n_hashes', 'out_cap'))
def spaced_hashes_device(codes, pattern: str, n_hashes: int = 1,
                         out_cap: int | None = None):
    """XLA spaced-seed hashing over a full code stream: ONE prefix-XOR scan
    plus two gathers per care block plus a variable split-rotation.

    Args:
        codes: uint8[n] base codes (0..3 valid, anything else invalid).
        out_cap: emitted-position capacity (defaults to n).

    Returns (h u64[out_cap, n_hashes], pos i64[out_cap] (-1 padded),
    count i32): hashes of all valid windows in position order.
    """
    mask, blocks = parse_seed(pattern)
    k = len(pattern)
    n = codes.shape[0]
    if out_cap is None:
        out_cap = max(1, n - k + 1) if n >= k else 1
    u64 = jnp.uint64

    # per-position pre-rotated seed terms: c_p = srol^{-p mod 1023}(SEED[s_p])
    p = jnp.arange(n, dtype=jnp.int64)
    neg = (-p) % 1023
    fwd_pre = _srol_by(jnp.asarray(
        np.array(SEEDS + (0,), np.uint64))[jnp.minimum(codes, 4).astype(jnp.int32)], neg)
    pos_r = p % 1023
    rev_pre = _srol_by(jnp.asarray(
        np.array(SEEDS_COMP + (0,), np.uint64))[jnp.minimum(codes, 4).astype(jnp.int32)], pos_r)

    zero = jnp.zeros(1, u64)
    xf = jnp.concatenate([zero, jax.lax.associative_scan(jnp.bitwise_xor, fwd_pre)])
    xr = jnp.concatenate([zero, jax.lax.associative_scan(jnp.bitwise_xor, rev_pre)])
    inv = jnp.concatenate([
        jnp.zeros(1, jnp.int32), jnp.cumsum((codes > 3).astype(jnp.int32))])

    n_win = max(0, n - k + 1)
    if n_win == 0:
        return (jnp.zeros((out_cap, n_hashes), u64),
                jnp.full(out_cap, jnp.int64(-1)), jnp.int32(0))
    i = jnp.arange(n_win, dtype=jnp.int64)
    hf = jnp.zeros(n_win, u64)
    hr = jnp.zeros(n_win, u64)
    bad = jnp.zeros(n_win, jnp.int32)
    for a, b in blocks:
        hf = hf ^ xf[i + b] ^ xf[i + a]
        hr = hr ^ xr[i + b] ^ xr[i + a]
        bad = bad + inv[i + b] - inv[i + a]
    # alignment: fwd terms are srol^{(k-1+i)-p}, rev terms srol^{p-i}
    hf = _srol_by(hf, (i + (k - 1)) % 1023)
    hr = _srol_by(hr, (-i) % 1023)
    h0 = hf + hr

    valid = bad == 0
    order = jnp.where(valid, i, jnp.int64(n_win))
    top = jax.lax.top_k(-order, min(out_cap, max(n_win, 1)))[0]
    sel = -top
    count = jnp.sum(valid.astype(jnp.int32))
    live = sel < n_win
    sel_c = jnp.clip(sel, 0, max(n_win - 1, 0))
    h_sel = jnp.where(live, h0[sel_c], u64(0))
    out = [h_sel]
    for e in range(1, n_hashes):
        t = h_sel * u64((e ^ (k * MULTISEED)) & M64)
        out.append(jnp.where(live, t ^ (t >> u64(MULTISHIFT)), u64(0)))
    h = jnp.stack(out, axis=1)
    if h.shape[0] < out_cap:
        pad = out_cap - h.shape[0]
        h = jnp.concatenate([h, jnp.zeros((pad, n_hashes), u64)])
        sel = jnp.concatenate([sel, jnp.full(pad, jnp.int64(n_win))])
        live = jnp.concatenate([live, jnp.zeros(pad, bool)])
    return h, jnp.where(live, sel, jnp.int64(-1)), count


def _srol_by(x, d):
    """Vectorized split rotation srol^d over u64: independent left-rotations
    of the LOW-33 / HIGH-31 bit halves (`ops/hashing.py::srol` convention,
    `hashing_internals.hpp:29-51`)."""
    u64 = jnp.uint64
    d33 = (d % 33).astype(jnp.uint64)
    d31 = (d % 31).astype(jnp.uint64)
    lo = x & u64((1 << 33) - 1)            # 33-bit half
    hi = x >> u64(33)                      # 31-bit half
    m33 = u64((1 << 33) - 1)
    m31 = u64((1 << 31) - 1)
    lo_r = ((lo << d33) | (lo >> (u64(33) - d33))) & m33
    hi_r = ((hi << d31) | (hi >> (u64(31) - d31))) & m31
    lo_r = jnp.where(d33 == 0, lo, lo_r)  # avoid shift-by-33/31 when d==0
    hi_r = jnp.where(d31 == 0, hi, hi_r)
    return (hi_r << u64(33)) | lo_r
