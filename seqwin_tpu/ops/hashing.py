"""ntHash v2 constants and scalar reference primitives.

The numeric contract mirrors btllib's ntHash v2
(`/root/reference/cpp/vendor/btllib/hashing_internals.hpp:29-169`,
`nthash_kmer.hpp:22-133`), re-derived in closed form:

- ``srol`` is a *split rotation*: the low 33 bits and high 31 bits of a 64-bit
  word rotate independently (`hashing_internals.hpp:29-35`). Its order is
  lcm(33, 31) = 1023.
- The forward-strand hash of the k-mer at position ``p`` is
  ``fwd(p) = XOR_{j<k} srol^(k-1-j)(SEED[s[p+j]])`` -- the rolling recurrence
  ``fwd' = srol(fwd) ^ SEED[in] ^ srol^k(SEED[out])``
  (`nthash_kmer.hpp:65-75`) telescopes to this closed form.
- The reverse-strand hash is ``rev(p) = XOR_{j<k} srol^j(SEED[comp(s[p+j])])``
  (`nthash_kmer.hpp:145-155`).
- ``canonical = (fwd + rev) mod 2^64`` (`hashing_internals.hpp:13-17`).
- The second ("out") hash used as the graph node id is
  ``t = canonical * (1 ^ k*MULTISEED); out = t ^ (t >> 27)``
  (`hashing_internals.hpp:89-103`, with i=1).

Because srol has period 1023, per-position seeds can be rotated into a common
frame: with ``a_p = srol^((-p) mod 1023)(SEED[s_p])`` and prefix-XOR ``X``,
``fwd(p) = srol^((k-1+p) mod 1023)(X[p+k] ^ X[p])`` -- an embarrassingly
parallel scan + window op. This module provides the constants and NumPy helpers
shared by the device engine and the test oracle.
"""
from __future__ import annotations

import numpy as np

M64 = (1 << 64) - 1
M33 = (1 << 33) - 1
M31 = (1 << 31) - 1
SROL_PERIOD = 1023  # lcm(33, 31)

SEED_A = 0x3C8BFBB395C60474
SEED_C = 0x3193C18562A02B4C
SEED_G = 0x20323ED082572324
SEED_T = 0x295549F54BE24456
SEED_N = 0x0000000000000000
MULTISEED = 0x90B45D39FB6DA1FA
MULTISHIFT = 27

# Base codes: A=0, C=1, G=2, T=3 (CONVERT_TAB order); 255 = invalid.
SEEDS = (SEED_A, SEED_C, SEED_G, SEED_T)
COMP_CODE = (3, 2, 1, 0)
SEEDS_COMP = tuple(SEEDS[c] for c in COMP_CODE)


def _build_code_tab() -> np.ndarray:
    """ASCII -> 2-bit base code, 255 for invalid.

    Matches the non-N rows of btllib's SEED_TAB
    (`hashing_internals.hpp:136-169`): upper/lowercase ACGT, U as T, plus the
    low-ASCII codes 1='T', 3='G', 4/5='A', 7='C'.
    """
    tab = np.full(256, 255, dtype=np.uint8)
    for chars, code in ((b'Aa', 0), (b'Cc', 1), (b'Gg', 2), (b'TtUu', 3)):
        for ch in chars:
            tab[ch] = code
    for ch, code in ((1, 3), (3, 2), (4, 0), (5, 0), (7, 1)):
        tab[ch] = code
    return tab


CODE_TAB = _build_code_tab()


def srol1(x: int) -> int:
    """One split left-rotation (`hashing_internals.hpp:29-35`)."""
    m = ((x & 0x8000000000000000) >> 30) | ((x & 0x100000000) >> 32)
    return ((x << 1) & 0xFFFFFFFDFFFFFFFF) | m


def srol(x: int, d: int) -> int:
    """Split left-rotation by ``d`` (low 33 and high 31 bits independently)."""
    d33 = d % 33
    d31 = d % 31
    lo = x & M33
    hi = x >> 33
    lo = ((lo << d33) | (lo >> (33 - d33))) & M33 if d33 else lo
    hi = ((hi << d31) | (hi >> (31 - d31))) & M31 if d31 else hi
    return (hi << 33) | lo


def out_hash_mult(k: int) -> int:
    """The (mod 2^64) multiplier for the second hash: ``1 ^ (k * MULTISEED)``."""
    return (1 ^ (k * MULTISEED)) & M64


def rotated_seed_tables(k: int) -> dict[str, np.ndarray]:
    """Precompute the column-periodic rotation tables used by the device engine.

    Returns uint64 arrays of shape (SROL_PERIOD, 4):
      - ``fwd_seed[j, c] = srol^((-j) mod 1023)(SEED[c])``
      - ``rev_seed[j, c] = srol^(j mod 1023)(SEED[comp(c)])``
    and int32 vectors of length SROL_PERIOD with the final rotation amounts:
      - ``fwd_rot[j] = (k - 1 + j) mod 1023``
      - ``rev_rot[j] = (-j) mod 1023``
    """
    p = SROL_PERIOD
    fwd_seed = np.zeros((p, 4), dtype=np.uint64)
    rev_seed = np.zeros((p, 4), dtype=np.uint64)
    for j in range(p):
        dj_neg = (-j) % p
        for c in range(4):
            fwd_seed[j, c] = srol(SEEDS[c], dj_neg)
            rev_seed[j, c] = srol(SEEDS_COMP[c], j)
    fwd_rot = np.array([(k - 1 + j) % p for j in range(p)], dtype=np.int32)
    rev_rot = np.array([(-j) % p for j in range(p)], dtype=np.int32)
    return dict(fwd_seed=fwd_seed, rev_seed=rev_seed, fwd_rot=fwd_rot, rev_rot=rev_rot)
