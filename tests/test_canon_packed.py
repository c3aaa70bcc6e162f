"""Differentials for the packed-stream canon-hash recomputation.

`_canon_at_emitted_packed` (3-word u32 funnel over the 2-bit packed stream)
must be bit-equal to `_canon_at_emitted` (k byte gathers) at every valid
k-mer position -- it replaced the byte path on the phase-2 critical path
(round 4; benchmarks/r4/profile_phase2b.log: 192 ms -> 39 ms per chunk).

Reference semantics: btllib canonical ntHash
(/root/reference/cpp/vendor/btllib/include/btllib/nthash.hpp) -- already
pinned transitively by the oracle chain; these tests pin the packed decode
itself (funnel splice points, word boundaries, k = 16/17/32 edges, garbage
robustness at masked positions).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seqwin_tpu.engine.hybrid import (
    _canon_at_emitted,
    _canon_at_emitted_packed,
    _canon_dispatch,
    _pack_codes_u32,
    _packed_u8_to_u32,
)


def _mk_codes(n, rng, with_junk=True):
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    if with_junk:
        # invalid bases + a record-start flag: the packed repack must mask
        # to 2 bits and stay exact at positions whose k-mer avoids the junk
        codes[rng.integers(0, n, size=max(1, n // 500))] = 255
        codes[0] |= 64
    return codes


def _valid_positions(codes, k):
    n = len(codes) - k + 1
    ok = np.ones(n, bool)
    for b in np.flatnonzero((codes & 63) > 3):
        ok[max(0, b - k + 1):b + 1] = False
    return np.flatnonzero(ok).astype(np.int32)


@pytest.mark.parametrize('k', [5, 15, 16, 17, 21, 31, 32])
def test_funnel_matches_byte_path(k):
    rng = np.random.default_rng(k)
    codes = _mk_codes(4096, rng)
    pos = _valid_positions(codes, k)
    assert len(pos) > 1000
    codes_j = jnp.asarray(codes)
    pu32 = _pack_codes_u32(codes_j)
    got = jax.jit(lambda p, s: _canon_at_emitted_packed(p, s, k))(
        pu32, jnp.asarray(pos))
    ref = jax.jit(lambda c, s: _canon_at_emitted(c, s, k))(
        codes_j, jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_every_splice_offset():
    """All 16 in-word offsets (funnel shift amounts), every word boundary."""
    k = 21
    rng = np.random.default_rng(0)
    codes = _mk_codes(2048, rng, with_junk=False)
    pos = np.arange(len(codes) - k + 1, dtype=np.int32)
    pu32 = _pack_codes_u32(jnp.asarray(codes))
    got = jax.jit(lambda p, s: _canon_at_emitted_packed(p, s, k))(
        pu32, jnp.asarray(pos))
    ref = jax.jit(lambda c, s: _canon_at_emitted(c, s, k))(
        jnp.asarray(codes), jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_native_packed_u8_route():
    """The h2d packed-buffer route (bitcast view) == the repack route, with
    arbitrary garbage 2-bit values at invalid-base positions."""
    k = 21
    rng = np.random.default_rng(7)
    codes = _mk_codes(4096, rng)
    pos = _valid_positions(codes, k)
    # native layout: invalid bytes carry arbitrary packed bits
    clean = np.where((codes & 63) > 3,
                     rng.integers(0, 4, codes.shape).astype(np.uint8),
                     codes & 3)
    packed = np.zeros(len(codes) // 4, dtype=np.uint8)
    for j in range(4):
        packed[:] |= clean[j::4] << (2 * j)
    got = jax.jit(lambda p, s: _canon_at_emitted_packed(p, s, k))(
        _packed_u8_to_u32(jnp.asarray(packed)), jnp.asarray(pos))
    ref = jax.jit(lambda c, s: _canon_at_emitted(c, s, k))(
        jnp.asarray(codes), jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dispatch_large_k_falls_back():
    """k > 32 exceeds the funnel's 2-word decode; dispatch must stay exact
    via the byte path."""
    k = 33
    rng = np.random.default_rng(1)
    codes = _mk_codes(2048, rng, with_junk=False)
    pos = jnp.asarray(np.arange(len(codes) - k + 1, dtype=np.int32))
    codes_j = jnp.asarray(codes)
    got = jax.jit(lambda c, s: _canon_dispatch(c, s, k))(codes_j, pos)
    ref = jax.jit(lambda c, s: _canon_at_emitted(c, s, k))(codes_j, pos)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
