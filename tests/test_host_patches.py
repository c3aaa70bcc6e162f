"""Differential tests for the irregular-window patch path.

`host_patches` answers every irregular window with a rank-space sliding
rightmost-min (two-block prefix/suffix argmin) after hashing each needed
valid rank once; the oracle here is the literal member-matrix definition
(hash all w members of every window, rightmost argmin per row) it replaced
-- the replacement hashed O(Q*w) positions, minutes of host time per chunk
at realistic N densities. Tie-breaks (rightmost minimal member) follow
btllib's `<=` rescan, `/root/reference/cpp/vendor/btllib/minimizer.cpp:14-49`.
"""
import numpy as np
import pytest

from seqwin_tpu.engine.hybrid import (
    _irregular_positions,
    _SparseValidity,
    host_patches,
)
from seqwin_tpu.engine.minimizer import next_pow2
from seqwin_tpu.ops.host_hash import canon_at


def _oracle_patches(codes, starts, k, w, n, total):
    """Literal member-matrix oracle: [Q, w] positions, hash all, rightmost
    argmin per row."""
    sv = _SparseValidity(codes, starts, k, total)
    if sv.last < 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    irr_pos = _irregular_positions(sv, starts, w)
    if len(irr_pos) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    member_ranks = sv.rank(irr_pos)[:, None] - (w - 1) + np.arange(w)[None, :]
    members = sv.pos_of_rank(member_ranks)
    mh = canon_at(codes, members.ravel(), k).reshape(-1, w)
    rev = mh[:, ::-1]
    j = np.argmin(rev, axis=1)  # first min in reversed = rightmost min
    q = np.arange(len(members))
    z = members[q, w - 1 - j]
    return irr_pos.astype(np.int32), z.astype(np.int32)


def _layout(records, n):
    codes = np.full(n, 255, dtype=np.uint8)
    starts = np.zeros(len(records), dtype=np.int64)
    off = 0
    for i, c in enumerate(records):
        codes[off:off + len(c)] = c
        starts[i] = off
        off += len(c)
    codes[starts] |= 64
    return codes, starts, off


@pytest.mark.parametrize('seed', range(8))
def test_host_patches_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 12))
    w = int(rng.integers(2, 20))
    records = []
    for _ in range(int(rng.integers(1, 6))):
        L = int(rng.integers(1, 3000))
        c = rng.integers(0, 4, L).astype(np.uint8)
        # scattered Ns AND N runs (both blocker shapes)
        c[rng.random(L) < 0.01] = 255
        if L > 100:
            a = int(rng.integers(0, L - 50))
            c[a:a + int(rng.integers(1, 40))] = 255
        records.append(c)
    total = sum(len(c) for c in records)
    n = max(64, next_pow2(total))
    codes, starts, off = _layout(records, n)

    got_pos, got_z = host_patches(starts, k, w, n, total=off, codes=codes)
    exp_pos, exp_z = _oracle_patches(codes, starts, k, w, n, total=off)
    np.testing.assert_array_equal(got_pos, exp_pos)
    np.testing.assert_array_equal(got_z, exp_z)


def test_host_patches_tie_breaks_rightmost():
    """Constant sequence: every window's hashes tie; z must be the window
    end itself (rightmost minimal member)."""
    k, w = 3, 4
    c = np.zeros(64, dtype=np.uint8)  # poly-A
    c[20] = 255  # one blocker to create irregular windows
    n = 128
    codes, starts, off = _layout([c], n)
    got_pos, got_z = host_patches(starts, k, w, n, total=off, codes=codes)
    exp_pos, exp_z = _oracle_patches(codes, starts, k, w, n, total=off)
    np.testing.assert_array_equal(got_pos, exp_pos)
    np.testing.assert_array_equal(got_z, exp_z)
    assert len(got_pos) > 0


def test_native_canon_matches_numpy():
    """The C canon kernel must agree with the pure-NumPy table path bit for
    bit (both stream encodings)."""
    from seqwin_tpu.io import native
    from seqwin_tpu.ops.host_hash import _canon_from_codes, _tables

    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, 100_000).astype(np.uint8)
    codes[::577] |= 64  # record-start flags are stripped by both paths
    for k in (5, 21, 31):
        ft, rt = _tables(k)
        pos = rng.integers(0, len(codes) - k, 3000).astype(np.int64)
        nat = native.canon_at(codes, pos, k, ft, rt, packed=False)
        offs = pos[:, None] + np.arange(k)
        cc = np.minimum(codes[offs] & np.uint8(63), 4).astype(np.int64)
        np.testing.assert_array_equal(nat, _canon_from_codes(cc, k))

        packed = np.zeros(len(codes) // 4, np.uint8)
        c4 = (codes & 3)[:len(packed) * 4].reshape(-1, 4)
        packed = (c4[:, 0] | (c4[:, 1] << 2) | (c4[:, 2] << 4)
                  | (c4[:, 3] << 6)).astype(np.uint8)
        pos2 = pos[pos < len(packed) * 4 - k]
        natp = native.canon_at(packed, pos2, k, ft, rt, packed=True)
        offs2 = pos2[:, None] + np.arange(k)
        cp = ((packed[offs2 >> 2] >> ((offs2 & 3) * 2).astype(np.uint8))
              & np.uint8(3)).astype(np.int64)
        np.testing.assert_array_equal(natp, _canon_from_codes(cp, k))
