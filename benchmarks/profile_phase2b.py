"""Round-4 sub-stage timing of the PRODUCTION scan_phase2 at bench shapes.

n = 33.5M (one 32 Mbp chunk), emit_cap = 512K, B = _EMIT_ROW (8192),
cap_row = 512 -- the exact static shapes the pipelined build compiles.
Times each internal piece as its own jitted program, plus candidate
replacements for the measured hot spots (the 220 ms/chunk phase2 is the
critical-path stage of the 800M build; benchmarks/r4/profile_phases_r4.log).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_phase2b.py
(ONE TPU process at a time.)
"""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from seqwin_tpu.engine import hybrid
from seqwin_tpu.engine.hybrid import _EMIT_ROW, _emission_rows, _canon_at_emitted
from seqwin_tpu.engine.minimizer import next_pow2

i32 = jnp.int32
u64 = jnp.uint64

K, W = 21, 200
N = 33_555_072 - K + 1  # k-mer stream length of the 2^25-budget chunk
EMIT_CAP = 1 << 19


def sync(*xs):
    # slice ON DEVICE first -- np.asarray(full array) would d2h the whole
    # output over the relay (~40 MB/s) and swamp the compute timing
    for x in xs:
        np.asarray(x.reshape(-1)[:8])


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    sync(*jax.tree_util.tree_leaves(out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(*jax.tree_util.tree_leaves(out))
        ts.append(time.time() - t0)
    ts.sort()
    print(f'{name:36s} {ts[len(ts)//2]*1e3:9.1f} ms (min {ts[0]*1e3:.1f})',
          flush=True)
    return out


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # realistic z: emitted positions are window minima; emission density
    # ~2N/(W+1); z is the running window-min position (monotone-ish stream
    # with resets), built exactly like profile_phase2.py
    z_h = np.maximum.accumulate(
        np.where(rng.random(N) < 1.0 / W,
                 np.arange(N) - rng.integers(0, W, size=N), -1)
    ).astype(np.int32)
    z_h = np.where(np.arange(N) % W == 0, z_h,
                   np.minimum(z_h, np.arange(N))).astype(np.int32)

    codes_h = rng.integers(0, 4, size=N + K - 1).astype(np.uint8)
    packed_h = np.zeros((len(codes_h) + 3) // 4, dtype=np.uint8)
    for j in range(4):
        seg = codes_h[j::4]
        packed_h[: len(seg)] |= seg << (2 * j)

    z = jnp.asarray(z_h)
    codes_aug = jnp.asarray(codes_h)
    packed = jnp.asarray(packed_h)
    ppos = jnp.asarray(np.sort(rng.choice(N, 512, replace=False)).astype(np.int32))
    pz = jnp.asarray((np.asarray(ppos) - 7).astype(np.int32))

    B = _EMIT_ROW
    cap_row = min(max(32, next_pow2(2 * EMIT_CAP * B // N + 32)), B)
    print(f'N={N} B={B} cap_row={cap_row} emit_cap={EMIT_CAP}', flush=True)

    timed('patch .at[].set (512 sparse)',
          jax.jit(lambda z, p, v: z.at[p].set(v, mode='drop')), z, ppos, pz)

    er = timed('emission_rows (cummax+flags)', jax.jit(_emission_rows), z)
    zr, emit = er

    @jax.jit
    def row_topk(zr, emit):
        zz = jnp.where(emit, zr, i32(-1))
        topv, _ = jax.lax.top_k(zz, cap_row)
        return topv

    topv = timed(f'row top_k(B={B}, k={cap_row})', row_topk, zr, emit)

    @jax.jit
    def second_topk(topv):
        flat = topv[:, ::-1].reshape(-1)
        top2, _ = jax.lax.top_k(flat, EMIT_CAP)
        return top2[::-1]

    asc = timed(f'2nd top_k({topv.shape[0]*cap_row}, {EMIT_CAP})',
                second_topk, topv)

    eidx = jnp.asarray(
        np.sort(rng.integers(0, N - K, size=EMIT_CAP)).astype(np.int32))

    timed('canon 21-byte-gather (current)',
          jax.jit(lambda c, s: _canon_at_emitted(c, s, K)), codes_aug, eidx)

    # candidate: recompute codes from the 2-bit packed stream with TWO u32
    # gathers per emission (emitted positions are valid k-mers, so no
    # invalid/boundary handling is needed), then the same seed-table folds.
    pw = packed
    pad = (-pw.shape[0]) % 8
    if pad:
        pw = jnp.concatenate([pw, jnp.zeros((pad,), jnp.uint8)])
    packed_u32 = jax.lax.bitcast_convert_type(
        pw.reshape(-1, 4), jnp.uint32).reshape(-1)

    from seqwin_tpu.engine.hybrid import _rot_seed_tables

    fwd_t, rev_t = _rot_seed_tables(K)
    fwd_j = jnp.asarray(np.stack([t[:4] for t in fwd_t]))  # [K, 4] u64
    rev_j = jnp.asarray(np.stack([t[:4] for t in rev_t]))

    @jax.jit
    def canon_packed(pu32, safe):
        base = safe >> 4                      # u32 word index (16 bases/word)
        sh = (safe & i32(15)) << 1            # bit offset within the word
        w0 = pu32[base]
        w1 = pu32[base + 1]
        w2 = pu32[base + 2]
        # 64-bit funnel: codes j..j+15 from (w>>sh | next<<(32-sh))
        lo = jnp.where(sh > 0, (w0 >> sh) | (w1 << (i32(32) - sh)), w0)
        hi = jnp.where(sh > 0, (w1 >> sh) | (w2 << (i32(32) - sh)), w1)
        fwd = jnp.zeros(safe.shape, u64)
        rev = jnp.zeros(safe.shape, u64)
        for j in range(K):
            word = lo if j < 16 else hi
            off = (j % 16) * 2
            cj = ((word >> jnp.uint32(off)) & jnp.uint32(3)).astype(i32)
            fwd = fwd ^ fwd_j[j][cj]
            rev = rev ^ rev_j[j][cj]
        return fwd + rev

    got = timed('canon 2xu32-gather (packed)', canon_packed, packed_u32, eidx)
    ref = jax.jit(lambda c, s: _canon_at_emitted(c, s, K))(codes_aug, eidx)
    print('canon packed == canon bytes:',
          bool(jnp.all(got == ref)), flush=True)

    starts_h = np.full(64, N + 5, dtype=np.int32)
    starts_h[:16] = np.arange(16) * (N // 16)
    starts = jnp.asarray(starts_h)
    asm_tab = jnp.asarray(np.zeros(64, dtype=np.int32))

    @jax.jit
    def tail(eidx, starts, asm_tab):
        rec_local = jnp.searchsorted(starts, eidx, side='right').astype(i32) - 1
        rec_local = jnp.clip(rec_local, 0, starts.shape[0] - 1)
        e_pos = (eidx - starts[rec_local]).astype(jnp.uint32)
        return e_pos, asm_tab[rec_local]

    timed('searchsorted + pos/asm tail', tail, eidx, starts, asm_tab)

    emit_cap_real = min(max(1 << 12, next_pow2(int(2.5 * N / (W + 1)) + 64)), N)
    off_a = np.full(64, np.int64(1) << 40, dtype=np.int64)
    off_a[0] = np.iinfo(np.int64).min
    off_a[1] = 1 << 30

    @jax.jit
    def full(z, codes_aug, ppos, pz, starts, asm_tab):
        return hybrid.scan_phase2(
            z, codes_aug, ppos, pz, starts, i32(0), jnp.asarray(off_a),
            emit_cap_real, K)

    timed('scan_phase2 FULL (current)', full, z, codes_aug, ppos, pz,
          starts, asm_tab)


if __name__ == '__main__':
    main()
