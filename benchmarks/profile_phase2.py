"""Sub-stage timing of scan_phase2 at the bench chunk size, plus candidate
replacements (two-level row-blocked emission extraction)."""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

i32 = jnp.int32
u64 = jnp.uint64

N = 1 << 25
W = 200
EMIT_CAP = 1 << 19
B = 1 << 13  # row width for the two-level variant
CAP_ROW = 256


def sync(*xs):
    for x in xs:
        np.asarray(np.ravel(np.asarray(x))[:8])


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    sync(*jax.tree_util.tree_leaves(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(*jax.tree_util.tree_leaves(out))
    dt = (time.time() - t0) / reps
    print(f'{name:32s} {dt*1e3:9.1f} ms', flush=True)
    return out


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # synthetic z with realistic emission density: window-min positions
    canon_h = rng.integers(0, 1 << 63, size=N, dtype=np.int64).astype(np.uint64)
    z_h = np.maximum.accumulate(
        np.where(rng.random(N) < 1.0 / W, np.arange(N) - rng.integers(0, W, size=N), -1)
    ).astype(np.int32)
    z_h = np.where(np.arange(N) % W == 0, z_h, np.minimum(z_h, np.arange(N)))
    patch_pos_h = np.sort(rng.choice(N, size=512, replace=False)).astype(np.int32)
    patch_z_h = (patch_pos_h - rng.integers(0, W, size=512)).astype(np.int32)

    z = jnp.asarray(z_h)
    canon = jnp.asarray(canon_h)
    ppos = jnp.asarray(patch_pos_h)
    pz = jnp.asarray(patch_z_h)

    timed('patch .at[].set', jax.jit(lambda z, p, v: z.at[p].set(v, mode='drop')), z, ppos, pz)
    timed('cummax N', jax.jit(jax.lax.cummax), z)

    @jax.jit
    def emit_mask(z):
        cm = jax.lax.cummax(z)
        cmx = jnp.concatenate([jnp.full((1,), i32(-2)), cm[:-1]])
        m = (z >= 0) & (z > cmx)
        return m, jnp.sum(m.astype(i32))

    mask, cnt = timed('emit mask + count', emit_mask, z)

    @jax.jit
    def topk_extract(z, mask):
        zz = jnp.where(mask, z, i32(-1))
        topv, _ = jax.lax.top_k(zz, EMIT_CAP)
        return topv[::-1]

    timed('top_k(N, 2^19) + reverse', topk_extract, z, mask)

    @jax.jit
    def gathers(eidx, canon):
        safe = jnp.clip(eidx, 0, N - 1)
        c = canon[safe]
        t = c * u64(0x9E3779B97F4A7C15)
        return t ^ (t >> u64(27))

    eidx = jnp.asarray(rng.integers(0, N, size=EMIT_CAP).astype(np.int32))
    timed('gather canon @2^19', gathers, eidx, canon)

    # ---- two-level variant ----
    @jax.jit
    def two_level(z, canon):
        zr = z.reshape(N // B, B)
        cm = jax.lax.cummax(zr, axis=1)
        cmx = jnp.concatenate([jnp.full((N // B, 1), i32(-2)), cm[:, :-1]], axis=1)
        row_max = cm[:, -1]
        carry = jnp.concatenate([jnp.full((1,), i32(-2)),
                                 jax.lax.cummax(row_max)[:-1]])
        cand = (zr >= 0) & (zr > cmx) & (zr > carry[:, None])
        cnt_row = jnp.sum(cand.astype(i32), axis=1)
        zz = jnp.where(cand, zr, i32(-1))
        topv, _ = jax.lax.top_k(zz, CAP_ROW)         # [T, CAP_ROW]
        flat = topv[:, ::-1].reshape(-1)              # ascending per row
        # second-level compaction over T*CAP_ROW (= N/B*CAP_ROW << N)
        top2, _ = jax.lax.top_k(flat, EMIT_CAP)
        asc = top2[::-1]
        cnt = jnp.sum(cnt_row)
        safe = jnp.clip(asc, 0, N - 1)
        c = canon[safe]
        t = c * u64(0x9E3779B97F4A7C15)
        oh = t ^ (t >> u64(27))
        return asc, oh, cnt, jnp.max(cnt_row)

    out = timed('two-level emission (full)', two_level, z, canon)
    print('counts:', int(out[2]), 'max row', int(out[3]), 'vs cnt', int(cnt), flush=True)


if __name__ == '__main__':
    main()
