"""Fine-grained per-stage timing of the build at bench scale.

Splits one 32 Mbp chunk into: host prep (packed layout + irregular windows),
h2d transfer, unpack, phase-1 (pallas), phase-2 (emission), and then the
aggregation of all chunks (device sorts + d2h). Syncs with np.asarray of an
output slice (block_until_ready is a no-op over the axon relay).
"""
import time

import numpy as np

import seqwin_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from seqwin_tpu.engine import hybrid
from seqwin_tpu.engine.aggregate import aggregate_device
from seqwin_tpu.engine.minimizer import next_pow2
from seqwin_tpu.io import native
from seqwin_tpu.ops.hashing import out_hash_mult

K, W = 21, 200
N_GENOMES = 16
GENOME_LEN = 2_000_000
CHUNK_BUDGET = 1 << 25


def sync(*xs):
    for x in xs:
        np.asarray(x.reshape(-1)[:8])


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=GENOME_LEN).astype(np.uint8)
    records = []
    for i in range(N_GENOMES):
        g = base.copy()
        idx = rng.integers(0, GENOME_LEN, size=GENOME_LEN // 200)
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        records.append(g)
    total = sum(len(c) for c in records)

    from seqwin_tpu.engine.pallas_scan import L as LANES, pallas_phase1, phase1_shapes

    rtotal, n, offset = phase1_shapes(max(total, CHUNK_BUDGET), K, W)
    stream_end = offset + total
    print(f'total={total} n={n} offset={offset}', flush=True)

    for rep in range(3):
        label = ['warmup', 'steady', 'steady2'][rep]
        t = {}
        t0 = time.time()
        packed, starts, inv_rec = native.layout_chunk_packed(records, n, offset)
        t['host_pack'] = time.time() - t0

        t0 = time.time()
        inv_points = np.concatenate([np.arange(offset, dtype=np.int64), inv_rec])
        irr_pos, patch_z = hybrid.host_patches(
            starts, K, W, n, total=stream_end, inv_points=inv_points,
            packed=packed)
        t['host_irregular'] = time.time() - t0

        t0 = time.time()
        packed_d = jnp.asarray(packed)
        sync(packed_d)
        t['h2d'] = time.time() - t0

        starts_u = np.unique(starts)
        sucap = max(64, next_pow2(len(starts_u)))
        starts_ua = np.full(sucap, n, dtype=np.int32)
        starts_ua[:len(starts_u)] = starts_u
        icap = max(256, next_pow2(len(inv_rec) or 1))
        inv_a = np.full(icap, n, dtype=np.int32)
        inv_a[:len(inv_rec)] = inv_rec

        t0 = time.time()
        codes_aug = hybrid._unpack_aug(
            packed_d, jnp.asarray(starts_ua), jnp.asarray(inv_a),
            jnp.int32(stream_end), n, offset)
        sync(codes_aug)
        t['unpack'] = time.time() - t0

        t0 = time.time()
        z_clean, _, _ = pallas_phase1(
            codes_aug.reshape(rtotal, LANES), K, W, with_hashes=False)
        sync(z_clean)
        t['phase1_pallas'] = time.time() - t0

        tail = n - z_clean.shape[0]
        if tail:
            z_clean = jnp.concatenate([z_clean, jnp.full((tail,), jnp.int32(-1))])

        scap = max(64, next_pow2(len(starts)))
        starts_a = np.full(scap, n, dtype=np.int32)
        starts_a[:len(starts)] = starts
        pcap = max(256, next_pow2(len(irr_pos) or 1))
        ppos = np.full(pcap, n, dtype=np.int32)
        pz = np.full(pcap, -1, dtype=np.int32)
        ppos[:len(irr_pos)] = irr_pos
        pz[:len(irr_pos)] = patch_z
        off_a = np.full(64, np.int64(1) << 40, dtype=np.int64)
        off_a[0] = np.iinfo(np.int64).min
        off_a[1] = 1 << 30
        emit_cap = min(max(1 << 12, next_pow2(int(2.5 * n / (W + 1)) + 64)), n)

        t0 = time.time()
        e_oh, e_pos, e_rec, count, e_asm = hybrid.scan_phase2(
            z_clean, codes_aug, jnp.asarray(ppos), jnp.asarray(pz),
            jnp.asarray(starts_a), jnp.int32(0),
            jnp.asarray(off_a), emit_cap, K)
        sync(e_oh)
        t['phase2'] = time.time() - t0
        cnt = int(count)

        t0 = time.time()
        offsets = np.arange(len(records) + 1, dtype=np.uintp)
        tmask = np.arange(len(records)) < len(records) // 2
        kmers, nodes, edges = aggregate_device(
            [(e_oh, e_pos, e_rec, cnt, e_asm)], offsets, tmask)
        t['aggregate+d2h'] = time.time() - t0

        tot = sum(t.values())
        parts = ' '.join(f'{k}={v:.3f}' for k, v in t.items())
        print(f'[{label}] {parts} total={tot:.3f} ({cnt} emissions, '
              f'{len(nodes)} nodes, {len(edges)} edges)', flush=True)


if __name__ == '__main__':
    main()
