"""Multi-chip scaling-efficiency accounting (no multi-chip hardware needed).

Real N-chip hardware is not reachable from this environment (one chip behind
a relay), so this tool produces the next-best evidence for the >=80%%-at-2-
hosts north star (BASELINE.md): EXACT per-(src, dst) communication volumes
of the distributed build, measured with the same count pre-pass the build
uses to size its caps (`parallel/distributed.py::_count_step`), plus an
analytic latency model built from the measured single-chip phase costs
(PERF.md component timings).

Run on the virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        SEQWIN_TPU_PLATFORM=cpu python benchmarks/scaling_accounting.py

Prints one JSON object per mesh size with:
- per-device scan bases (load balance),
- all_to_all entries and bytes, split intra-host (ICI) vs cross-host (DCN)
  under a devices-per-host assumption,
- modeled step time and scaling efficiency vs 1 chip.
"""
import json
import os
import sys

os.environ.setdefault('SEQWIN_TPU_PLATFORM', 'cpu')
if 'xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8'
    ).strip()

import numpy as np  # noqa: E402

import seqwin_tpu  # noqa: F401,E402  (x64 on)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seqwin_tpu.parallel import distributed as D  # noqa: E402

K, W = 21, 200
# measured single-chip costs at 33.5 M positions (PERF.md round-4:
# packed-canon phase 2 = 70 ms; phase 1 = Pallas tb=512 kernel)
PHASE1_S_PER_POS = 0.102 / 33_500_000     # fused Pallas phase 1
PHASE2_S_PER_POS = 0.070 / 33_500_000     # emission extraction + packed canon
MERGE_S_PER_ENTRY = (0.093 + 0.153) / 3_100_000  # node+edge merges / stream
ICI_BYTES_PER_S = 45e9    # v5e per-direction ICI ~45 GB/s
DCN_BYTES_PER_S = 6.25e9  # ~50 Gb/s DCN per host (conservative)
# staged entry payloads (parallel/distributed.py::_route_blocks inputs)
EMIT_ENTRY_B = 8 + 4 + 4 + 4   # oh u64, pos u32, rec i32, asm i32
PAIR_ENTRY_B = 8 + 8 + 4       # u u64, v u64, asm i32


def synth(n_genomes: int, genome_len: int):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=genome_len).astype(np.uint8)
    records = []
    for i in range(n_genomes):
        g = base.copy()
        idx = rng.integers(0, genome_len, size=genome_len // 200)
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        records.append(g)
    offsets = np.arange(n_genomes + 1, dtype=np.uintp)
    targets = [i < n_genomes // 2 for i in range(n_genomes)]
    return records, offsets, targets


def account(records, n_dev: int, devices_per_host: int):
    mesh = D.make_mesh(n_dev)
    lengths = [len(c) for c in records]
    shard_of = D.partition_records(lengths, n_dev)
    per_dev_bases = np.zeros(n_dev, dtype=np.int64)
    for ln, d in zip(lengths, shard_of):
        per_dev_bases[d] += ln

    codes, starts, patch_pos, patch_z, rec_base, n, offset = D._shard_layout(
        records, shard_of, n_dev, K, W, use_pallas=False)
    spec0 = D.ShardSpec(k=K, w=W, n_bases=n, offset=offset,
                        emit_cap=0, bucket_cap=0, use_pallas=False)
    cnts, row_max, e_hist, p_hist = D._sharded_count_jit(
        jnp.asarray(codes), jnp.asarray(patch_pos), jnp.asarray(patch_z),
        jnp.asarray(starts), spec0, n_dev, mesh)
    cnts = np.asarray(cnts)
    e_hist = np.asarray(e_hist, dtype=np.int64)  # [src, dst]
    p_hist = np.asarray(p_hist, dtype=np.int64)

    host_of = np.arange(n_dev) // max(devices_per_host, 1)
    cross = host_of[:, None] != host_of[None, :]
    offdiag = ~np.eye(n_dev, dtype=bool)
    bytes_mtx = e_hist * EMIT_ENTRY_B + p_hist * PAIR_ENTRY_B
    ici_b = int(bytes_mtx[offdiag & ~cross].sum())
    dcn_b = int(bytes_mtx[offdiag & cross].sum())

    # modeled step time: scan on the padded shard + exchange + owner merge
    scan_s = n * (PHASE1_S_PER_POS + PHASE2_S_PER_POS)
    # per-device exchange: max over devices of (sent + received) / link bw
    sent = bytes_mtx.sum(axis=1) - np.diag(bytes_mtx)
    recv = bytes_mtx.sum(axis=0) - np.diag(bytes_mtx)
    exch_s = float(np.max(sent + recv)) / ICI_BYTES_PER_S
    if dcn_b:
        per_host = np.zeros(host_of.max() + 1)
        for s in range(n_dev):
            for d in range(n_dev):
                if cross[s, d]:
                    per_host[host_of[s]] += bytes_mtx[s, d]
        exch_s = max(exch_s, float(per_host.max()) / DCN_BYTES_PER_S)
    merge_entries = (e_hist.sum(axis=0) + p_hist.sum(axis=0)).max()
    merge_s = float(merge_entries) * MERGE_S_PER_ENTRY
    step_s = scan_s + exch_s + merge_s
    return dict(
        n_dev=n_dev,
        per_dev_bases_max=int(per_dev_bases.max()),
        per_dev_bases_min=int(per_dev_bases.min()),
        padded_stream=n,
        emissions=int(cnts.sum()),
        a2a_entries=int((e_hist + p_hist)[offdiag].sum()),
        ici_bytes=ici_b,
        dcn_bytes=dcn_b,
        modeled_scan_s=round(scan_s, 4),
        modeled_exchange_s=round(exch_s, 6),
        modeled_merge_s=round(merge_s, 4),
        modeled_step_s=round(step_s, 4),
    )


def main():
    n_genomes = int(os.environ.get('SCALE_GENOMES', '16'))
    genome_len = int(os.environ.get('SCALE_GENOME_LEN', '250000'))
    devices_per_host = int(os.environ.get('SCALE_DEV_PER_HOST', '4'))
    records, offsets, targets = synth(n_genomes, genome_len)
    base = None
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        r = account(records, n_dev, devices_per_host)
        if base is None:
            base = r['modeled_step_s']
        r['scaling_efficiency'] = round(
            base / (r['modeled_step_s'] * n_dev), 3)
        print(json.dumps(r), flush=True)


if __name__ == '__main__':
    main()
