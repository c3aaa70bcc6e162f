"""Worker for the 2-process multihost e2e test (spawned by test_distributed).

Each process owns a contiguous share of the fixture assemblies, parses only
those, and participates in one global 4-device CPU mesh (2 devices per
process); the hash-bucketed all_to_all crosses the process boundary over
gloo exactly like it would cross DCN on a real pod.

Usage: python tests/_mp_worker.py <process_id> <port> <out.npz> <paths.txt> \
    [lowmem]
paths.txt lines: "<fasta path>\t<0|1 is_target>"
``lowmem`` runs the low-memory composition with a 1-base batch budget so
every assembly becomes its own batch (exercises the per-batch collectives
staying aligned across processes).
"""
import os
import sys


def main() -> None:
    pid, port, out_path, paths_txt = sys.argv[1:5]
    low_memory = len(sys.argv) > 5 and sys.argv[5] == 'lowmem'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=2'
        ).strip()

    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{port}',
        num_processes=2,
        process_id=int(pid),
    )

    import numpy as np

    import seqwin_tpu  # noqa: F401  (x64 on)
    from seqwin_tpu.parallel.multihost import build_multihost

    paths, targets = [], []
    with open(paths_txt) as f:
        for line in f:
            p, t = line.rstrip('\n').split('\t')
            paths.append(p)
            targets.append(bool(int(t)))

    if low_memory:
        import importlib

        gb = importlib.import_module('seqwin_tpu.graph.build')
        gb.LOW_MEMORY_CHUNK_BASES = 1  # every assembly its own batch

    kmers, nodes, edges, offsets, record_ids = build_multihost(
        paths, 17, 10, targets, low_memory=low_memory)
    if int(pid) == 0:
        import json

        np.savez(
            out_path, kmers=kmers, nodes=nodes, edges=edges,
            record_offsets=np.asarray(offsets, dtype=np.int64),
        )
        with open(str(out_path) + '.ids.json', 'w') as f:
            json.dump([list(t) for t in record_ids], f)
    print(f'worker {pid}: done', flush=True)


if __name__ == '__main__':
    main()
