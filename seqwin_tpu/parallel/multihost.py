"""Multi-host scale-out scaffolding.

The reference is single-node (`SURVEY.md` §2.3); this module defines the
multi-host contract for the TPU build so the distributed single-slice engine
(`parallel/distributed.py`) extends across hosts:

- every host calls `initialize()` (jax.distributed) and builds the global
  mesh over all devices;
- assemblies are partitioned contiguously by *global record index* across
  processes (the analog of `graph.cpp:305-306`'s thread partition), each
  process parses only its own files;
- the hash-bucketed all_to_all merge already routes by hash range, so the
  per-bucket owners are global device ids and the merge crosses DCN only for
  buckets owned by other hosts.

Only single-process execution is exercised in this environment (one chip);
the partition logic is unit-tested host-side.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_paths(paths: list, sizes: list[int], n_processes: int, process_id: int) -> list:
    """Contiguous, load-balanced partition of assembly files across processes.

    Mirrors the device-level record partition in
    `parallel/distributed.py::sharded_scan`: contiguity keeps global scan
    order reconstructible by concatenating process results in process order.
    """
    total = sum(sizes)
    budget = total / n_processes if n_processes else 0
    assignment = []
    acc = 0
    pid = 0
    for p, s in zip(paths, sizes):
        if acc > budget * (pid + 1) and pid < n_processes - 1:
            pid += 1
        assignment.append(pid)
        acc += s
    return [p for p, a in zip(paths, assignment) if a == process_id]
