#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R4=benchmarks/r4
echo "[$(date -u '+%H:%M:%S')] smoke gate"
timeout 1800 python tests/run_tpu_smoke.py > "$R4/tpu_smoke_r4_packed.log" 2>&1
echo "rc=$?" >> "$R4/tpu_smoke_r4_packed.log"
echo "[$(date -u '+%H:%M:%S')] profile_phases"
timeout 1200 python benchmarks/profile_phases.py > "$R4/profile_phases_r4b.log" 2>&1
echo "[$(date -u '+%H:%M:%S')] extract_ab"
timeout 1800 python benchmarks/extract_ab.py > "$R4/extract_ab_r4c.log" 2>&1
echo "[$(date -u '+%H:%M:%S')] done"
