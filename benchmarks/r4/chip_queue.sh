#!/bin/bash
# Round-4 chip measurement queue. ONE TPU process at a time (relay rule);
# each stage logs into benchmarks/r4/ and a failure does not stop the rest.
# Order: correctness gate first, then the wire-sensitive bench (to catch the
# relay window right after validation), then the kernel A/B, then golden171.
# Usage: bash benchmarks/r4/chip_queue.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R4=benchmarks/r4
mkdir -p "$R4"

stamp() { date '+%Y-%m-%d %H:%M:%S'; }

echo "[$(stamp)] stage 1/5: TPU smoke gate (compiled Mosaic vs goldens)"
timeout 1800 python tests/run_tpu_smoke.py > "$R4/tpu_smoke_r4.log" 2>&1
echo "rc=$?" >> "$R4/tpu_smoke_r4.log"

echo "[$(stamp)] stage 2/5: bench (budgeted)"
BENCH_BUDGET_S=1500 timeout 1800 python bench.py > "$R4/bench_r4.json" 2> "$R4/bench_r4.log"
echo "rc=$?" >> "$R4/bench_r4.log"

echo "[$(stamp)] stage 3/5: extraction + roll A/B (pipeline level)"
SEQWIN_AB_ROLL=1 timeout 2400 python benchmarks/extract_ab.py > "$R4/extract_ab_r4.log" 2>&1
echo "rc=$?" >> "$R4/extract_ab_r4.log"

echo "[$(stamp)] stage 4/5: kernel variant sweep (bench_pallas)"
timeout 2400 python benchmarks/bench_pallas.py > "$R4/bench_pallas_r4.log" 2>&1
echo "rc=$?" >> "$R4/bench_pallas_r4.log"

echo "[$(stamp)] stage 5/5: golden171 gate"
mkdir -p benchmarks/golden171_r4
timeout 2400 python tests/run_golden171.py > benchmarks/golden171_r4/run.log 2>&1
echo "rc=$?" >> benchmarks/golden171_r4/run.log
git rev-parse HEAD > benchmarks/golden171_r4/HEAD 2>/dev/null

echo "[$(stamp)] queue done"
