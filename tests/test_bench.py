"""bench.py protocol smoke: the driver-facing contract is ONE parseable
JSON line per completed scale with the headline fields (round 3 recorded
nothing because the old single-JSON-at-exit protocol timed out; VERDICT r3
next-round #1)."""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_parseable_headline_json():
    env = dict(
        os.environ,
        SEQWIN_TPU_PLATFORM='cpu',
        JAX_PLATFORMS='cpu',
        BENCH_GENOMES='4',
        BENCH_GENOME_LEN='200000',
        BENCH_SAMPLES='2',
        BENCH_BUDGET_S='240',
    )
    out = subprocess.run(
        [sys.executable, str(REPO / 'bench.py')],
        capture_output=True, text=True, timeout=280, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines, f'no stdout; stderr: {out.stderr[-2000:]}'
    # every line must be valid JSON -- root-logger output (incl. the axon
    # backend WARNING on real chips) must ride stderr, never stdout
    parsed = [json.loads(ln) for ln in lines]
    head = parsed[-1]
    for key in ('metric', 'value', 'unit', 'vs_baseline', 'headline_scale',
                'methodology', 'scales'):
        assert key in head, key
    assert head['metric'] == 'graph_build_minimizers_per_s'
    assert head['value'] > 0
    scale = head['scales'][head['headline_scale']]
    assert scale['status'] == 'done'
    assert len(scale['samples_s']) == 2
    # the materialized-build comparison sample must be recorded too
    assert 'materialize_s' in scale


def test_bench_headline_scale_runs_first():
    """VERDICT r4 #1: the 800M headline scale must be FIRST in the schedule
    so a tight driver budget records the number that counts (round 4's
    official capture recorded only 192M because 800M ran second)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location('bench_mod', REPO / 'bench.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.SCALES[0][0] == '800M'
    assert mod.HEADLINE_PREFERENCE[0] == '800M'


def test_bench_fails_fast_when_backend_unavailable():
    """Dead-relay guard: with an unregisterable TPU backend the probe must
    fail and bench must exit 1 with a clear message (not hang into the
    driver's budget; the axon client constructor blocked >1 h on
    2026-08-18)."""
    env = dict(os.environ, JAX_PLATFORMS='axon')
    env.pop('SEQWIN_TPU_PLATFORM', None)
    env.pop('PYTHONPATH', None)  # no axon_site -> backend cannot register
    out = subprocess.run(
        [sys.executable, str(REPO / 'bench.py')],
        capture_output=True, text=True, timeout=200, env=env, cwd=REPO,
    )
    assert out.returncode == 1
    assert 'FATAL: TPU backend probe' in out.stderr
    assert not out.stdout.strip()  # no bogus JSON
