"""CLI-level multi-device build + new Config surface (devices, sketch-mode,
seed-pattern).

The conftest pins 8 virtual CPU devices, so `--devices N` drives the real
`parallel.distributed.build_distributed` shard_map path end-to-end from the
CLI -- the chip-granularity analog of the reference's `--threads`
equivalence tests (`/root/reference/tests/smoke/test_graph.py:59-121`).
"""
from pathlib import Path

import numpy as np
import pytest

from seqwin_tpu.cli import main
from seqwin_tpu.config import WORKINGDIR, Config

_SHARED = [
    '--kmerlen', '17',
    '--windowsize', '10',
    '--min-len', '17',
    '--max-len', '200',
    '--no-mash',
    '--no-blast',
    '--no-filter',
]


def _run(tmp_path: Path, ref_fixtures: Path, title: str, *extra: str) -> dict:
    argv = [
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--title', title,
        *_SHARED, *extra,
    ]
    assert main(argv) == 0
    with np.load(tmp_path / title / WORKINGDIR.graph) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize('n_dev', [2, 8])
def test_cli_devices_matches_single(tmp_path, ref_fixtures, n_dev):
    single = _run(tmp_path, ref_fixtures, 'dev1', '--devices', '1')
    multi = _run(tmp_path, ref_fixtures, f'dev{n_dev}', '--devices', str(n_dev))
    assert single.keys() == multi.keys()
    for k in single:
        np.testing.assert_array_equal(single[k], multi[k], err_msg=k)


def test_cli_devices_all_local(tmp_path, ref_fixtures):
    """--devices 0 = all local devices (8 on the virtual mesh)."""
    single = _run(tmp_path, ref_fixtures, 's1', '--devices', '1')
    all_dev = _run(tmp_path, ref_fixtures, 's0', '--devices', '0')
    for k in single:
        np.testing.assert_array_equal(single[k], all_dev[k], err_msg=k)


def test_cli_devices_clamped_over_available(tmp_path, ref_fixtures, caplog):
    with caplog.at_level('WARNING'):
        over = _run(tmp_path, ref_fixtures, 'over', '--devices', '99')
    single = _run(tmp_path, ref_fixtures, 'b1', '--devices', '1')
    for k in single:
        np.testing.assert_array_equal(single[k], over[k], err_msg=k)
    assert any('only 8 are available' in r.message for r in caplog.records)


def _min_config(tmp_path, **kw) -> Config:
    return Config(
        tar_dir=tmp_path, neg_dir=tmp_path, prefix=tmp_path, **kw)


def test_config_seed_pattern_validation(tmp_path):
    assert _min_config(tmp_path, seed_pattern='1101011').seed_pattern == '1101011'
    for bad in ('0101', '1x1', '', '10'):
        with pytest.raises(Exception):
            _min_config(tmp_path, seed_pattern=bad)
    with pytest.raises(Exception):
        _min_config(tmp_path, devices=-1)


def test_pipeline_parses_each_fasta_once(tmp_path, ref_fixtures, monkeypatch):
    """sketch_mode=device: the build retains parsed codes, the sketcher
    reuses them -- each FASTA is parsed exactly once per run."""
    import importlib

    build_mod = importlib.import_module('seqwin_tpu.graph.build')
    from seqwin_tpu.io.fasta import parse_fasta_codes as real_parse

    calls: list[str] = []

    def counting_parse(path):
        calls.append(str(path))
        return real_parse(path)

    monkeypatch.setattr(build_mod, 'parse_fasta_codes', counting_parse)
    # the sketcher's fallback path would parse via io.fasta directly
    import seqwin_tpu.pipeline.kmers as kmers_mod  # noqa: F401
    import seqwin_tpu.io.fasta as fasta_mod

    monkeypatch.setattr(fasta_mod, 'parse_fasta_codes', counting_parse)

    argv = [
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--title', 'once',
        '--kmerlen', '17', '--windowsize', '10',
        '--min-len', '17', '--max-len', '200',
        '--no-blast', '--sketch-mode', 'device',
    ]
    assert main(argv) == 0
    from collections import Counter

    per_file = Counter(calls)
    assert per_file and all(n == 1 for n in per_file.values()), per_file


def test_seed_pattern_flows_to_device_sketches(tmp_path, ref_fixtures, monkeypatch):
    """--seed-pattern reaches the device sketcher through the pipeline
    (Config.seed_pattern -> _device_jaccard -> device_sketches)."""
    import seqwin_tpu.mash as mash_mod

    seen = {}
    real = mash_mod.device_sketches

    def spying(records, kmerlen, sketchsize, seed_pattern=None, **kw):
        seen['pattern'] = seed_pattern
        return real(records, kmerlen, sketchsize, seed_pattern=seed_pattern, **kw)

    monkeypatch.setattr(mash_mod, 'device_sketches', spying)
    argv = [
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--title', 'spaced',
        '--kmerlen', '17', '--windowsize', '10',
        '--min-len', '17', '--max-len', '200',
        '--no-blast', '--sketch-mode', 'device',
        '--seed-pattern', '11011011011011011',
    ]
    from seqwin_tpu.cli import main

    assert main(argv) == 0
    assert seen['pattern'] == '11011011011011011'
