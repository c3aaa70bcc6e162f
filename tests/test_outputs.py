"""End-to-end runs vs the reference's golden outputs."""
from pathlib import Path

import numpy as np
import pytest

from seqwin_tpu.cli import main
from seqwin_tpu.config import WORKINGDIR
from seqwin_tpu.utils import read_text

_shared = [
    '--kmerlen', '17',
    '--windowsize', '10',
    '--min-len', '17',
    '--max-len', '200',
    '--no-mash',
    '--no-blast',
]


def _run_cli(*args: str) -> Path:
    argv = list(args)
    assert main(argv) == 0
    prefix = Path(argv[argv.index('--prefix') + 1])
    title = argv[argv.index('--title') + 1]
    out_dir = prefix / title
    assert out_dir.exists()
    return out_dir


@pytest.fixture(scope='session')
def expected_fasta(ref_fixtures) -> str:
    return read_text(ref_fixtures / 'expected' / 'signatures.fasta')


def test_txt_mode_matches_expected(tmp_path, ref_fixtures, expected_fasta):
    out_dir = _run_cli(
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--threads', '1',
        '--title', 'txt-mode',
        *_shared,
    )
    assert read_text(out_dir / WORKINGDIR.markers_fasta) == expected_fasta


def test_dir_mode_matches_expected(tmp_path, ref_fixtures, expected_fasta):
    out_dir = _run_cli(
        '--tar-dir', str(ref_fixtures / 'targets'),
        '--neg-dir', str(ref_fixtures / 'non-targets'),
        '--prefix', str(tmp_path),
        '--threads', '1',
        '--title', 'dir-mode',
        *_shared,
    )
    assert read_text(out_dir / WORKINGDIR.markers_fasta) == expected_fasta


def test_multithreading_matches_expected(tmp_path, ref_fixtures, expected_fasta):
    out_dir = _run_cli(
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--threads', '2',
        '--title', 'threads-2',
        *_shared,
    )
    assert read_text(out_dir / WORKINGDIR.markers_fasta) == expected_fasta


def test_no_filter_graph_matches_expected(tmp_path, ref_fixtures):
    out_dir = _run_cli(
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--threads', '1',
        '--title', 'no-filter',
        '--no-filter',
        *_shared,
    )
    actual = np.load(out_dir / WORKINGDIR.graph, allow_pickle=False)
    expected = np.load(ref_fixtures / 'expected' / 'graph.npz', allow_pickle=False)
    assert set(actual.files) == {'kmers', 'nodes', 'edges', 'record_offsets'}
    np.testing.assert_array_equal(actual['kmers'], expected['kmers'])
    np.testing.assert_array_equal(actual['edges'], expected['edges'])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(actual['nodes'][f], expected['nodes'][f])
    np.testing.assert_allclose(
        actual['nodes']['penalty'], expected['nodes']['penalty'], rtol=0, atol=1e-12
    )
    np.testing.assert_array_equal(actual['record_offsets'], expected['record_offsets'])


def test_low_memory_graph_matches_expected(tmp_path, ref_fixtures):
    out_dir = _run_cli(
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--threads', '1',
        '--title', 'no-filter-lm',
        '--no-filter',
        '--low-memory',
        *_shared,
    )
    expected = np.load(ref_fixtures / 'expected' / 'graph.npz', allow_pickle=False)
    actual = np.load(out_dir / WORKINGDIR.graph, allow_pickle=False)
    np.testing.assert_array_equal(actual['kmers'], expected['kmers'])
    np.testing.assert_array_equal(actual['edges'], expected['edges'])


def test_results_roundtrip(tmp_path, ref_fixtures):
    from seqwin_tpu import load

    out_dir = _run_cli(
        '--tar-paths', str(ref_fixtures / 'targets.txt'),
        '--neg-paths', str(ref_fixtures / 'non-targets.txt'),
        '--prefix', str(tmp_path),
        '--threads', '1',
        '--title', 'roundtrip',
        *_shared,
    )
    inst = load(out_dir / WORKINGDIR.results)
    assert inst.markers is not None
    assert len(inst.markers) > 0
    assert inst.config.kmerlen == 17
