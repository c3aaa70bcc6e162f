"""Run-orchestration tests (contract of the reference's test_core.py)."""
import pytest

from seqwin_tpu.config import Config, WORKINGDIR


def _inputs(tmp_path):
    import numpy as np

    rng = np.random.default_rng(0)
    alphabet = np.array(list('ACGT'))
    core = ''.join(rng.choice(alphabet, 3000))
    paths = []
    for i in range(4):
        seq = core + ''.join(rng.choice(alphabet, 1500)) if i < 2 else ''.join(rng.choice(alphabet, 4000))
        p = tmp_path / f'g{i}.fasta'
        p.write_text(f'>g{i}\n{seq}\n')
        paths.append(p)
    tar = tmp_path / 'tar.txt'
    neg = tmp_path / 'neg.txt'
    tar.write_text('\n'.join(map(str, paths[:2])))
    neg.write_text('\n'.join(map(str, paths[2:])))
    return tar, neg


def test_download_only_short_circuits(tmp_path, monkeypatch):
    from seqwin_tpu import core

    called = {'run': False}

    def fake_run(self):
        called['run'] = True

    monkeypatch.setattr(core.Seqwin, 'run', fake_run)
    tar, neg = _inputs(tmp_path)
    cfg = Config(
        tar_paths=tar, neg_paths=neg, prefix=tmp_path, title='dl-only',
        download_only=True, run_mash=False, run_blast=False,
    )
    core.run(cfg)
    assert not called['run']


def test_overwrite_semantics(tmp_path):
    from seqwin_tpu.core import run

    tar, neg = _inputs(tmp_path)
    common = dict(
        tar_paths=tar, neg_paths=neg, prefix=tmp_path, title='ow',
        kmerlen=15, windowsize=10, min_len=50, run_mash=False, run_blast=False, n_cpu=1,
    )
    run(Config(**common))
    out = tmp_path / 'ow'
    assert (out / WORKINGDIR.results).is_file()
    assert (out / WORKINGDIR.markers_fasta).is_file()
    # second run without --overwrite must refuse
    with pytest.raises(FileExistsError):
        run(Config(**common))
    # with overwrite it succeeds
    run(Config(**common, overwrite=True))
