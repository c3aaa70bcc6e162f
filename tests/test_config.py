"""Config validation and CLI mapping (contract of the reference's
test_config.py / test_cli.py)."""
import json

import pytest

from seqwin_tpu.config import Config


def _touch_inputs(tmp_path):
    tar = tmp_path / 'tar.txt'
    neg = tmp_path / 'neg.txt'
    tar.write_text('')
    neg.write_text('')
    return tar, neg


def test_path_resolution_and_frozen(tmp_path):
    tar, neg = _touch_inputs(tmp_path)
    cfg = Config(tar_paths=tar, neg_paths=neg, prefix=tmp_path)
    assert cfg.tar_paths.is_absolute()
    assert cfg.prefix == tmp_path.resolve()
    with pytest.raises(Exception):
        cfg.kmerlen = 5  # frozen


def test_missing_input_rejected(tmp_path):
    with pytest.raises(Exception):
        Config(tar_paths=tmp_path / 'nope.txt', neg_paths=tmp_path / 'nope2.txt')


def test_requires_target_and_nontarget(tmp_path):
    tar, neg = _touch_inputs(tmp_path)
    with pytest.raises(Exception):
        Config(tar_paths=tar)
    with pytest.raises(Exception):
        Config(neg_paths=neg)
    Config(tar_paths=tar, neg_paths=neg)  # ok


def test_value_ranges(tmp_path):
    tar, neg = _touch_inputs(tmp_path)
    with pytest.raises(Exception):
        Config(tar_paths=tar, neg_paths=neg, penalty_th=1.5)
    with pytest.raises(Exception):
        Config(tar_paths=tar, neg_paths=neg, stringency=11)
    with pytest.raises(Exception):
        Config(tar_paths=tar, neg_paths=neg, min_len=200, max_len=100)


def test_json_roundtrip_and_secret(tmp_path):
    tar, neg = _touch_inputs(tmp_path)
    cfg = Config(tar_paths=tar, neg_paths=neg, api_key='secret-key')
    dumped = json.loads(cfg.model_dump_json())
    assert dumped['kmerlen'] == 21
    assert 'secret-key' not in cfg.model_dump_json()
    assert 'version' in dumped


def test_cli_maps_options(tmp_path, monkeypatch):
    from seqwin_tpu import cli

    tar, neg = _touch_inputs(tmp_path)
    captured = {}

    def fake_run(config):
        captured['config'] = config

    monkeypatch.setattr('seqwin_tpu.core.run', fake_run)
    rc = cli.main([
        '--tar-paths', str(tar), '--neg-paths', str(neg),
        '--prefix', str(tmp_path), '--kmerlen', '17', '--windowsize', '10',
        '--no-mash', '--no-blast', '--threads', '3', '--seed', '7',
        '--stringency', '8', '--min-len', '50', '--max-len', '300',
    ])
    assert rc == 0
    cfg = captured['config']
    assert cfg.kmerlen == 17
    assert cfg.windowsize == 10
    assert cfg.run_mash is False
    assert cfg.run_blast is False
    assert cfg.n_cpu == 3
    assert cfg.seed == 7
    assert cfg.stringency == 8
    assert cfg.min_len == 50
    assert cfg.max_len == 300


def test_cli_missing_inputs_fails(tmp_path):
    from seqwin_tpu import cli

    assert cli.main(['--prefix', str(tmp_path)]) == 2


def test_cli_version(capsys):
    from seqwin_tpu import cli

    with pytest.raises(SystemExit) as e:
        cli.main(['--version'])
    assert e.value.code == 0
