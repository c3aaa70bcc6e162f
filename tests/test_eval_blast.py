"""Eval/BLAST stack tests (no external BLAST+ needed).

Covers the three rewritten pieces the reference only exercises through real
runs (`/root/reference/src/seqwin/markers.py:607-696`,
`/root/reference/src/seqwin/assemblies.py:143-219`):

- `_best_hits_per_assembly` differential vs a literal pandas
  sort_values(stable)/groupby/head(1) chain on randomized hit tables with
  deliberate bitscore ties (PARITY.md "Known tie-case divergence": our rule
  equals the stable chain; the reference's unstable quicksort is a superset);
- `eval_markers` end-to-end with a mocked `blast()`;
- `Assemblies.makeblastdb` streaming with a stubbed subprocess sink,
  asserting stdin byte order and header rewriting.
"""
import gzip
import subprocess

import numpy as np
import pandas as pd
import pytest

from seqwin_tpu.assemblies import Assemblies, _rewrite_fasta_headers
from seqwin_tpu.config import BLASTCONFIG
from seqwin_tpu.pipeline.markers import (
    _best_hits_per_assembly,
    _get_metrics,
    eval_markers,
)


def _literal_best_hits(blast_out: pd.DataFrame) -> pd.DataFrame:
    """The reference's chain (`markers.py:652-668`) with a STABLE sort, which
    pins its unspecified tie order to 'first reported wins'."""
    df = blast_out.sort_values(
        by=['qseqid', 'assembly_idx', 'bitscore'],
        ascending=[True, True, False],
        kind='mergesort',
    )
    grouped = df.groupby(by=['qseqid', 'assembly_idx'], as_index=True, sort=False)
    nident = grouped['nident'].agg(n_hits='count', avg_nident='mean')
    best = grouped.head(1).reset_index(drop=True)
    nident = nident.reset_index(drop=True)
    return pd.concat([best, nident], axis=1)


def _random_hit_table(rng: np.random.Generator, n_rows: int) -> pd.DataFrame:
    return pd.DataFrame(
        dict(
            qseqid=rng.integers(0, 5, n_rows),
            assembly_idx=rng.integers(0, 4, n_rows),
            # small integer bitscores force plenty of ties
            bitscore=rng.integers(50, 55, n_rows).astype(np.float64),
            nident=rng.integers(80, 120, n_rows),
            mismatch=rng.integers(0, 10, n_rows),
            gaps=rng.integers(0, 3, n_rows),
            record_id=[f'rec{i}' for i in range(n_rows)],
            is_target=rng.integers(0, 2, n_rows).astype(bool),
        )
    )


@pytest.mark.parametrize('seed', range(8))
def test_best_hits_matches_literal_pandas_chain(seed):
    rng = np.random.default_rng(seed)
    table = _random_hit_table(rng, int(rng.integers(1, 200)))
    ours = _best_hits_per_assembly(table)
    literal = _literal_best_hits(table)
    pd.testing.assert_frame_equal(
        ours.reset_index(drop=True), literal.reset_index(drop=True)
    )


def test_best_hits_tie_goes_to_first_reported():
    table = pd.DataFrame(
        dict(
            qseqid=[0, 0, 0],
            assembly_idx=[1, 1, 1],
            bitscore=[99.0, 99.0, 42.0],
            nident=[10, 20, 30],
            record_id=['first', 'second', 'third'],
            is_target=[True, True, True],
        )
    )
    best = _best_hits_per_assembly(table)
    assert len(best) == 1
    assert best.loc[0, 'record_id'] == 'first'
    assert best.loc[0, 'n_hits'] == 3
    assert best.loc[0, 'avg_nident'] == pytest.approx(20.0)


def _tag(asm: int, is_target: bool, rec: str) -> str:
    sep = BLASTCONFIG.header_sep
    return f'{asm}{sep}{BLASTCONFIG.bool2str[is_target]}{sep}{rec}'


def test_eval_markers_with_mocked_blast(monkeypatch, tmp_path, caplog):
    """eval_markers: formatting, best-hit reduction, per-query grouping,
    no-hit warning, and metric computation -- blast() fully mocked."""
    import seqwin_tpu.pipeline.markers as markers_mod

    # two queries; query 0 hits 2 assemblies (one twice), query 2 hits one
    # non-target; query 1 has NO hits -> warning + baseline metrics
    raw = pd.DataFrame(
        dict(
            qseqid=[0, 0, 0, 2],
            sseqid=[
                _tag(0, True, 'r0'),
                _tag(0, True, 'r0b'),
                _tag(1, True, 'r1'),
                _tag(2, False, 'r2'),
            ],
            nident=[100, 90, 95, 50],
            mismatch=[0, 5, 2, 10],
            gaps=[0, 1, 0, 2],
            bitscore=[200.0, 180.0, 190.0, 77.0],
        )
    )
    calls = {}

    def fake_blast(seqs, db, task, columns, n_cpu, batch_size):
        calls['seqs'] = list(seqs)
        return raw.copy()

    monkeypatch.setattr(markers_mod, 'blast', fake_blast)
    blastdb = tmp_path / BLASTCONFIG.title_all
    seqs = ['A' * 100, 'C' * 100, 'G' * 100]
    with caplog.at_level('WARNING'):
        all_blast, metrics = eval_markers(seqs, blastdb, n_tar=2, n_neg=1, n_cpu=1)

    assert calls['seqs'] == seqs
    assert all_blast[1] is None
    assert any('no BLAST hit' in r.message for r in caplog.records)

    b0 = all_blast[0]
    assert list(b0['assembly_idx']) == [0, 1]
    assert list(b0['record_id']) == ['r0', 'r1']  # best hit of assembly 0
    assert list(b0['n_hits']) == [2, 1]
    assert list(b0['avg_nident']) == [95.0, 95.0]

    # metrics: query 0 over targets (marker_len 100, n_tar 2)
    m0 = metrics[0]
    assert m0.conservation == pytest.approx((100 + 95) / 100 / 2)
    assert m0.f_tar_hits == pytest.approx(1.0)
    # query 1 has no hits -> baseline metrics
    assert metrics[1].conservation == 0
    assert metrics[1].f_tar_hits == 0
    # query 2: one non-target hit
    m2 = metrics[2]
    assert m2.divergence == pytest.approx((10 + 2) / 100 / 1)
    assert m2.f_neg_hits == pytest.approx(1.0)


def test_get_metrics_none_is_baseline():
    m = _get_metrics(None, 100, 2, 2)
    assert m.conservation == 0 and m.divergence == 0


class _FakeProc:
    """Stub makeblastdb process: records stdin bytes, exits 0."""

    def __init__(self):
        import io

        self.stdin = io.BytesIO()
        self.returncode = 0

    def communicate(self):
        return b'fake stdout', b''


def test_makeblastdb_stream_order_and_headers(monkeypatch, tmp_path):
    """The stdin byte stream must be the assemblies in index order, each with
    every header rewritten to `{idx}{sep}{t/f}{sep}` tags."""
    paths = []
    for i in range(4):
        p = tmp_path / f'a{i}.fasta'
        p.write_text(f'>rec{i} extra\nACGT\n>rec{i}b\nTTTT\n')
        paths.append(p)
    # one gzipped input exercises the decompress path
    gz = tmp_path / 'a4.fasta.gz'
    gz.write_bytes(gzip.compress(b'>rec4\nGGGG\n'))
    paths.append(gz)

    asm = Assemblies(paths[:3], paths[3:])

    fake = _FakeProc()
    monkeypatch.setattr(subprocess, 'Popen', lambda *a, **k: fake)
    out = asm.makeblastdb(
        prefix=tmp_path / 'blastdb', neg_only=False, overwrite=False, n_cpu=2
    )
    assert out.name == BLASTCONFIG.title_all

    sep = BLASTCONFIG.header_sep
    expected = b''.join(
        _rewrite_fasta_headers(p, i, i < 3) for i, p in enumerate(paths)
    )
    assert fake.stdin.getvalue() == expected
    # spot-check the header text itself
    assert f'>0{sep}y{sep}rec0 extra'.encode() in fake.stdin.getvalue()
    assert f'>4{sep}n{sep}rec4'.encode() in fake.stdin.getvalue()


def test_makeblastdb_neg_only_subset(monkeypatch, tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f'b{i}.fasta'
        p.write_text(f'>r{i}\nAAAA\n')
        paths.append(p)
    asm = Assemblies(paths[:2], paths[2:])
    fake = _FakeProc()
    monkeypatch.setattr(subprocess, 'Popen', lambda *a, **k: fake)
    out = asm.makeblastdb(
        prefix=tmp_path / 'blastdb', neg_only=True, overwrite=False, n_cpu=1
    )
    assert out.name == BLASTCONFIG.title_neg_only
    assert fake.stdin.getvalue() == _rewrite_fasta_headers(paths[2], 2, False)


def test_windowed_ordered_preserves_submission_order():
    """The bounded-window pipeline must yield strictly in job order even when
    later jobs finish first."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from seqwin_tpu.assemblies import _windowed_ordered

    def job(i):
        time.sleep(0.02 if i % 3 == 0 else 0.0)
        return i

    with ThreadPoolExecutor(max_workers=4) as ex:
        got = list(_windowed_ordered(ex, job, ((i,) for i in range(20)), window=3))
    assert got == list(range(20))
