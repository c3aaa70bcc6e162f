"""Real-mode golden171 gate path, exercised WITHOUT the real dataset
(VERDICT r4 #7): synthesize gzipped `.fna.gz` assemblies at EXACTLY the
relative paths the reference's `tests/targets.txt` / `non-targets.txt`
list (`/root/reference/tests/run_example.py:32-33,114-143`), then drive
`tests/run_golden171.py::real_gate` end-to-end -- list translation, gz
FASTA ingestion of all 171 files, the full default pipeline, and the
byte-compare (both PASS and FAIL branches). The moment
`SEQWIN_ASSEMBLIES_DIR` points at the real extracted tarball, the same
code path runs the reference comparison unchanged.
"""
import gzip
import shutil
from pathlib import Path

import numpy as np
import pytest

import run_golden171 as g171

GENOME_LEN = 20_000


def _synth_tree(root: Path) -> Path:
    """Write a tiny gz assembly at every relative path in both lists."""
    rng = np.random.default_rng(42)
    alpha = np.frombuffer(b'ACGT', dtype=np.uint8)
    ancestor = rng.integers(0, 4, size=GENOME_LEN).astype(np.uint8)
    neg_root = ancestor.copy()
    idx = rng.integers(0, GENOME_LEN, size=GENOME_LEN // 12)
    neg_root[idx] = (neg_root[idx] + rng.integers(1, 4, size=idx.size)) % 4

    for list_name, base in (('targets.txt', ancestor),
                            ('non-targets.txt', neg_root)):
        rate = 200 if list_name == 'targets.txt' else 100
        for line in (g171.REF_TESTS / list_name).read_text().splitlines():
            rel = line.strip()
            if not rel:
                continue
            g = base.copy()
            idx = rng.integers(0, GENOME_LEN, size=GENOME_LEN // rate)
            g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
            seq = alpha[g].tobytes()
            p = root / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            body = b'>rec0\n' + b'\n'.join(
                seq[i:i + 80] for i in range(0, len(seq), 80)) + b'\n'
            with gzip.open(p, 'wb') as f:
                f.write(body)
    return root / 'assemblies'


def test_real_mode_gate_end_to_end(tmp_path):
    assemblies = _synth_tree(tmp_path / 'ds')
    assert assemblies.is_dir()  # every listed rel-path starts 'assemblies/'

    # PASS branch: self-comparison proves the run + compare plumbing without
    # needing a pre-existing golden
    prefix1 = tmp_path / 'run1'
    prefix1.mkdir()
    actual1 = g171.real_gate(
        assemblies, prefix1,
        expected=prefix1 / 'golden171' / 'signatures.fasta',
        backend='numpy')
    text1 = actual1.read_text()
    assert text1.count('>') >= 1, 'no signatures produced'
    # all 171 listed assemblies must have been ingested
    csv = (prefix1 / 'golden171' / 'assemblies.csv').read_text()
    assert len([ln for ln in csv.splitlines() if ln.strip()]) - 1 == 171

    # cross-run determinism: a fresh run must byte-match run 1's golden
    golden = tmp_path / 'golden.fasta'
    shutil.copy(actual1, golden)
    prefix2 = tmp_path / 'run2'
    prefix2.mkdir()
    actual2 = g171.real_gate(assemblies, prefix2, expected=golden,
                             backend='numpy')
    assert actual2.read_text() == text1

    # FAIL branch: a corrupted golden must abort with the FAIL message
    golden.write_text(text1[:-2] + 'X\n')
    with pytest.raises(SystemExit, match='FAIL'):
        g171.real_gate(assemblies, prefix2, expected=golden, backend='numpy')
