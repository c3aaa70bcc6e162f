#!/usr/bin/env python3
"""External-tool adapter smoke: run each subprocess adapter against the REAL
binary when it exists on PATH, skip cleanly when it does not.

This build environment ships none of mash / BLAST+ / NCBI datasets, so in
CI here every section prints SKIP and the script exits 0 -- the adapters are
exercised only under monkeypatched subprocesses (`tests/test_eval_blast.py`,
`tests/test_sketch.py`). The moment the binaries exist (any user machine),
this is the one-command check that real processes accept the adapters'
exact argv/stdin and that we parse their real output:

    PYTHONPATH=/root/repo python tests/run_tools_smoke.py

Sections (each independent):
  mash     -- `mash.sketch` (list->stdin mode) + `mash.dist` DataFrame +
              `mash.get_jaccard` stream on two synthetic FASTAs; also
              cross-checks the TPU-native `sketch_jaccard_matrix` estimate
              against mash's within 0.1 absolute.
  blast    -- `Assemblies.makeblastdb` (ordered header-rewritten stdin
              streaming) + `ncbi.blast` of a window of the first genome;
              asserts the self-hit comes back with qseqid 0.
  datasets -- `ncbi.search_taxon` (needs network; a network failure is
              reported as SKIP, a parse failure as FAIL).

Exit status: 0 = every present tool passed (or nothing present); 1 = a
present tool failed its smoke.
"""
import sys
import tempfile
import traceback
from pathlib import Path

import numpy as np


def synth_fastas(tmp: Path, n: int = 2, length: int = 50_000):
    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b'ACGT', dtype=np.uint8)
    base = rng.integers(0, 4, size=length).astype(np.uint8)
    paths = []
    for i in range(n):
        g = base.copy()
        idx = rng.integers(0, length, size=length // 50)
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        p = tmp / f'tool_smoke_{i}.fasta'
        seq = alpha[g].tobytes()
        with open(p, 'wb') as f:
            f.write(b'>s%d\n' % i)
            for off in range(0, len(seq), 80):
                f.write(seq[off:off + 80] + b'\n')
        paths.append(p)
    return paths


def smoke_mash(tmp: Path) -> None:
    from seqwin_tpu import mash

    paths = synth_fastas(tmp / 'mash')
    msh = mash.sketch(paths, kmerlen=21, sketchsize=1000,
                      out_path=tmp / 'mash' / 'smoke.msh', overwrite=True)
    assert msh.is_file(), msh
    df = mash.dist(msh)
    assert len(df) == 4 and set(df.columns) >= {'jaccard', 'shared', 'total'}
    jacc = list(mash.get_jaccard(msh))
    assert len(jacc) == 4 and all(0.0 <= j <= 1.0 for j in jacc)
    off_diag = [j for j, (r, q) in zip(jacc, zip(df['ref'], df['query']))
                if r != q]
    from seqwin_tpu.io.fasta import parse_fasta_codes

    codes = [parse_fasta_codes(p)[1] for p in paths]
    sk = mash.device_sketches(codes, kmerlen=21, sketchsize=1000)
    est = mash.sketch_jaccard_matrix(sk, sketchsize=1000)
    dev = float(est[0, 1])
    assert abs(dev - off_diag[0]) < 0.1, (dev, off_diag[0])
    print(f'PASS mash: 4 pairs, jaccard(0,1)={off_diag[0]:.3f} '
          f'(device estimate {dev:.3f})')


def smoke_blast(tmp: Path) -> None:
    from seqwin_tpu import ncbi
    from seqwin_tpu.assemblies import Assemblies

    d = tmp / 'blast'
    paths = synth_fastas(d)
    asm = Assemblies(paths[:1], paths[1:])
    db = asm.makeblastdb(prefix=d, neg_only=False, overwrite=True, n_cpu=1)
    query = paths[0].read_text().split('\n', 1)[1].replace('\n', '')[:500]
    hits = ncbi.blast([query], db, n_cpu=1)
    assert len(hits) >= 1 and int(hits['qseqid'].iloc[0]) == 0, hits
    print(f'PASS blast: makeblastdb + blastn self-hit ({len(hits)} rows)')


def smoke_datasets(tmp: Path) -> None:
    from seqwin_tpu import ncbi

    try:
        tax_id, sci_name = ncbi.search_taxon('Salmonella enterica')
    except Exception as e:
        print(f'SKIP datasets: binary present but query failed '
              f'(no network?): {e}')
        return
    assert tax_id == '28901', (tax_id, sci_name)
    print(f'PASS datasets: search_taxon -> {tax_id} ({sci_name})')


def main() -> int:
    from seqwin_tpu.config import HAS_BLAST, HAS_DATASETS, HAS_MASH

    sections = [('mash', HAS_MASH, smoke_mash),
                ('blast', HAS_BLAST, smoke_blast),
                ('datasets', HAS_DATASETS, smoke_datasets)]
    failed = []
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        for name, present, fn in sections:
            if not present:
                print(f'SKIP {name}: binary not on PATH')
                continue
            try:
                fn(tmp)
            except Exception:
                traceback.print_exc()
                failed.append(name)
    if failed:
        print(f'FAIL: {", ".join(failed)}')
        return 1
    print('tools smoke complete')
    return 0


if __name__ == '__main__':
    sys.exit(main())
