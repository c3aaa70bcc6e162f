#!/usr/bin/env python3
"""TPU smoke gate: drive the CLI on the REAL chip (compiled Mosaic kernel)
and byte-compare against the reference goldens.

The unit suite runs the Pallas kernel only in interpret mode on CPU
(`tests/conftest.py`); this script is the automated correctness gate for the
COMPILED kernel + the full device pipeline: it runs the reference smoke
fixtures through `python -m seqwin_tpu` on the default (axon/TPU) backend
and asserts:

1. `--no-filter` `graph.npz` equality vs
   `/root/reference/tests/smoke/fixtures/expected/graph.npz` (kmers/edges
   exact; nodes exact except penalty, which the reference stores post-build);
2. full-pipeline `signatures.fasta` byte-equality vs the reference golden.

Usage (one TPU process at a time; budget ~3-10 min for cold compiles):
    PYTHONPATH=/root/repo:/root/.axon_site python tests/run_tpu_smoke.py
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

FIX = Path('/root/reference/tests/smoke/fixtures')
SHARED = [
    '--kmerlen', '17', '--windowsize', '10',
    '--min-len', '17', '--max-len', '200',
    '--no-mash', '--no-blast', '--overwrite',
]


def run_cli(argv) -> None:
    from seqwin_tpu.cli import main

    rc = main([str(a) for a in argv])
    if rc != 0:
        raise SystemExit(f'seqwin-tpu exited with {rc}')


def main() -> None:
    import jax

    backend = jax.default_backend()
    if backend not in ('tpu', 'axon'):
        raise SystemExit(
            f'FAIL: default backend is {backend!r}, not a TPU -- this gate '
            'must exercise the compiled Mosaic kernel '
            '(is /root/.axon_site on PYTHONPATH?)'
        )
    print(f'backend: {backend}; devices: {jax.devices()}', flush=True)

    with tempfile.TemporaryDirectory(prefix='tpu_smoke_') as td:
        prefix = Path(td)
        common = [
            '--tar-paths', FIX / 'targets.txt',
            '--neg-paths', FIX / 'non-targets.txt',
            '--prefix', prefix, *SHARED,
        ]
        print('[1/4] --no-filter graph build on TPU...', flush=True)
        run_cli([*common, '--title', 'graph', '--no-filter'])
        actual = np.load(prefix / 'graph' / 'graph.npz', allow_pickle=False)
        expected = np.load(FIX / 'expected' / 'graph.npz', allow_pickle=False)
        np.testing.assert_array_equal(actual['kmers'], expected['kmers'])
        np.testing.assert_array_equal(actual['edges'], expected['edges'])
        for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
            np.testing.assert_array_equal(actual['nodes'][f], expected['nodes'][f])
        np.testing.assert_array_equal(
            actual['record_offsets'], expected['record_offsets'])
        print('GRAPH_NPZ_OK', flush=True)

        print('[2/4] full pipeline on TPU...', flush=True)
        run_cli([*common, '--title', 'full'])
        act = (prefix / 'full' / 'signatures.fasta').read_bytes()
        exp = (FIX / 'expected' / 'signatures.fasta').read_bytes()
        if act != exp:
            raise SystemExit('FAIL: signatures.fasta differs from the golden')
        print('GOLDEN_FASTA_OK', flush=True)

        # the alternative extraction variants must be byte-equal with the
        # COMPILED kernels too (the unit suite only covers interpret mode)
        import os

        for i, mode in enumerate(('rank', 'pfx')):
            print(f'[{3 + i}/4] full pipeline, SEQWIN_TPU_EXTRACT={mode}...',
                  flush=True)
            os.environ['SEQWIN_TPU_EXTRACT'] = mode
            try:
                run_cli([*common, '--title', f'full_{mode}'])
            finally:
                os.environ.pop('SEQWIN_TPU_EXTRACT', None)
            act_m = (prefix / f'full_{mode}' / 'signatures.fasta').read_bytes()
            if act_m != exp:
                raise SystemExit(
                    f'FAIL: signatures.fasta ({mode} extraction) differs')
            print(f'GOLDEN_FASTA_OK ({mode})', flush=True)

    print('PASS: compiled-Mosaic TPU smoke gate (graph.npz + signatures.fasta '
          'byte-equal to the reference goldens; topk/rank/pfx extraction)')


if __name__ == '__main__':
    sys.exit(main())
