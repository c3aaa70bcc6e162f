#!/usr/bin/env python3
"""171-genome golden integration gate (SURVEY.md M2; reference
`tests/run_example.py:128-143`).

The reference's gate downloads 171 Salmonella assemblies (72 targets, 99
non-targets), runs the full pipeline with defaults (k=21, w=200,
min_len=200, no mash/blast) and byte-compares ``signatures.fasta`` against
``expected-output/signatures.fasta`` (155 signatures).

Two modes:

1. **Real dataset** -- if ``SEQWIN_ASSEMBLIES_DIR`` points at an extracted
   ``assemblies/`` tree matching the reference's ``targets.txt`` /
   ``non-targets.txt`` (`/root/reference/tests/`), this script runs the
   exact reference gate and byte-compares against
   ``/root/reference/tests/expected-output/signatures.fasta``.

2. **Proxy dataset** -- this build environment has NO network egress, so the
   release tarball cannot be fetched. The proxy synthesizes a 171-genome
   workload with the same shape (72 targets sharing a recent ancestor, 99
   related non-targets, multi-record assemblies with N runs, ~reference
   minimizer density) and asserts BYTE-EQUALITY of the full pipeline output
   (graph + signatures.fasta) between the TPU engine and the vectorized
   device-free NumPy builder (`ops/host_build.py`, itself differentially
   fuzz-tested against the per-position oracle `ops/oracle.py`, which is in
   turn validated against a literal btllib ring-buffer simulation and the
   reference's smoke goldens). This checks exactness at 171-genome scale; it
   does not replace the real dataset comparison, and says so in its output.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tests/run_golden171.py \
        [--genome-len N] [--prefix DIR]
"""
import argparse
import os
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

REF_TESTS = Path('/root/reference/tests')

# The real dataset, the moment network (or a pre-fetched copy) exists
# (`/root/reference/tests/run_example.py:32-33`):
DATASET_URL = ('https://github.com/treangenlab/Seqwin/releases/download/'
               'v0.1.0/assemblies.tar')
DATASET_SHA256 = ('149cf4450b3877ab88913ab340fbee60fb12f23bc0f858746b37fb6'
                  '78ec7fca6')
REAL_GATE_HOWTO = f"""\
To run the REAL gate: download {DATASET_URL}
verify sha256 == {DATASET_SHA256}, `tar -xf assemblies.tar` somewhere, then
  SEQWIN_ASSEMBLIES_DIR=/path/to/assemblies \\
  PYTHONPATH=/root/repo:/root/.axon_site python tests/run_golden171.py
(one TPU process at a time; byte-compares signatures.fasta against
/root/reference/tests/expected-output/signatures.fasta)"""


def run_cli(argv) -> None:
    from seqwin_tpu.cli import main

    rc = main([str(a) for a in argv])
    if rc != 0:
        raise SystemExit(f'seqwin-tpu exited with {rc}')


def read_text(p: Path) -> str:
    from seqwin_tpu.utils import read_text as rt

    return rt(p)


def real_gate(assemblies_dir: Path, prefix: Path,
              expected: 'Path | None' = None,
              backend: 'str | None' = None) -> Path:
    """The reference's integration gate (`run_example.py:114-143`): rewrite
    the tests/targets.txt + non-targets.txt relative entries against
    ``assemblies_dir``, run the full default pipeline, byte-compare
    signatures.fasta against ``expected``.

    ``expected=None`` uses the reference golden
    (`/root/reference/tests/expected-output/signatures.fasta`); tests pass a
    self-generated golden so this exact code path runs end-to-end even
    without the real dataset (VERDICT r4 #7). Returns the actual
    signatures.fasta path."""
    tar_list = prefix / 'targets.txt'
    neg_list = prefix / 'non-targets.txt'
    for src, dst in ((REF_TESTS / 'targets.txt', tar_list),
                     (REF_TESTS / 'non-targets.txt', neg_list)):
        lines = [
            str(assemblies_dir.parent / line.strip())
            for line in src.read_text().splitlines() if line.strip()
        ]
        dst.write_text('\n'.join(lines) + '\n')
    argv = [
        '--tar-paths', tar_list, '--neg-paths', neg_list,
        '--prefix', prefix, '--title', 'golden171', '--overwrite',
        '--no-mash', '--no-blast',
    ]
    if backend:
        argv += ['--backend', backend]
    run_cli(argv)
    actual_path = prefix / 'golden171' / 'signatures.fasta'
    if expected is None:
        expected = REF_TESTS / 'expected-output' / 'signatures.fasta'
    if read_text(actual_path) != read_text(expected):
        raise SystemExit(
            f'FAIL: signatures.fasta differs from the golden ({expected})')
    print('PASS: real 171-genome gate -- signatures.fasta byte-equal to '
          f'{expected}')
    return actual_path


def synth_proxy(out_dir: Path, genome_len: int, rng: np.random.Generator):
    """72 targets + 99 non-targets with reference-like structure."""
    alphabet = np.frombuffer(b'ACGTN', dtype=np.uint8)
    ancestor = rng.integers(0, 4, size=genome_len).astype(np.uint8)
    # non-targets: a related species (8% divergence from the ancestor)
    neg_root = ancestor.copy()
    idx = rng.integers(0, genome_len, size=int(genome_len * 0.08))
    neg_root[idx] = (neg_root[idx] + rng.integers(1, 4, size=idx.size)) % 4

    def write_genome(path: Path, root: np.ndarray, snp_rate: float, seed_i: int):
        g = root.copy()
        idx = rng.integers(0, genome_len, size=int(genome_len * snp_rate))
        g[idx] = (g[idx] + rng.integers(1, 4, size=idx.size)) % 4
        # an N run + a contig split, like real draft assemblies
        n0 = rng.integers(0, max(1, genome_len - 500))
        g[n0:n0 + rng.integers(10, 300)] = 4
        cut = rng.integers(genome_len // 4, 3 * genome_len // 4)
        recs = [g[:cut], g[cut:]]
        with open(path, 'w') as f:
            for ri, r in enumerate(recs):
                f.write(f'>proxy_{seed_i}_{ri}\n')
                seq = alphabet[r].tobytes().decode()
                for off in range(0, len(seq), 80):
                    f.write(seq[off:off + 80] + '\n')

    tar_paths, neg_paths = [], []
    for i in range(72):
        p = out_dir / f'tar_{i:03d}.fasta'
        write_genome(p, ancestor, 0.005, i)
        tar_paths.append(p)
    for i in range(99):
        p = out_dir / f'neg_{i:03d}.fasta'
        write_genome(p, neg_root, 0.01, 1000 + i)
        neg_paths.append(p)
    return tar_paths, neg_paths


def proxy_gate(prefix: Path, genome_len: int) -> None:
    print('NOTE: no network egress in this environment -- the reference '
          'release tarball (tests/run_example.py:32-33) cannot be fetched. '
          'Running the documented PROXY gate instead: 171 synthetic genomes, '
          'TPU engine vs vectorized NumPy reference, full pipeline, '
          'byte-equality.\n' + REAL_GATE_HOWTO,
          flush=True)
    rng = np.random.default_rng(171)
    data = prefix / 'data'
    data.mkdir(parents=True, exist_ok=True)
    tar_paths, neg_paths = synth_proxy(data, genome_len, rng)
    tar_list = prefix / 'targets.txt'
    neg_list = prefix / 'non-targets.txt'
    tar_list.write_text('\n'.join(str(p) for p in tar_paths) + '\n')
    neg_list.write_text('\n'.join(str(p) for p in neg_paths) + '\n')

    common = [
        '--tar-paths', tar_list, '--neg-paths', neg_list,
        '--prefix', prefix, '--overwrite', '--no-mash', '--no-blast',
    ]
    print(f'[1/2] device engine run ({171 * genome_len / 1e6:.0f} Mbp)...', flush=True)
    run_cli([*common, '--title', 'proxy-device'])
    print('[2/2] vectorized numpy-reference run...', flush=True)
    run_cli([*common, '--title', 'proxy-oracle', '--backend', 'numpy'])

    for name in ('signatures.fasta', 'signatures.csv'):
        dev = read_text(prefix / 'proxy-device' / name)
        orc = read_text(prefix / 'proxy-oracle' / name)
        if dev != orc:
            raise SystemExit(f'FAIL: device {name} != oracle {name}')
    n_sig = read_text(prefix / 'proxy-device' / 'signatures.fasta').count('>')
    print(f'PASS: proxy 171-genome gate -- {n_sig} signatures; pipeline '
          'output byte-equal between the TPU engine and the vectorized '
          'NumPy reference')


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--genome-len', type=int, default=300_000,
                    help='proxy genome length (default 300 kbp -> ~51 Mbp total)')
    ap.add_argument('--prefix', type=Path, default=None)
    ap.add_argument('--expected', type=Path, default=None,
                    help='real mode: golden signatures.fasta to compare '
                         'against (default: the reference expected-output)')
    ap.add_argument('--backend', default=None,
                    help='real mode: engine backend override (e.g. numpy)')
    args = ap.parse_args()

    prefix = args.prefix or Path(tempfile.mkdtemp(prefix='golden171_'))
    prefix.mkdir(parents=True, exist_ok=True)
    try:
        assemblies = os.environ.get('SEQWIN_ASSEMBLIES_DIR')
        if assemblies and Path(assemblies).is_dir():
            real_gate(Path(assemblies), prefix, expected=args.expected,
                      backend=args.backend)
        else:
            proxy_gate(prefix, args.genome_len)
    finally:
        if args.prefix is None:
            shutil.rmtree(prefix, ignore_errors=True)


if __name__ == '__main__':
    sys.exit(main())
