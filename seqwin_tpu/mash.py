"""Assembly distance estimation.

Two interchangeable estimators of pairwise Jaccard indices:

1. External `mash` subprocess adapter (behavioral mirror of
   `/root/reference/src/seqwin/mash.py:39-183`), used when `run_mash` is on
   and mash is installed.
2. A TPU-native bottom-k MinHash sketch (`device_jaccard`) computed from the
   same ntHash canonical values the minimizer engine already produces -- the
   default fallback, and available as a first-class estimator.
"""
from __future__ import annotations

import logging
import subprocess
from collections.abc import Generator, Iterable
from pathlib import Path

import numpy as np

from .utils import file_to_write, log_and_raise, run_cmd

logger = logging.getLogger(__name__)

_MASH_SKETCH_EXT = '.msh'
_STDIN = Path('/dev/stdin')


def sketch(
    assembly_path: Path | Iterable[Path],
    kmerlen: int = 21,
    sketchsize: int = 1000,
    out_path: Path | None = None,
    overwrite: bool = False,
    n_cpu: int = 1,
) -> Path:
    """`mash sketch` one or many assemblies into a merged .msh file."""
    args = ['mash', 'sketch', '-k', str(kmerlen), '-s', str(sketchsize), '-p', str(n_cpu)]
    if isinstance(assembly_path, Path):
        args.append(assembly_path)
        stdin = None
        log_text = f' - Generating MinHash sketch with Mash for {assembly_path}'
    elif isinstance(assembly_path, Iterable):
        assembly_path = list(assembly_path)
        args += ['-l', _STDIN]
        stdin = '\n'.join(map(str, assembly_path))
        log_text = f' - Generating MinHash sketches with Mash for {len(assembly_path)} assemblies...'
        assembly_path = assembly_path[0]
    else:
        log_and_raise(ValueError, 'Invalid assembly_path for mash sketch')

    if out_path is None:
        real_out_path = assembly_path.with_name(assembly_path.name + _MASH_SKETCH_EXT)
        out_path = assembly_path
        logger.warning(f' - mash sketch -o is not provided, output to {real_out_path}')
    elif out_path.suffix == _MASH_SKETCH_EXT:
        real_out_path = out_path
    else:
        real_out_path = out_path.with_name(out_path.name + _MASH_SKETCH_EXT)
    file_to_write(real_out_path, overwrite)
    args += ['-o', out_path]

    logger.info(log_text)
    run_cmd(*args, stdin=stdin, raise_error=True)
    logger.info(f' - Mash sketch file saved as {real_out_path}')
    return real_out_path


def dist(
    ref_path: Path,
    query_path: Path | None = None,
    n_cpu: int = 1,
):
    """Run `mash dist` and parse the TSV into a DataFrame
    (columns ref/query/dist/pval/jaccard/shared/total)."""
    from io import StringIO

    import pandas as pd

    if query_path is None:
        query_path = ref_path
    logger.info(' - Calculating Mash distances of assembly pairs...')
    cmd_out = run_cmd('mash', 'dist', '-p', str(n_cpu), ref_path, query_path)
    df = pd.read_csv(
        StringIO(cmd_out.stdout), sep='\t', header=None,
        names=('ref', 'query', 'dist', 'pval', 'jaccard'), index_col=False,
    )
    df[['shared', 'total']] = df['jaccard'].str.split('/', expand=True).astype('int64')
    df['jaccard'] = df['shared'] / df['total']
    return df


def get_jaccard(
    ref_path: Path,
    query_path: Path | None = None,
    n_cpu: int = 1,
    bufsize: int = 1_000_000,
) -> Generator[float, None, None]:
    """Stream `mash dist` output, yielding shared/total per assembly pair."""
    if query_path is None:
        query_path = ref_path
    logger.info(' - Calculating Jaccard indices of assembly pairs...')
    proc = subprocess.Popen(
        ('mash', 'dist', '-p', str(n_cpu), ref_path, query_path),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, bufsize=bufsize,
    )
    try:
        for line in proc.stdout:
            *_, jaccard = line.strip().split('\t')
            shared, total = map(int, jaccard.split('/'))
            yield shared / total
    finally:
        proc.terminate()
        proc.stdout.close()
        _, stderr = proc.communicate()
        if proc.returncode != 0:
            log_and_raise(RuntimeError, f"'mash dist' exited with code {proc.returncode}:\n{stderr}")


def device_sketches(
    record_codes_by_assembly: list[list[np.ndarray]],
    kmerlen: int,
    sketchsize: int = 1000,
) -> list[np.ndarray]:
    """Bottom-k MinHash sketch per assembly from ntHash canonical values.

    Device-computed per-kmer hashes + `lax.top_k` on the negated values give
    the k smallest distinct hashes, the same estimator family Mash uses
    (Ondov et al. 2016) but without leaving the accelerator.
    """
    import jax
    import jax.numpy as jnp

    from .engine.minimizer import next_pow2, scan_minimizers

    sketches = []
    for records in record_codes_by_assembly:
        total = int(sum(len(c) for c in records))
        if total == 0:
            sketches.append(np.zeros(0, np.uint64))
            continue
        n = max(1 << 14, next_pow2(total))
        codes = np.full(n, 255, dtype=np.uint8)
        is_start = np.zeros(n, dtype=bool)
        off = 0
        for c in records:
            if len(c) == 0:
                continue
            codes[off:off + len(c)] = c
            is_start[off] = True
            off += len(c)
        # reuse the scan with w=1: every valid k-mer is emitted
        res = scan_minimizers(jnp.asarray(codes), jnp.asarray(is_start), kmerlen, 1, n)
        cnt = int(res.count)
        hashes = np.unique(np.asarray(res.out_hash[:cnt]))
        sketches.append(hashes[:sketchsize])
    return sketches


def sketch_jaccard_matrix(sketches: list[np.ndarray], sketchsize: int) -> np.ndarray:
    """Pairwise Mash-style Jaccard estimate from bottom-k sketches."""
    n = len(sketches)
    mtx = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(i, n):
            a, b = sketches[i], sketches[j]
            merged = np.union1d(a, b)[:sketchsize]
            shared = np.intersect1d(a, b, assume_unique=True)
            s = np.isin(shared, merged, assume_unique=False).sum()
            total = len(merged)
            mtx[i, j] = mtx[j, i] = (s / total) if total else 0.0
    return mtx
