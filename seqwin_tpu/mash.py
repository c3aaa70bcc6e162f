"""Assembly distance estimation.

Two interchangeable estimators of pairwise Jaccard indices:

1. External `mash` subprocess adapter (behavioral mirror of
   `/root/reference/src/seqwin/mash.py:39-183`), used when `run_mash` is on
   and mash is installed.
2. A TPU-native bottom-k MinHash sketch (`device_sketches` +
   `sketch_jaccard_matrix`): one compiled shape per run, sketches and the
   pairwise Jaccard matrix both computed on device.
"""
from __future__ import annotations

import functools
import logging
import subprocess
from collections.abc import Generator, Iterable
from pathlib import Path

import numpy as np

from .utils import claim_file, fail, run_tool

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
        fail(ValueError, 'Invalid assembly_path for mash sketch')

    if out_path is None:
        real_out_path = assembly_path.with_name(assembly_path.name + _MASH_SKETCH_EXT)
        out_path = assembly_path
        logger.warning(f' - mash sketch -o is not provided, output to {real_out_path}')
    elif out_path.suffix == _MASH_SKETCH_EXT:
        real_out_path = out_path
    else:
        real_out_path = out_path.with_name(out_path.name + _MASH_SKETCH_EXT)
    claim_file(real_out_path, overwrite)
    args += ['-o', out_path]

    logger.info(log_text)
    run_tool(*args, stdin=stdin, check=True)
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
    cmd_out = run_tool('mash', 'dist', '-p', str(n_cpu), ref_path, query_path)
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
            fail(RuntimeError, f"'mash dist' exited with code {proc.returncode}:\n{stderr}")


# ---------------------------------------------------------------------------
# TPU-native estimator
# ---------------------------------------------------------------------------

def _bottom_k_kernel_impl(codes, k: int, sketchsize: int):
    """Device bottom-k distinct canonical ntHash values of one base stream.

    ``codes`` is the assembly's records joined with single 255 separators
    (a separator invalidates every k-mer spanning it, so no record-start
    bookkeeping is needed). Returns (sketch u64[sketchsize] ascending,
    MAX-padded; n_distinct i32).
    """
    import jax.numpy as jnp

    from .engine.minimizer import (
        _select_seed,
        _srol_parts,
        _window_any,
        _window_xor,
    )
    from .ops.hashing import M64, SEEDS, SEEDS_COMP

    u64 = jnp.uint64
    n = codes.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    im33 = iota % 33
    im31 = iota % 31
    neg33 = (33 - im33) % 33
    neg31 = (31 - im31) % 31
    a = _srol_parts(_select_seed(codes, SEEDS), neg33, neg31)
    b = _srol_parts(_select_seed(codes, SEEDS_COMP), im33, im31)
    fwd = _srol_parts(_window_xor(a, k), (im33 + (k - 1)) % 33, (im31 + (k - 1)) % 31)
    rev = _srol_parts(_window_xor(b, k), neg33, neg31)
    canon = fwd + rev

    bad = _window_any(codes > 3, k)
    valid = (~bad) & (iota <= jnp.int32(n - k))
    return _bottom_k_tail(canon, valid, sketchsize)


def _bottom_k_spaced_impl(codes, pattern: str, sketchsize: int):
    """Spaced-seed variant: bottom-k distinct spaced-seed canonical hashes
    (`ops/spaced.py` closed form: prefix-XOR + per-care-block interval XORs).
    Same separator/stream contract as `_bottom_k_kernel_impl`."""
    import jax
    import jax.numpy as jnp

    from .ops.hashing import SEEDS, SEEDS_COMP
    from .ops.spaced import _srol_by, parse_seed

    u64 = jnp.uint64
    _, blocks = parse_seed(pattern)
    k = len(pattern)
    n = codes.shape[0]

    p = jnp.arange(n, dtype=jnp.int64)
    ftab = jnp.asarray(np.array(SEEDS + (0,), np.uint64))
    rtab = jnp.asarray(np.array(SEEDS_COMP + (0,), np.uint64))
    ci = jnp.minimum(codes, 4).astype(jnp.int32)
    fwd_pre = _srol_by(ftab[ci], (-p) % 1023)
    rev_pre = _srol_by(rtab[ci], p % 1023)
    zero = jnp.zeros(1, u64)
    xf = jnp.concatenate([zero, jax.lax.associative_scan(jnp.bitwise_xor, fwd_pre)])
    xr = jnp.concatenate([zero, jax.lax.associative_scan(jnp.bitwise_xor, rev_pre)])
    inv = jnp.concatenate([
        jnp.zeros(1, jnp.int32), jnp.cumsum((codes > 3).astype(jnp.int32))])

    n_win = n - k + 1
    i = jnp.arange(n_win, dtype=jnp.int64)
    hf = jnp.zeros(n_win, u64)
    hr = jnp.zeros(n_win, u64)
    bad = jnp.zeros(n_win, jnp.int32)
    for a, b in blocks:
        hf = hf ^ xf[i + b] ^ xf[i + a]
        hr = hr ^ xr[i + b] ^ xr[i + a]
        bad = bad + inv[i + b] - inv[i + a]
    canon = _srol_by(hf, (i + (k - 1)) % 1023) + _srol_by(hr, (-i) % 1023)
    valid = bad == 0
    return _bottom_k_tail(canon, valid, sketchsize)


def _bottom_k_tail(vals, valid, sketchsize: int):
    """(sorted bottom-k of the distinct valid values, n_distinct)."""
    import jax.numpy as jnp

    from .ops.hashing import M64

    u64 = jnp.uint64
    n = vals.shape[0]
    hs = jnp.sort(jnp.where(valid, vals, u64(M64)))
    prev = jnp.concatenate([hs[:1] ^ u64(1), hs[:-1]])
    new = (hs != prev) & (hs != u64(M64))
    rank = jnp.cumsum(new.astype(jnp.int32))
    n_distinct = rank[-1]
    wanted = jnp.arange(1, sketchsize + 1, dtype=jnp.int32)
    at = jnp.clip(jnp.searchsorted(rank, wanted, side='left'), 0, n - 1)
    bottom = jnp.where(wanted <= n_distinct, hs[at], u64(M64))
    return bottom, n_distinct


@functools.lru_cache(maxsize=None)
def _bottom_k_kernel(k: int, sketchsize: int, seed_pattern: str | None = None):
    """Batched sketch kernel: codes [B, n] -> (sketches [B, s], counts [B]).

    One dispatch covers a whole batch of assemblies (vmap over the
    single-stream kernel), so A assemblies cost ceil(A/B) device programs
    instead of A (per-dispatch relay latency is ~8 ms here)."""
    import jax

    if seed_pattern is not None:
        impl = functools.partial(
            _bottom_k_spaced_impl, pattern=seed_pattern, sketchsize=sketchsize)
    else:
        impl = functools.partial(
            _bottom_k_kernel_impl, k=k, sketchsize=sketchsize)
    return jax.jit(jax.vmap(impl))


def _separator_run(seed_pattern: str | None) -> int:
    """Inter-record separator run length that guarantees no window hashes
    bases from two records.

    For contiguous k-mers every window position is a care position, so ONE
    255 byte invalidates every window spanning it. For a spaced seed, a
    separator landing on a don't-care ('0') position does NOT invalidate the
    window, so a single separator lets windows straddle the junction and hash
    a phantom cross-record k-mer. A run one longer than the pattern's longest
    zero-run closes this: patterns start and end with '1', so a window that
    overlaps the run's edge has a care position (index 0 or k-1) on a
    separator, and a window containing the whole run cannot fit it inside
    any single zero-gap.
    """
    if seed_pattern is None:
        return 1
    from .ops.spaced import parse_seed

    _, blocks = parse_seed(seed_pattern)
    max_gap = max(
        (b[0] - a[1] for a, b in zip(blocks, blocks[1:])), default=0)
    return max_gap + 1


def device_sketches(
    record_codes_by_assembly: list[list[np.ndarray]],
    kmerlen: int,
    sketchsize: int = 1000,
    seed_pattern: str | None = None,
    batch_size: int = 8,
) -> list[np.ndarray]:
    """Bottom-k MinHash sketch per assembly, computed on device.

    All assemblies share ONE padded stream shape (the run's largest, rounded
    to a power of two) and run ``batch_size`` per dispatch, so the whole pass
    compiles exactly one program and issues ceil(A/B) dispatches.
    Host work per assembly is O(sketchsize): trimming the returned sketch.
    ``seed_pattern`` switches from contiguous k-mers to spaced-seed hashing
    (`ops/spaced.py`; the pattern's length replaces ``kmerlen``).
    """
    import jax.numpy as jnp

    from .engine.minimizer import next_pow2

    if seed_pattern is not None:
        kmerlen = len(seed_pattern)
    sep = _separator_run(seed_pattern)
    budgets = [
        sum(len(c) for c in recs) + max(0, len(recs) - 1) * sep
        for recs in record_codes_by_assembly
    ]
    n = max(1 << 14, next_pow2(max(budgets, default=1)))
    kernel = _bottom_k_kernel(kmerlen, sketchsize, seed_pattern)

    a = len(record_codes_by_assembly)
    batch = max(1, min(int(batch_size), a))
    sketches: list[np.ndarray] = [np.zeros(0, np.uint64)] * a
    for lo in range(0, a, batch):
        rows = record_codes_by_assembly[lo:lo + batch]
        streams = np.full((batch, n), 255, dtype=np.uint8)
        for b, recs in enumerate(rows):
            off = 0
            for c in recs:  # 255-run separators between records (`_separator_run`)
                streams[b, off:off + len(c)] = c
                off += len(c) + sep
        bottoms, n_distincts = kernel(jnp.asarray(streams))
        bottoms = np.asarray(bottoms)
        n_distincts = np.asarray(n_distincts)
        for b, (recs, used) in enumerate(zip(rows, budgets[lo:lo + batch])):
            if used:
                sketches[lo + b] = bottoms[b, : int(n_distincts[b])]
    return sketches


def _pair_jaccard_kernel_impl(S, ii, jj, s: int):
    """Mash-style Jaccard of sketch-row pairs, vectorized on device.

    For each pair: merge the two sorted bottom-s sketches, keep the smallest s
    distinct values of the union, and count how many occur in both sketches.
    """
    import jax.numpy as jnp

    from .ops.hashing import M64

    u64 = jnp.uint64
    both = jnp.concatenate([S[ii], S[jj]], axis=1)  # [P, 2s]
    x = jnp.sort(both, axis=1)
    real = x != u64(M64)
    dup = jnp.concatenate(
        [jnp.zeros((x.shape[0], 1), bool), (x[:, 1:] == x[:, :-1]) & real[:, 1:]],
        axis=1,
    )
    distinct_rank = jnp.cumsum((real & ~dup).astype(jnp.int32), axis=1)
    shared = jnp.sum((dup & (distinct_rank <= s)).astype(jnp.int32), axis=1)
    total = jnp.minimum(distinct_rank[:, -1], jnp.int32(s))
    return jnp.where(total > 0, shared / jnp.maximum(total, 1), 0.0)


@functools.lru_cache(maxsize=None)
def _pair_jaccard_kernel(s: int):
    import jax

    return jax.jit(functools.partial(_pair_jaccard_kernel_impl, s=s))


def sketch_jaccard_matrix(
    sketches: list[np.ndarray], sketchsize: int, pair_block: int = 1 << 13
) -> np.ndarray:
    """Full pairwise Jaccard matrix from bottom-k sketches (device compute).

    Pairs (upper triangle + diagonal) run through `_pair_jaccard_kernel` in
    fixed-size blocks, so large assembly sets reuse one compiled shape.
    """
    import jax.numpy as jnp

    from .ops.hashing import M64

    n = len(sketches)
    S = np.full((max(n, 1), sketchsize), M64, dtype=np.uint64)
    for i, sk in enumerate(sketches):
        S[i, : min(len(sk), sketchsize)] = sk[:sketchsize]
    iu, ju = np.triu_indices(n)
    mtx = np.zeros((n, n), dtype=np.float64)
    if len(iu) == 0:
        return mtx
    kernel = _pair_jaccard_kernel(sketchsize)
    S_dev = jnp.asarray(S)
    block = min(pair_block, 1 << max(4, (len(iu) - 1).bit_length()))
    for lo in range(0, len(iu), block):
        ii = np.zeros(block, np.int32)
        jj = np.zeros(block, np.int32)
        sel = slice(lo, min(lo + block, len(iu)))
        m = sel.stop - sel.start
        ii[:m], jj[:m] = iu[sel], ju[sel]
        vals = np.asarray(kernel(S_dev, jnp.asarray(ii), jnp.asarray(jj)))[:m]
        mtx[iu[sel], ju[sel]] = vals
        mtx[ju[sel], iu[sel]] = vals
    return mtx
