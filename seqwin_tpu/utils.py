"""Host utilities: logging, subprocess, multiprocessing, path loading.

Behavioral contracts follow `/root/reference/src/seqwin/utils.py` where output
bytes depend on them (path resolution, FASTA loading lives in `io/fasta.py`).
"""
from __future__ import annotations

import datetime
import logging
import multiprocessing
import shlex
import subprocess
import sys
from collections.abc import Callable, Hashable, Iterable
from enum import Enum
from pathlib import Path
from time import time
from typing import Literal

logger = logging.getLogger(__name__)

GZIP_EXT = '.gz'
BASE_COMP = str.maketrans('ATCGatcg', 'TAGCtagc')


class StartMethod(str, Enum):
    spawn = 'spawn'
    fork = 'fork'
    forkserver = 'forkserver'


_START_METHOD = StartMethod.spawn if sys.platform == 'win32' else StartMethod.fork


def print_time_delta(seconds: float) -> None:
    logger.info(f' - Finished in {datetime.timedelta(seconds=seconds)}')


def log_and_raise(
    exception: type[Exception] = Exception,
    msg: str = '',
    from_none: bool = False,
    from_e: BaseException | None = None,
) -> None:
    logger.critical(msg or exception.__name__)
    if from_none and from_e is not None:
        raise ValueError('Use only one of from_none or from_e')
    if from_none:
        raise exception(msg) from None
    if from_e is not None:
        raise exception(msg) from from_e
    raise exception(msg)


def overwrite_warning(path: Path) -> None:
    logger.warning(
        f'File/directory already exists, content is overwritten (overwriting is turned on): {path}'
    )


def overwrite_error(path: Path) -> None:
    log_and_raise(
        FileExistsError,
        f'File/directory already exists, and overwriting is turned off: {path}',
        from_none=True,
    )


def read_text(path: Path) -> str:
    with open(path, 'r', encoding='utf-8', newline=None) as f:
        return f.read()


def mkdir(path: Path, overwrite: bool = False, verbose: bool = False) -> None:
    import shutil

    try:
        path.mkdir(parents=False, exist_ok=False)
    except FileExistsError:
        if path.is_file():
            log_and_raise(
                NotADirectoryError,
                f'Cannot create directory, since it already exists as a file: {path}',
            )
        elif overwrite:
            if verbose:
                overwrite_warning(path)
            shutil.rmtree(path)
            path.mkdir()
        else:
            overwrite_error(path)


def file_to_write(path: Path, overwrite: bool = False, verbose: bool = False) -> None:
    if path.is_file():
        if overwrite:
            if verbose:
                overwrite_warning(path)
            path.unlink()
        else:
            overwrite_error(path)
    elif path.is_dir():
        log_and_raise(IsADirectoryError, f'Expected a file, but a directory is found: {path}')


def list_dir(path: Path = Path.cwd(), mode: Literal['a', 'd', 'f'] = 'a') -> list[Path]:
    if not path.is_dir():
        log_and_raise(NotADirectoryError, f'Not a directory: {path}')
    if mode == 'd':
        entries = (p for p in path.iterdir() if p.is_dir())
    elif mode == 'f':
        entries = (p for p in path.iterdir() if p.is_file())
    elif mode == 'a':
        entries = path.iterdir()
    else:
        log_and_raise(ValueError, f'Invalid mode for list_dir: {mode}')
    return sorted(entries, key=lambda p: p.name)


def run_cmd(
    *args: str | Path, stdin: str | None = None, raise_error: bool = True
) -> subprocess.CompletedProcess:
    for a in args:
        if not isinstance(a, (str, Path)):
            log_and_raise(TypeError, 'Only str or Path are accepted as command line arguments')
    try:
        return subprocess.run(args, input=stdin, capture_output=True, text=True, check=raise_error)
    except subprocess.CalledProcessError as e:
        msg = (
            'Subprocess failed\n'
            f'cmd: {shlex.join(str(c) for c in e.cmd)}\n'
            f'exit code: {e.returncode}\n'
            f'stderr:\n{(e.stderr or "").strip()}'
        )
        log_and_raise(RuntimeError, msg, from_e=e)


def mp_wrapper(
    func: Callable,
    all_args: Iterable,
    n_cpu: int = 1,
    text: str | None = None,
    starmap: bool = True,
    n_jobs: int | None = None,
    start_method: StartMethod | None = _START_METHOD,
) -> list:
    """Pool wrapper with the reference's chunksize heuristic
    (`/root/reference/src/seqwin/utils.py:217-278`)."""
    tik = time()
    if text:
        logger.info(f'{text} (processes={n_cpu})')
    if n_cpu == 1:
        if starmap:
            func_out = [func(*args) for args in all_args]
        else:
            func_out = [func(args) for args in all_args]
    elif n_cpu > 1:
        if n_jobs is not None:
            chunksize, extra = divmod(n_jobs, 4 * n_cpu)
            if extra:
                chunksize += 1
        else:
            chunksize = None
        with multiprocessing.get_context(method=start_method).Pool(processes=n_cpu) as pool:
            if starmap:
                func_out = pool.starmap(func, all_args, chunksize=chunksize)
            else:
                func_out = pool.map(func, all_args, chunksize=chunksize)
    else:
        log_and_raise(ValueError, 'n_cpu should be an positive integer')
    if text:
        print_time_delta(time() - tik)
    return func_out


def get_dups(iterable: Iterable[Hashable]) -> set:
    seen = set()
    duplicates = []
    for i in iterable:
        if i in seen:
            duplicates.append(i)
        else:
            seen.add(i)
    return set(duplicates)


def revcomp(seq: str) -> str:
    return seq.translate(BASE_COMP)[::-1]


def get_chunks(ls, n: int = 1):
    """Yield n roughly equal chunks of a sequence."""
    size, remainder = divmod(len(ls), n)
    stop = 0
    for i in range(n):
        start = stop
        stop = start + size + (1 if i < remainder else 0)
        yield ls[start:stop]


def most_common(iterable: Iterable[Hashable]):
    """Most common element of an iterable."""
    from collections import Counter

    return Counter(iterable).most_common(1)[0][0]


def most_common_weighted(iterable: Iterable):
    """Most common element, weighted by element length."""
    from collections import Counter

    c = Counter(iterable)
    return max(c, key=lambda k: len(k) * c[k])


def load_paths_txt(paths_txt: Path) -> list[Path]:
    """One path per line; relative paths resolved against the txt's directory."""
    paths_txt = paths_txt.resolve(strict=True)
    base_dir = paths_txt.parent
    paths_list: list[Path] = []
    for path in paths_txt.read_text().splitlines():
        path = path.strip()
        if not path:
            continue
        p = Path(path)
        if not p.is_absolute():
            p = base_dir / p
        if p.is_file():
            paths_list.append(p.resolve(strict=True))
        elif p.is_dir():
            logger.error(f' - This is a directory, skipped: {p}')
        else:
            logger.error(f' - File not found, skipped: {p}')
    return paths_list
