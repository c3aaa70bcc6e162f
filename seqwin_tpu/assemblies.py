"""Input assembly registry + sequence fetch + BLAST database streaming.

Behavioral contract follows `/root/reference/src/seqwin/assemblies.py:54-476`.
"""
from __future__ import annotations

import gzip
import logging
import multiprocessing as mp
import re
import subprocess
from io import BufferedWriter
from pathlib import Path
from queue import Empty
from time import time

logger = logging.getLogger(__name__)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from numpy.typing import NDArray  # noqa: E402

from .ncbi import download_taxon  # noqa: E402
from .mash import get_jaccard, sketch  # noqa: E402
from .io.fasta import load_fasta  # noqa: E402
from .utils import (  # noqa: E402
    GZIP_EXT,
    file_to_write,
    get_dups,
    load_paths_txt,
    log_and_raise,
    mkdir,
    mp_wrapper,
    print_time_delta,
)
from .config import BLASTCONFIG, WORKINGDIR, Config, RunState  # noqa: E402

_FASTA_EXT = (
    '.fna', '.fasta', '.fna.gz', '.fasta.gz',
    '.fa', '.fas', '.fa.gz', '.fas.gz',
)


class Assemblies(pd.DataFrame):
    """All input assemblies as a DataFrame: path, is_target, record_ids."""

    def __init__(self, tar_paths: list[Path], neg_paths: list[Path]) -> None:
        data = dict(
            path=tar_paths + neg_paths,
            is_target=[True] * len(tar_paths) + [False] * len(neg_paths),
            record_ids=None,
        )
        super().__init__(data)

    def mash(self, kmerlen: int, sketchsize: int, out_path: Path, overwrite: bool, n_cpu: int) -> NDArray:
        """Pairwise Jaccard matrix via external mash."""
        mash_sketch = sketch(
            self.path.tolist(), kmerlen=kmerlen, sketchsize=sketchsize,
            out_path=out_path, overwrite=overwrite, n_cpu=n_cpu,
        )
        return np.array(list(get_jaccard(mash_sketch, n_cpu=n_cpu))).reshape(len(self), len(self))

    def fetch_seq(self, loc: pd.DataFrame, n_cpu: int) -> pd.Series:
        """Fetch sequences for rows of (assembly_idx, record_idx, start, stop),
        grouped per assembly and loaded in parallel."""
        loc_groups: dict[int, pd.DataFrame] = dict(tuple(
            loc.groupby(by='assembly_idx', sort=False)[['record_idx', 'start', 'stop']]
        ))
        logger.info(f' - {len(loc_groups)} assemblies to be loaded')
        paths = self.path
        fetch_args = zip(
            loc_groups.values(),
            (paths.loc[assembly_idx] for assembly_idx in loc_groups),
        )
        all_seq: pd.Series = pd.concat(
            mp_wrapper(_fetch_seq, fetch_args, n_cpu, n_jobs=len(loc_groups)),
            axis=0,
        )
        all_seq.sort_index(ascending=True, inplace=True)
        return all_seq

    def makeblastdb(self, prefix: Path, neg_only: bool, overwrite: bool, n_cpu: int) -> Path:
        """Stream header-rewritten FASTAs into `makeblastdb` via an ordered queue."""
        if neg_only:
            logger.info('Creating a BLAST database of non-target assemblies (less sensitive but faster)...')
            df = self[self.is_target == False]  # noqa: E712
            title = BLASTCONFIG.title_neg_only
        else:
            logger.info('Creating a BLAST database of all assemblies...')
            df = self
            title = BLASTCONFIG.title_all
        tik = time()

        mkdir(prefix, overwrite)
        blastdb = prefix / title

        with mp.Manager() as manager:
            queue = manager.Queue(maxsize=BLASTCONFIG.queue_size + n_cpu)
            queue_idx = range(len(df))
            makeblastdb_args = ['makeblastdb', '-title', title, '-dbtype', 'nucl', '-out', blastdb]
            proc = subprocess.Popen(
                makeblastdb_args, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=False,
            )
            pool = mp.Pool(processes=n_cpu)
            for args in zip(df.path, df.index, df.is_target, queue_idx):
                pool.apply_async(_add_fasta_to_queue, args=(*args, queue))
            pool.close()
            _stream_to_stdin(queue, len(df), proc.stdin)
            pool.join()
            stdout, stderr = proc.communicate()
            stdout, stderr = stdout.decode(), stderr.decode()

        blast_log = prefix / WORKINGDIR.blast_log
        blast_log.write_text('\n'.join((str(makeblastdb_args), stdout, stderr)))
        if proc.returncode != 0:
            log_and_raise(RuntimeError, msg=f'Failed to create the BLAST database. For details, please check {blast_log}')
        logger.info(f' - BLAST database created: {blastdb}')
        print_time_delta(time() - tik)
        return blastdb


def _add_fasta_to_queue(path: Path, assembly_idx: int, is_target: bool, queue_idx: int, queue) -> None:
    """Rewrite headers with assembly index + target flag, enqueue in order."""
    if path.suffix == GZIP_EXT:
        content = gzip.decompress(path.read_bytes())
    else:
        content = path.read_bytes()
    mod_str = f'>{assembly_idx}{BLASTCONFIG.header_sep}{BLASTCONFIG.bool2str[is_target]}{BLASTCONFIG.header_sep}'.encode()
    content = re.sub(pattern=rb'^>', repl=mod_str, string=content, flags=re.MULTILINE)
    queue.put((queue_idx, content))


def _stream_to_stdin(queue, n_items: int, proc_stdin: BufferedWriter) -> None:
    """Drain an indexed queue into stdin in index order."""
    next_idx = 0
    buffer: dict[int, bytes] = {}
    while next_idx < n_items:
        try:
            idx, data = queue.get()
            buffer[idx] = data
            while next_idx in buffer:
                proc_stdin.write(buffer.pop(next_idx))
                next_idx += 1
        except Empty:
            continue
    proc_stdin.flush()


def _fetch_seq(loc: pd.DataFrame, src_fasta: Path) -> pd.Series:
    src_seq = load_fasta(src_fasta)
    return loc.apply(
        lambda row: src_seq[row['record_idx']][row['start']:row['stop']],
        axis=1,
    )


def _get_paths_dl(taxa_list: list[str], prefix: Path, config: Config) -> list[Path]:
    paths = []
    for taxon in taxa_list:
        download_paths = download_taxon(
            taxon=taxon, prefix=prefix, level=config.level, source=config.source,
            annotated=config.annotated, exclude_mag=config.exclude_mag, gzip=config.gzip,
            api_key=config.api_key.get_secret_value() if config.api_key is not None else None,
            overwrite=config.overwrite, n_cpu=config.n_cpu,
        )
        if download_paths is not None:
            paths.extend(download_paths)
    return paths


def _get_paths_txt(paths_txt: Path) -> list[Path]:
    paths = load_paths_txt(paths_txt)
    logger.info(f'Found {len(paths)} assemblies from {paths_txt}')
    return paths


def _get_paths_dir(input_dir: Path) -> list[Path]:
    paths = []
    for p in sorted(input_dir.iterdir(), key=lambda x: x.name):
        if p.is_dir():
            logger.warning(f'- Skipped subdirectory {p}')
            continue
        if p.is_file():
            if p.name.lower().endswith(_FASTA_EXT):
                paths.append(p.resolve(strict=True))
            else:
                logger.warning(f'- Skipped unsupported file {p}')
    logger.info(f'Found {len(paths)} assemblies from {input_dir}')
    return paths


def _download(config: Config, working_dir: Path) -> tuple[list[Path], list[Path]]:
    tar_taxa = config.tar_taxa or []
    neg_taxa = config.neg_taxa or []
    tar_paths: list[Path] = []
    neg_paths: list[Path] = []
    if tar_taxa or neg_taxa:
        all_taxa = tar_taxa + neg_taxa
        if len(all_taxa) != len(set(all_taxa)):
            dup_taxa = '\n'.join(map(str, get_dups(all_taxa)))
            log_and_raise(RuntimeError, f'Duplicated taxa:\n{dup_taxa}')
        assemblies_prefix = working_dir / WORKINGDIR.assemblies_dir
        if assemblies_prefix.exists():
            logger.warning(f'Existing assemblies directory is found, genome packages might be reused: {assemblies_prefix}')
        else:
            assemblies_prefix.mkdir()
        if tar_taxa:
            tar_paths = _get_paths_dl(tar_taxa, assemblies_prefix, config)
        if neg_taxa:
            neg_paths = _get_paths_dl(neg_taxa, assemblies_prefix, config)
    return tar_paths, neg_paths


def get_assemblies(config: Config, state: RunState) -> Assemblies:
    """Resolve all inputs (download / txt / dir), dedup, save assemblies.csv."""
    working_dir = state.working_dir
    tar_paths, neg_paths = _download(config, working_dir)

    if not config.download_only:
        if config.tar_paths is not None:
            tar_paths.extend(_get_paths_txt(config.tar_paths))
        if config.neg_paths is not None:
            neg_paths.extend(_get_paths_txt(config.neg_paths))
        if config.tar_dir is not None:
            tar_paths.extend(_get_paths_dir(config.tar_dir))
        if config.neg_dir is not None:
            neg_paths.extend(_get_paths_dir(config.neg_dir))
        if not tar_paths:
            log_and_raise(RuntimeError, msg='No target assembly found')
        if not neg_paths:
            log_and_raise(RuntimeError, msg='No non-target assembly found')
        all_paths = tar_paths + neg_paths
        if len(all_paths) != len(set(all_paths)):
            dup_paths = '\n'.join(map(str, get_dups(all_paths)))
            log_and_raise(RuntimeError, f'Duplicated assembly file paths:\n{dup_paths}')

    assemblies = Assemblies(tar_paths, neg_paths)
    n_tar, n_neg = len(tar_paths), len(neg_paths)
    logger.info(f'Loaded {n_tar} target assemblies and {n_neg} non-target assemblies, {len(assemblies)} in total.')

    assemblies_path = working_dir / WORKINGDIR.assemblies_csv
    file_to_write(assemblies_path, config.overwrite)
    assemblies.to_csv(assemblies_path, columns=('path', 'is_target'), index=True)
    logger.info(f'Assembly indices and paths saved as {assemblies_path}')

    state.n_tar, state.n_neg = n_tar, n_neg
    return assemblies
