"""NCBI adapters: genome download via `datasets`, evaluation via BLAST+.

Behavior mirrors `/root/reference/src/seqwin/ncbi.py:69-465`; all external
tools are optional subprocesses gated by availability probes in `config.py`.
"""
from __future__ import annotations

import json
import logging
import shutil
import zipfile
from collections.abc import Sequence
from enum import Enum
from io import StringIO
from pathlib import Path

logger = logging.getLogger(__name__)

import pandas as pd  # noqa: E402

from .utils import file_to_write, list_dir, log_and_raise, run_cmd  # noqa: E402

_ZIP_EXT = '.zip'
_BLAST_COL = (
    'qseqid', 'sseqid', 'length', 'pident', 'nident', 'mismatch', 'gapopen',
    'gaps', 'qstart', 'qend', 'sstart', 'send', 'evalue', 'bitscore', 'qseq', 'sseq',
)
_MAX_REHYDRATE_WORKERS = 8
_MAX_HSPS = '1000'
_MAX_TARGET_SEQS = '50000'


class Format(str, Enum):
    fasta = 'fasta'
    genbank = 'genbank'


class Level(str, Enum):
    contig = 'contig'
    scaffold = 'scaffold'
    chromosome = 'chromosome'
    complete = 'complete'


class Source(str, Enum):
    genbank = 'genbank'
    refseq = 'refseq'


class Task(str, Enum):
    blastn = 'blastn'
    blastn_short = 'blastn-short'
    megablast = 'megablast'


def _add_api_key(args: list, api_key: str | None) -> list:
    if api_key is not None:
        args += ['--api-key', api_key]
    return args


def search_taxon(taxon: str, api_key: str | None = None) -> tuple[str | None, str | None]:
    """Resolve a taxon name/id via `datasets summary taxonomy`."""
    logger.info(f'Searching NCBI Taxonomy for "{taxon}"...')
    args = [
        'datasets', 'summary', 'taxonomy', 'taxon', str(taxon),
        '--as-json-lines', '--report', 'names',
    ]
    args = _add_api_key(args, api_key)
    summary = run_cmd(*args, raise_error=False)
    if summary.stdout == '':
        logger.error(summary.stderr)
        logger.error(f' - Unable to find taxon "{taxon}"')
        return None, None
    data = json.loads(summary.stdout)
    tax_id = data['taxonomy']['tax_id']
    tax_name = data['taxonomy']['current_scientific_name']['name']
    logger.info(f' - Found NCBI Taxonomy ID: {tax_id}')
    return tax_id, tax_name


def get_assembly_paths(package_dir: Path) -> list[Path]:
    if not package_dir.is_dir():
        log_and_raise(NotADirectoryError, f'Not a directory: {package_dir}')
    prefix = package_dir / 'ncbi_dataset' / 'data'
    assemblies = list_dir(prefix, mode='d')
    paths = []
    for assembly_dir in assemblies:
        assembly_path = list_dir(assembly_dir, mode='f')
        if len(assembly_path) > 1:
            logger.warning(f' - Found more than one files under {assembly_dir}')
        elif len(assembly_path) == 0:
            log_and_raise(FileNotFoundError, f'No assembly file is found {assembly_dir}')
        paths.append(assembly_path[0])
    return paths


def download_taxon(
    taxon: str,
    prefix: Path = Path.cwd(),
    format: Format = Format.fasta,
    level: Level = Level.contig,
    source: Source = Source.genbank,
    annotated: bool = True,
    exclude_mag: bool = False,
    gzip: bool = True,
    api_key: str | None = None,
    overwrite: bool = False,
    n_cpu: int = 1,
) -> list[Path] | None:
    """Dehydrated download + rehydrate of all assemblies under a taxon."""
    if not prefix.is_dir():
        log_and_raise(NotADirectoryError, f'Cannot download genomes to this location, since it is not a directory: {prefix}')
    n_cpu = min(n_cpu, _MAX_REHYDRATE_WORKERS)

    tax_dir = prefix / taxon.replace(' ', '-')
    if tax_dir.exists():
        logger.warning(f'Existing genome package is found {tax_dir}')
        try:
            assembly_paths = get_assembly_paths(tax_dir)
        except Exception as e:
            log_and_raise(
                RuntimeError,
                (f'Genome package might be incomplete {tax_dir}\nConsider deleting it and try again'),
                from_e=e,
            )
        logger.info(f' - Found {len(assembly_paths)} genome assemblies.')
        return assembly_paths

    tax_id, tax_name = search_taxon(taxon, api_key=api_key)
    if tax_id is None:
        return None
    tax_dir = prefix / tax_name.replace(' ', '-')
    tax_zip = tax_dir.with_name(tax_dir.name + _ZIP_EXT)
    file_to_write(tax_zip, overwrite=overwrite)

    args = [
        'datasets', 'download', 'genome', 'taxon', tax_id,
        '--filename', tax_zip,
        '--exclude-atypical', '--exclude-multi-isolate',
        '--no-progressbar', '--dehydrated',
    ]
    args += ['--include', 'genome'] if format == Format.fasta else ['--include', 'gbff']
    if level == Level.scaffold:
        args += ['--assembly-level', 'scaffold,chromosome,complete']
    elif level == Level.chromosome:
        args += ['--assembly-level', 'chromosome,complete']
    elif level == Level.complete:
        args += ['--assembly-level', 'complete']
    args += ['--assembly-source', 'GenBank' if source == Source.genbank else 'RefSeq']
    if annotated:
        args.append('--annotated')
    args += ['--mag', 'exclude' if exclude_mag else 'all']
    args = _add_api_key(args, api_key)

    logger.info(f'Downloading genome package for NCBI Taxonomy ID {tax_id}...')
    download_log = run_cmd(*args, raise_error=False)
    if download_log.returncode != 0:
        logger.error(download_log.stderr)
        logger.error(f' - No genome assemblies were found for NCBI Taxonomy ID {tax_id}, try loosen the filters.')
        return None

    try:
        with zipfile.ZipFile(tax_zip, 'r') as zf:
            zf.extractall(tax_dir)
    except Exception as e:
        shutil.rmtree(tax_dir)
        log_and_raise(RuntimeError, f'Failed to unzip genome package for NCBI Taxonomy ID {tax_id}: {tax_zip}', from_e=e)

    args = ['datasets', 'rehydrate', '--directory', tax_dir, '--max-workers', str(n_cpu), '--no-progressbar']
    if gzip:
        args += ['--gzip']
    args = _add_api_key(args, api_key)
    try:
        run_cmd(*args, raise_error=True)
    except Exception as e:
        shutil.rmtree(tax_dir)
        log_and_raise(
            RuntimeError,
            (f'Failed to rehydrate data package for taxon "{taxon}".\n'
             'NCBI might have blocked the request due to high usage. Try waiting before retrying.\n'
             'Add --overwrite so downloaded taxon packages can be reused.'),
            from_e=e,
        )
    assembly_paths = get_assembly_paths(tax_dir)
    logger.info(f' - Downloaded {len(assembly_paths)} genome assemblies for NCBI Taxonomy ID {tax_id}.')
    return assembly_paths


def _get_blast_outfmt(columns: Sequence[str]) -> str:
    return f'6 {" ".join(columns)}'


def _blast_batch(seq_idx, seq_list, db, task, columns, outfmt, taxids, neg_taxids, n_cpu):
    blast_in = ''.join(f'>{i}\n{seq}\n' for i, seq in zip(seq_idx, seq_list))
    args = [
        'blastn', '-db', db, '-task', task, '-outfmt', outfmt,
        '-max_hsps', _MAX_HSPS, '-max_target_seqs', _MAX_TARGET_SEQS,
        '-num_threads', n_cpu,
    ]
    if taxids is not None:
        args += ['-taxids', taxids]
    if neg_taxids is not None:
        args += ['-negative_taxids', neg_taxids]
    blast_out = run_cmd(*args, stdin=blast_in).stdout
    return pd.read_csv(StringIO(blast_out), sep='\t', header=None, names=columns, index_col=False)


def blast(
    seq_list: Sequence[str],
    db: Path,
    task: Task = Task.blastn,
    columns: Sequence[str] | None = None,
    taxids: Sequence[int] | None = None,
    neg_taxids: Sequence[int] | None = None,
    n_cpu: int = 1,
    batch_size: int = 1000,
) -> pd.DataFrame:
    """Batched blastn over stdin; TSV parsed into a DataFrame."""
    tot_seq = len(seq_list)
    if tot_seq == 0:
        log_and_raise(ValueError, 'No input sequence provided for BLAST')
    seq_idx = list(range(tot_seq))
    if columns is None:
        columns = _BLAST_COL
    outfmt = _get_blast_outfmt(columns)
    if taxids is not None:
        taxids = ','.join(map(str, taxids))
    if neg_taxids is not None:
        neg_taxids = ','.join(map(str, neg_taxids))
    n_cpu = str(n_cpu)

    logger.info(f' - Running blastn on {tot_seq} sequences, with batch size of {batch_size} (threads={n_cpu})...')
    batch_start = 0
    out: list[pd.DataFrame] = []
    while batch_start < tot_seq:
        logger.info(f' - {batch_start}/{tot_seq}')
        batch_stop = batch_start + batch_size
        out.append(_blast_batch(
            seq_idx[batch_start:batch_stop], seq_list[batch_start:batch_stop],
            db, task, columns, outfmt, taxids, neg_taxids, n_cpu,
        ))
        batch_start = batch_stop
    return out[0] if len(out) == 1 else pd.concat(out, axis=0, ignore_index=True)
