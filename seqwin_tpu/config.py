"""Run configuration, runtime state, and output-file registry.

Field set, defaults, and validation semantics match the reference
(`/root/reference/src/seqwin/config.py:74-353`) so configs and `config.json`
files are interchangeable; TPU-specific knobs are additive.
"""
from __future__ import annotations

import logging
import shutil
import sys
from collections.abc import Mapping
from dataclasses import dataclass, field
from functools import cached_property
from pathlib import Path
from random import Random
from types import MappingProxyType

_LOG_FMT = '%(asctime)s | %(levelname)-8s | %(message)s'
_LOG_DATEFMT = '%Y-%m-%d %H:%M:%S'

logging.basicConfig(
    format=_LOG_FMT,
    datefmt=_LOG_DATEFMT,
    level=logging.INFO,
    stream=sys.stdout,
)

from pydantic import (  # noqa: E402
    BaseModel,
    Field,
    SecretStr,
    ValidationInfo,
    computed_field,
    field_validator,
    model_validator,
)

from .ncbi import Level, Source, Task  # noqa: E402
from ._version import __version__  # noqa: E402

HAS_MASH = shutil.which('mash') is not None
HAS_BLAST = (shutil.which('makeblastdb') is not None) and (shutil.which('blastn') is not None)
HAS_DATASETS = shutil.which('datasets') is not None

# path field -> (must-exist predicate, noun for the error message)
_PATH_KINDS: dict[str, tuple[str, str]] = {
    'tar_paths': ('is_file', 'file'),
    'neg_paths': ('is_file', 'file'),
    'tar_dir': ('is_dir', 'directory'),
    'neg_dir': ('is_dir', 'directory'),
    'prefix': ('is_dir', 'directory'),
}
# any-of-these-required input groups, by role
_INPUT_GROUPS = (
    ('target', ('tar_paths', 'tar_taxa', 'tar_dir')),
    ('non-target', ('neg_paths', 'neg_taxa', 'neg_dir')),
)


class Config(BaseModel):
    """Run configuration (see the reference docstring for field meanings;
    `/root/reference/src/seqwin/config.py:74-119`)."""

    # Inputs
    tar_taxa: list[str] | None = None
    neg_taxa: list[str] | None = None
    tar_paths: Path | None = None
    neg_paths: Path | None = None
    tar_dir: Path | None = None
    neg_dir: Path | None = None

    # Outputs
    prefix: Path = Field(default_factory=Path.cwd)
    title: str = 'seqwin-out'
    overwrite: bool = False

    # Signature options
    kmerlen: int = 21
    windowsize: int = 200
    penalty_th: float | None = None
    run_mash: bool = True
    stringency: int = 5
    min_len: int = 200
    max_len: int | None = None
    run_blast: bool = True
    no_filter: bool = False
    blast_neg_only: bool = False

    # Graph filtering options (not included in CLI)
    penalty_th_cap: float = 0.2
    edge_w_th_mul: float = 0.3
    min_nodes_floor: int = 3
    max_nodes_cap: int | None = 100

    # Mash / sketch parameters (not included in CLI)
    sketchsize: int = 1000

    # NCBI download options
    level: Level = Level.contig
    source: Source = Source.genbank
    annotated: bool = False
    exclude_mag: bool = False
    gzip: bool = True
    api_key: SecretStr | None = None
    download_only: bool = False

    # Miscellaneous
    seed: int = 42
    n_cpu: int = 4
    low_memory: bool = False

    # TPU-specific (additive; defaults preserve reference behavior)
    device_backend: str = 'auto'  # 'auto' | 'xla' | 'numpy' | 'oracle'
    # Jaccard estimator for the penalty threshold:
    #   'auto'      -- reference behavior: external mash if run_mash and
    #                  installed, else the minimizer-sketch estimator
    #   'device'    -- on-device bottom-k MinHash sketches (mash-free)
    #   'minimizer' -- force the minimizer-sketch estimator
    sketch_mode: str = 'auto'
    # Spaced-seed pattern ('1'/'0' string, care positions = '1') for the
    # on-device sketches; None = contiguous k-mers. Only meaningful with
    # sketch_mode='device' (`ops/spaced.py`, `mash.device_sketches`).
    seed_pattern: str | None = None
    # Number of devices for the distributed graph build: 0 = all local
    # devices, 1 = single-device engine, N>1 = shard_map over an N-device
    # mesh (`parallel/distributed.py`). The reference's `--threads` analog
    # at chip granularity.
    devices: int = 1
    # When set, capture a jax.profiler trace of the run into this directory
    # (viewable with TensorBoard / xprof).
    profile_dir: Path | None = None

    @computed_field
    @cached_property
    def version(self) -> str:
        return __version__

    @field_validator(*_PATH_KINDS, mode='before')
    @classmethod
    def _resolve_path(cls, v: Path | None, info: ValidationInfo) -> Path | None:
        if v is None:
            return v
        try:
            path = Path(v).expanduser().resolve(strict=True)
        except OSError:
            raise ValueError(f'Path does not exist or cannot be resolved: {v!r}')
        predicate, noun = _PATH_KINDS[info.field_name]
        if not getattr(path, predicate)():
            raise ValueError(f'Not a {noun}: {path}')
        return path

    @model_validator(mode='after')
    def _check_inputs(self) -> 'Config':
        wants_download = self.tar_taxa or self.neg_taxa
        if wants_download and not HAS_DATASETS:
            raise FileNotFoundError(
                'ncbi-datasets-cli is not installed. Genomes cannot be downloaded from the '
                'provided taxon names or IDs. Please provide local files instead'
            )
        if not self.download_only:
            for role, fields in _INPUT_GROUPS:
                if all(getattr(self, f) is None for f in fields):
                    raise ValueError(
                        f'You must provide at least one {role} input: '
                        + ', '.join(fields[:-1]) + f', or {fields[-1]}')
        for name, lo_c, hi_c in (('penalty_th', 0, 1), ('stringency', 0, 10)):
            val = getattr(self, name)
            if val is not None and not lo_c <= val <= hi_c:
                raise ValueError(f'{name} must be between [{lo_c}, {hi_c}]')
        if (self.max_len is not None) and (self.max_len <= self.min_len):
            raise ValueError('max_len must be greater than min_len')
        if self.seed_pattern is not None:
            # delegate to the one validator (also warns on non-palindromic
            # patterns, which make reverse-complement hashing inconsistent)
            from .ops.spaced import parse_seed

            parse_seed(self.seed_pattern)
        if self.devices < 0:
            raise ValueError('devices must be >= 0 (0 = all local devices)')
        return self

    model_config = {
        'frozen': True,
        'slots': True,
        'validate_default': True,
        'hide_input_in_errors': True,
    }


@dataclass(slots=True)
class RunState:
    """Mutable runtime derivations of a run."""

    working_dir: Path
    rng: Random
    n_tar: int | None = None
    n_neg: int | None = None
    penalty_th: float | None = None
    edge_weight_th: float | None = None
    min_nodes: int | None = None
    max_nodes: int | None = None
    blastdb: Path | None = None


@dataclass(slots=True, frozen=True)
class WorkingDir:
    """File names under the working directory."""

    log: str = 'seqwin.log'
    config: str = 'config.json'
    assemblies_dir: str = 'assemblies'
    assemblies_csv: str = 'assemblies.csv'
    graph: str = 'graph.npz'
    mash: str = 'sketches'
    blast_dir: str = 'blastdb'
    blast_log: str = 'makeblastdb.log'
    markers_fasta: str = 'signatures.fasta'
    markers_csv: str = 'signatures.csv'
    results: str = 'results.seqwin'


@dataclass(slots=True, frozen=True)
class BlastConfig:
    """Settings for `makeblastdb` / `blastn` adapters."""

    title_neg_only: str = 'neg-only'
    title_all: str = 'all'
    queue_size: int = 50
    bool2str: Mapping[bool, str] = field(
        default_factory=lambda: MappingProxyType({True: 'y', False: 'n'})
    )
    str2bool: Mapping[str, bool] = field(
        default_factory=lambda: MappingProxyType({'y': True, 'n': False})
    )
    header_sep: str = '@'
    task: Task = Task.blastn
    columns = (
        'qseqid',
        'sseqid',
        'nident',
        'mismatch',
        'gaps',
        'qstart',
        'qend',
        'sstart',
        'send',
        'evalue',
        'bitscore',
        'sseq',
    )
    batch_size: int = 1000


def config_logger(file: Path, level: int) -> None:
    """Attach a file handler to the root logger."""
    formatter = logging.Formatter(fmt=_LOG_FMT, datefmt=_LOG_DATEFMT, style='%')
    handler = logging.FileHandler(file, mode='a')
    handler.setFormatter(formatter)
    root = logging.getLogger()
    root.addHandler(handler)
    root.setLevel(level)


WORKINGDIR = WorkingDir()
BLASTCONFIG = BlastConfig()

EDGE_W: str = 'w'
NODE_P: str = 'p'
CONSEC_KMER_MUL: float = 1.5
NO_BLAST_DIV: float = 0.5
