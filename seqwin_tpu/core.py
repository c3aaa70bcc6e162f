"""Run orchestration: the `Seqwin` instance, `run()` and `load()` entry points.

Contract of `/root/reference/src/seqwin/core.py:46-188`: working-directory
creation/overwrite protocol, config.json dump, graph.npz escape hatch with
--no-filter, full-instance pickle to results.seqwin.
"""
from __future__ import annotations

import logging
import pickle
from pathlib import Path
from random import Random

logger = logging.getLogger(__name__)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from .assemblies import Assemblies, get_assemblies  # noqa: E402
from .config import WORKINGDIR, Config, RunState, config_logger  # noqa: E402
from .pipeline.kmers import KmerGraph, get_kmers  # noqa: E402
from .pipeline.markers import ConnectedKmers, get_markers  # noqa: E402
from .utils import file_to_write, overwrite_error, overwrite_warning  # noqa: E402


class Seqwin:
    """One pipeline run: config -> assemblies -> k-mer graph -> signatures."""

    __slots__ = ('config', 'state', 'assemblies', 'kmers', 'mash', 'markers')

    config: Config
    state: RunState
    assemblies: Assemblies
    kmers: KmerGraph | None
    mash: pd.DataFrame | None
    markers: list[ConnectedKmers] | None

    def __init__(self, config: Config) -> None:
        prefix = config.prefix
        title = config.title
        overwrite = config.overwrite

        working_dir = prefix / title
        try:
            working_dir.mkdir(parents=False, exist_ok=False)
            logger.info(f'Created output directory {working_dir}')
        except FileExistsError:
            if working_dir.is_file():
                raise NotADirectoryError(
                    f'Cannot create {working_dir}, since it already exists as a file'
                ) from None
            elif overwrite:
                overwrite_warning(working_dir)
            else:
                overwrite_error(working_dir)

        config_logger(working_dir / WORKINGDIR.log, logging.INFO)
        logger.info(f'Running seqwin-tpu v{config.version}')
        if config.n_cpu == 1:
            logger.warning('Using only one CPU thread, longer running time is expected')

        config_path = working_dir / WORKINGDIR.config
        file_to_write(config_path, overwrite)
        config_path.write_text(config.model_dump_json(indent=4))
        logger.info(f'Run configurations saved as {config_path}')

        state = RunState(working_dir=working_dir, rng=Random(config.seed))
        assemblies = get_assemblies(config, state)

        self.config = config
        self.state = state
        self.assemblies = assemblies
        self.kmers = None
        self.mash = None
        self.markers = None

    def run(self) -> None:
        """Build the k-mer graph and extract candidate markers."""
        config = self.config
        state = self.state

        profiling = config.profile_dir is not None
        if profiling:
            import jax

            jax.profiler.start_trace(str(config.profile_dir))
            logger.info(f'jax.profiler trace -> {config.profile_dir}')
        try:
            self._run_inner(config, state)
        finally:
            if profiling:
                import jax

                jax.profiler.stop_trace()

    def _run_inner(self, config: Config, state: RunState) -> None:
        kmers, jaccard = get_kmers(self.assemblies, config, state)

        if config.no_filter:
            graph_path = state.working_dir / WORKINGDIR.graph
            file_to_write(graph_path, config.overwrite)
            np.savez(
                graph_path,
                kmers=kmers.kmers,
                nodes=kmers.nodes,
                edges=kmers.edges,
                record_offsets=kmers.record_offsets,
            )
            logger.info(f'Filtering is turned off. Raw minimizer graph is saved as {graph_path}')
        else:
            markers = get_markers(kmers, self.assemblies, config, state)
            self.kmers = kmers
            self.mash = jaccard
            self.markers = markers

            results_path = state.working_dir / WORKINGDIR.results
            file_to_write(results_path, config.overwrite)
            results_path.write_bytes(pickle.dumps(self))
            logger.info(f'Run instance (includes all run data) saved as {results_path}')


def run(config: Config) -> Seqwin:
    """Run the full pipeline for a config."""
    seqwin = Seqwin(config)
    if not config.download_only:
        seqwin.run()
    return seqwin


def load(path: str | Path) -> Seqwin:
    """Load a pickled run instance (results.seqwin)."""
    if isinstance(path, str):
        path = Path(path)
    return pickle.loads(path.read_bytes())
