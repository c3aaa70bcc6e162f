"""seqwin-tpu: TPU-native signature-sequence discovery.

A from-scratch JAX/XLA re-design of the Seqwin pipeline
(reference: treangenlab/Seqwin, mounted at /root/reference): discover genomic
signature sequences (present in all target genomes, absent from non-targets)
by building a minimizer pan-genome graph and extracting low-penalty connected
subgraphs.

The compute path (ntHash minimizers, window selection, graph aggregation)
runs on TPU via XLA; orchestration, marker extraction and external-tool
adapters run on the host with the same output contract as the reference.
"""
import os as _os

import jax as _jax

# The hashing core is exact 64-bit integer arithmetic; XLA:TPU supports s64/u64
# natively (lowered to 32-bit pairs), but JAX must be put in x64 mode before
# any array is created.
_jax.config.update('jax_enable_x64', True)

# Explicit platform override (e.g. SEQWIN_TPU_PLATFORM=cpu for CPU-forced
# verification runs). The environment's sitecustomize may pin JAX_PLATFORMS
# to the TPU plugin before user env vars are consulted; jax.config.update
# here still wins because no backend has been initialized yet.
if _os.environ.get('SEQWIN_TPU_PLATFORM'):
    _jax.config.update('jax_platforms', _os.environ['SEQWIN_TPU_PLATFORM'])

# Persistent compilation cache: remote TPU compiles of the larger XLA graphs
# take minutes; cache them across processes. Opt out with
# SEQWIN_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get('SEQWIN_TPU_NO_COMPILE_CACHE'):
    _cache_dir = _os.environ.get(
        'JAX_COMPILATION_CACHE_DIR', _os.path.expanduser('~/.cache/seqwin_tpu_jax')
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

from ._version import __version__  # noqa: E402,F401
from .config import Config  # noqa: E402,F401
from .core import Seqwin, load, run  # noqa: E402,F401
