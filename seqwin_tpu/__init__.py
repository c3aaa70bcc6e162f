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
import jax as _jax

# The hashing core is exact 64-bit integer arithmetic; XLA:TPU supports s64/u64
# natively (lowered to 32-bit pairs), but JAX must be put in x64 mode before
# any array is created.
_jax.config.update('jax_enable_x64', True)

from ._version import __version__  # noqa: E402,F401
from .config import Config  # noqa: E402,F401
from .core import Seqwin, load, run  # noqa: E402,F401
