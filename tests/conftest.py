"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh; real-TPU runs happen
in benchmarks, not in the unit suite.
"""
import os
from pathlib import Path

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU platform
# (e.g. axon), and the unit suite must not depend on accelerator access. A
# sitecustomize may have imported jax already, so update the live config too.
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import pytest  # noqa: E402

REFERENCE_FIXTURES = Path('/root/reference/tests/smoke/fixtures')


@pytest.fixture(scope='session')
def ref_fixtures() -> Path:
    if not REFERENCE_FIXTURES.is_dir():
        pytest.skip('reference fixtures not available')
    return REFERENCE_FIXTURES


@pytest.fixture(scope='session')
def fixture_paths(ref_fixtures: Path) -> list[Path]:
    return [
        ref_fixtures / 'targets' / 'target-1.fasta',
        ref_fixtures / 'targets' / 'target-2.fasta',
        ref_fixtures / 'non-targets' / 'non-target-1.fasta',
        ref_fixtures / 'non-targets' / 'non-target-2.fasta',
    ]
