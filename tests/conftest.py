"""Test harness: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; unit tests
validate physics and sharding semantics on CPU (the reference takes the same
approach with NUMBA_ENABLE_CUDASIM, .github/workflows/test.yml).
"""
import os
import sys

# test-only helper modules (reference-semantics oracles) live beside the tests
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# jax may already be imported by an interpreter site hook, in which case the
# env vars above were bound too late -- override the platform at runtime
# (must happen before any backend use).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

REFERENCE_ASSETS = '/root/reference/larndsim'
os.environ.setdefault('LARNDSIM_ASSETS', REFERENCE_ASSETS)

# persist CPU compiles across test runs (cache keys include platform, so
# sharing the directory with TPU runs is safe)
from larndsim_tpu.cli.simulate_pixels import enable_jax_compilation_cache  # noqa: E402

enable_jax_compilation_cache()
