"""Test configuration: force CPU with 8 virtual devices.

The environment pins JAX_PLATFORMS=axon (a single tunneled TPU); tests run on
a virtual 8-device CPU mesh so sharding paths are exercised without hardware.
Must run before jax initializes a backend.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'slow: long-running statistical tests (full matrix: run without '
        "-m 'not slow'; fast core: pytest -m 'not slow')")
