"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Mirrors the reference's strategy of testing distributed behavior without a
cluster (reference: tests/test_utils.py:91-92 relaunches under torchrun); here
``xla_force_host_platform_device_count`` provides N devices in-process, so the
same ``shard_map`` programs that run on a TPU pod slice are exercised on CPU.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

# the environment's TPU plugin rewrites JAX_PLATFORMS to 'axon,cpu'; force the
# config directly so tests never touch (or contend for) the real chip
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        '--full',
        action='store_true',
        default=False,
        help='run the full algorithm smoke-training matrix (slow)',
    )


def pytest_configure(config):
    config.addinivalue_line('markers', 'full: exhaustive algorithm matrix (slow)')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--full') or os.environ.get('OMNISAFE_TPU_FULL_TESTS'):
        return
    skip = pytest.mark.skip(reason='full matrix: run with --full')
    for item in items:
        if 'full' in item.keywords:
            item.add_marker(skip)
