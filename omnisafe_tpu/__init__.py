"""omnisafe_tpu: a TPU-native safe-RL constrained-optimization framework.

Brand-new JAX/XLA/pjit re-design with the capabilities of the
PKU-Alignment/OmniSafe reference (package surface mirrors
omnisafe/__init__.py:23-27): ``Agent`` (the AlgoWrapper), the algorithm
registry, and the environment registry.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the first compile of a training program is
# expensive on TPU (tens of seconds); caching it on disk makes every
# subsequent run of the same config start hot.  Opt out with
# OMNISAFE_TPU_NO_COMPILE_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR.
if (
    not _os.environ.get('OMNISAFE_TPU_NO_COMPILE_CACHE')
    # respect a cache dir an embedding app already configured programmatically
    and getattr(_jax.config, 'jax_compilation_cache_dir', None) is None
):
    _cache_dir = _os.environ.get(
        'JAX_COMPILATION_CACHE_DIR',
        _os.path.join(_os.path.expanduser('~'), '.cache', 'omnisafe_tpu', 'xla'),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except (OSError, AttributeError):  # read-only fs or very old jax
        pass

from omnisafe_tpu import algorithms, envs, models
from omnisafe_tpu.algo_wrapper import Agent, AlgoWrapper
from omnisafe_tpu.algorithms import ALGORITHM2TYPE, ALGORITHMS, registry
from omnisafe_tpu.evaluator import Evaluator
from omnisafe_tpu.version import __version__

__all__ = [
    'Agent',
    'AlgoWrapper',
    'ALGORITHMS',
    'ALGORITHM2TYPE',
    'registry',
    'Evaluator',
    '__version__',
]
