"""omnisafe_tpu: a TPU-native safe-RL constrained-optimization framework.

Brand-new JAX/XLA/pjit re-design with the capabilities of the
PKU-Alignment/OmniSafe reference (package surface mirrors
omnisafe/__init__.py:23-27): ``Agent`` (the AlgoWrapper), the algorithm
registry, and the environment registry.
"""

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
