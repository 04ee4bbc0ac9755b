"""Shared type aliases for the TPU-native safe-RL framework.

Counterpart of the reference's ``omnisafe/typing.py`` (reference:
omnisafe/typing.py:1-60), re-expressed for JAX: everything numerical is a
``jax.Array`` and pseudo-randomness is an explicit PRNG key.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Sequence, Tuple, Union

import jax

Array = jax.Array
PRNGKey = jax.Array
PyTree = Any
Metrics = Dict[str, Array]

# Activation names accepted by the model builders (reference: omnisafe/typing.py:42-47).
ACTIVATIONS = ('identity', 'relu', 'sigmoid', 'softplus', 'tanh', 'gelu')
# Actor types accepted by the actor builder (reference: omnisafe/typing.py:49).
ACTOR_TYPES = ('gaussian_learning', 'gaussian_sac', 'mlp', 'vae', 'perturbation')
# Advantage estimators supported by the on-policy batch assembly
# (reference: omnisafe/common/buffer/onpolicy_buffer.py:299-334).
ADVANTAGE_ESTIMATORS = ('gae', 'gae-rtg', 'vtrace', 'plain')

__all__ = [
    'Array',
    'PRNGKey',
    'PyTree',
    'Metrics',
    'ACTIVATIONS',
    'ACTOR_TYPES',
    'ADVANTAGE_ESTIMATORS',
]
