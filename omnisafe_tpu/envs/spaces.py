"""Minimal jittable space descriptions.

The reference uses ``gymnasium.spaces`` (reference: omnisafe/envs/core.py:60-75);
here spaces are static metadata consumed at trace time, so a tiny hashable
dataclass is all we need.  Only ``Box`` is supported — the reference's model
layer likewise rejects non-Box spaces (reference: omnisafe/models/base.py:66-74).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    """A continuous space with per-dimension bounds.

    ``low``/``high`` are stored as tuples so the space is hashable and can be a
    static argument of jitted functions.
    """

    low: Tuple[float, ...]
    high: Tuple[float, ...]

    @staticmethod
    def create(low, high, shape=None) -> 'Box':
        if shape is not None:
            low = np.broadcast_to(np.asarray(low, np.float32), shape)
            high = np.broadcast_to(np.asarray(high, np.float32), shape)
        low = np.asarray(low, np.float32).reshape(-1)
        high = np.asarray(high, np.float32).reshape(-1)
        return Box(tuple(low.tolist()), tuple(high.tolist()))

    @property
    def shape(self) -> Tuple[int, ...]:
        return (len(self.low),)

    @property
    def low_array(self) -> jax.Array:
        return jnp.asarray(self.low, jnp.float32)

    @property
    def high_array(self) -> jax.Array:
        return jnp.asarray(self.high, jnp.float32)

    @property
    def bounded(self) -> bool:
        return bool(np.all(np.isfinite(self.low)) and np.all(np.isfinite(self.high)))

    def sample(self, key: jax.Array) -> jax.Array:
        low = jnp.where(jnp.isfinite(self.low_array), self.low_array, -1.0)
        high = jnp.where(jnp.isfinite(self.high_array), self.high_array, 1.0)
        return jax.random.uniform(key, self.shape, jnp.float32, low, high)


__all__ = ['Box']
