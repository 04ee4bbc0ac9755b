"""Pure-pytree probability distributions.

The reference leans on ``torch.distributions`` (Normal,
TanhTransform — reference: omnisafe/utils/math.py:135-215 and
omnisafe/models/actor/gaussian_actor.py).  Here distributions are small
``flax.struct`` pytrees with closed-form log-probs/entropies/KLs so they can
live inside jitted programs and be vmapped across a ``(T, B)`` rollout with no
object churn.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.utils.math import safe_atanh

Array = jax.Array

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


@struct.dataclass
class Normal:
    """Diagonal Gaussian over the last axis."""

    loc: Array
    scale: Array

    def sample(self, key: Array) -> Array:
        return self.loc + self.scale * jax.random.normal(key, self.loc.shape)

    def log_prob(self, value: Array) -> Array:
        """Sum of per-dimension log densities (joint log-prob of the action)."""
        z = (value - self.loc) / self.scale
        per_dim = -0.5 * jnp.square(z) - jnp.log(self.scale) - _LOG_SQRT_2PI
        return jnp.sum(per_dim, axis=-1)

    def entropy(self) -> Array:
        per_dim = 0.5 + _LOG_SQRT_2PI + jnp.log(self.scale)
        return jnp.sum(per_dim, axis=-1)

    def kl(self, other: 'Normal') -> Array:
        """KL(self || other), summed over the action dimension."""
        var_ratio = jnp.square(self.scale / other.scale)
        t1 = jnp.square((self.loc - other.loc) / other.scale)
        per_dim = 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
        return jnp.sum(per_dim, axis=-1)

    def mode(self) -> Array:
        return self.loc


@struct.dataclass
class TanhNormal:
    """Tanh-squashed diagonal Gaussian (SAC-style actor distribution).

    Matches the reference's ``TanhNormal``/``SafeTanhTransformer`` semantics
    (reference: omnisafe/utils/math.py:135-215): samples are ``tanh`` of a
    Gaussian rsample, log-probs include the change-of-variables correction
    with a clamp-safe ``atanh``.
    """

    base: Normal

    def sample(self, key: Array) -> Array:
        return jnp.tanh(self.base.sample(key))

    def sample_with_log_prob(self, key: Array) -> Tuple[Array, Array]:
        pre = self.base.sample(key)
        act = jnp.tanh(pre)
        # log|d tanh/dx| = 2*(log2 - x - softplus(-2x)); subtract its sum.
        logp = self.base.log_prob(pre) - jnp.sum(
            2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), axis=-1
        )
        return act, logp

    def log_prob(self, value: Array) -> Array:
        pre = safe_atanh(value)
        return self.base.log_prob(pre) - jnp.sum(
            2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), axis=-1
        )

    def mode(self) -> Array:
        return jnp.tanh(self.base.loc)

    def mode_with_log_prob(self) -> Tuple[Array, Array]:
        """Mode and its log-prob computed from the pre-activation directly —
        avoids the ``atanh(clip(tanh(x)))`` round trip whose gradient explodes
        as ``|tanh(x)| -> 1`` (needed by deterministic tanh-actor losses)."""
        pre = self.base.loc
        logp = self.base.log_prob(pre) - jnp.sum(
            2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), axis=-1
        )
        return jnp.tanh(pre), logp


__all__ = ['Normal', 'TanhNormal']
