"""Actor networks.

Counterparts of the reference actor zoo (reference:
omnisafe/models/actor/*.py), as stateless flax modules returning distribution
pytrees instead of mutating a cached ``_current_dist``:

* :class:`GaussianLearningActor` — Gaussian with state-independent learned
  log-std (reference: omnisafe/models/actor/gaussian_learning_actor.py:29-139).
* :class:`GaussianSACActor` — tanh-squashed Gaussian with state-dependent
  clamped log-std (reference: omnisafe/models/actor/gaussian_sac_actor.py:29-183).
* :class:`MLPActor` — deterministic tanh actor for DDPG/TD3 with exploration
  noise handled by the caller (reference: omnisafe/models/actor/mlp_actor.py:28-126).
* :func:`build_actor` — string-dispatch factory
  (reference: omnisafe/models/actor/actor_builder.py:29-126).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnisafe_tpu.models.mlp import MLP
from omnisafe_tpu.utils.distributions import Normal, TanhNormal

Array = jax.Array

_LOG_STD_MIN = -20.0
_LOG_STD_MAX = 2.0


class GaussianLearningActor(nn.Module):
    """Gaussian policy with a learnable state-independent log-std (init 0)."""

    act_dim: int
    hidden_sizes: Sequence[int]
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'

    @nn.compact
    def __call__(self, obs: Array) -> Normal:
        mean = MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=self.act_dim,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
            name='mean',
        )(obs)
        log_std = self.param('log_std', nn.initializers.zeros, (self.act_dim,))
        std = jnp.broadcast_to(jnp.exp(log_std), mean.shape)
        return Normal(loc=mean, scale=std)


class GaussianSACActor(nn.Module):
    """Tanh-squashed Gaussian with state-dependent clamped log-std."""

    act_dim: int
    hidden_sizes: Sequence[int]
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'

    @nn.compact
    def __call__(self, obs: Array) -> TanhNormal:
        out = MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=2 * self.act_dim,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
            name='net',
        )(obs)
        mean, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, _LOG_STD_MIN, _LOG_STD_MAX)
        return TanhNormal(base=Normal(loc=mean, scale=jnp.exp(log_std)))


class MLPActor(nn.Module):
    """Deterministic tanh-bounded actor (DDPG/TD3)."""

    act_dim: int
    hidden_sizes: Sequence[int]
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        return MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=self.act_dim,
            activation=self.activation,
            output_activation='tanh',
            weight_initialization_mode=self.weight_initialization_mode,
            name='net',
        )(obs)


def build_actor(
    actor_type: str,
    act_dim: int,
    hidden_sizes: Sequence[int],
    activation: str = 'relu',
    weight_initialization_mode: str = 'kaiming_uniform',
) -> nn.Module:
    """String-dispatch actor factory (reference: omnisafe/models/actor/actor_builder.py:29-126)."""
    kwargs = dict(
        act_dim=act_dim,
        hidden_sizes=tuple(hidden_sizes),
        activation=activation,
        weight_initialization_mode=weight_initialization_mode,
    )
    if actor_type in ('gaussian_learning', 'gaussian'):
        return GaussianLearningActor(**kwargs)
    if actor_type == 'gaussian_sac':
        return GaussianSACActor(**kwargs)
    if actor_type == 'mlp':
        return MLPActor(**kwargs)
    raise NotImplementedError(f'actor_type {actor_type!r} is not implemented')


__all__ = ['GaussianLearningActor', 'GaussianSACActor', 'MLPActor', 'build_actor']
