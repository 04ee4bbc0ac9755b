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


class VAE(nn.Module):
    """Conditional VAE generative actor for offline BCQ-style algorithms
    (reference: omnisafe/models/actor/vae_actor.py:28-142)."""

    act_dim: int
    hidden_sizes: Sequence[int]
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'

    @property
    def latent_dim(self) -> int:
        return self.act_dim * 2

    def setup(self) -> None:
        self.encoder = MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=self.latent_dim * 2,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
        )
        self.decoder = MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=self.act_dim,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
        )

    def encode(self, obs: Array, act: Array) -> Normal:
        latent = self.encoder(jnp.concatenate([obs, act], axis=-1))
        mean, log_std = jnp.split(latent, 2, axis=-1)
        log_std = jnp.clip(log_std, -20.0, 2.0)
        return Normal(loc=mean, scale=jnp.exp(log_std))

    def decode(self, obs: Array, latent: Array) -> Array:
        return self.decoder(jnp.concatenate([obs, latent], axis=-1))

    def loss(self, obs: Array, act: Array, key: Array):
        """(recon MSE, mean per-dim KL to N(0,1)) — reference: vae_actor.py:102-118."""
        dist = self.encode(obs, act)
        latent = dist.sample(key)
        pred = self.decode(obs, latent)
        recon = jnp.mean(jnp.square(pred - act))
        std_normal = Normal(loc=jnp.zeros_like(dist.loc), scale=jnp.ones_like(dist.scale))
        kl = jnp.mean(dist.kl(std_normal) / self.latent_dim)
        return recon, kl

    def predict(self, obs: Array, key: Array) -> Array:
        latent = jax.random.normal(key, obs.shape[:-1] + (self.latent_dim,))
        return self.decode(obs, latent)

    def __call__(self, obs: Array, act: Array, key: Array):
        return self.loss(obs, act, key)


class PerturbationActor(nn.Module):
    """VAE proposal + bounded perturbation head (BCQ actor)
    (reference: omnisafe/models/actor/perturbation_actor.py:28-99)."""

    act_dim: int
    hidden_sizes: Sequence[int]
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'
    phi: float = 0.05

    def setup(self) -> None:
        self.vae = VAE(
            act_dim=self.act_dim,
            hidden_sizes=self.hidden_sizes,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
        )
        self.perturbation = MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=self.act_dim,
            activation=self.activation,
            output_activation='tanh',
            weight_initialization_mode=self.weight_initialization_mode,
        )

    def predict(self, obs: Array, key: Array) -> Array:
        act = self.vae.predict(obs, key)
        pert = self.perturbation(jnp.concatenate([obs, act], axis=-1))
        return act + self.phi * pert

    def vae_loss(self, obs: Array, act: Array, key: Array):
        return self.vae.loss(obs, act, key)

    def __call__(self, obs: Array, key: Array) -> Array:
        return self.predict(obs, key)


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
    if actor_type == 'vae':
        return VAE(**kwargs)
    if actor_type == 'perturbation':
        return PerturbationActor(**kwargs)
    raise NotImplementedError(f'actor_type {actor_type!r} is not implemented')


__all__ = [
    'GaussianLearningActor', 'GaussianSACActor', 'MLPActor', 'VAE',
    'PerturbationActor', 'build_actor',
]
