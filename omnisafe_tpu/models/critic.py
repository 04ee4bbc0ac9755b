"""Critic networks.

Counterparts of the reference critics (reference:
omnisafe/models/critic/v_critic.py:27-110, q_critic.py:27-133,
critic_builder.py:26-133).  ``QCritic`` vmaps its ensemble axis so twin
critics are one batched matmul on the MXU rather than two sequential modules.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnisafe_tpu.models.mlp import MLP

Array = jax.Array


class VCritic(nn.Module):
    """State-value critic V(s)."""

    hidden_sizes: Sequence[int]
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        out = MLP(
            hidden_sizes=self.hidden_sizes,
            out_dim=1,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
            name='net',
        )(obs)
        return jnp.squeeze(out, axis=-1)


class QCritic(nn.Module):
    """Action-value critic Q(s, a) with ``num_critics`` twin heads.

    Returns shape ``(num_critics, *batch)``; heads are an ensemble axis
    handled by ``nn.vmap`` so the twin evaluation is a single batched pass.
    """

    hidden_sizes: Sequence[int]
    num_critics: int = 1
    activation: str = 'relu'
    weight_initialization_mode: str = 'kaiming_uniform'

    @nn.compact
    def __call__(self, obs: Array, act: Array) -> Array:
        x = jnp.concatenate([obs, act], axis=-1)
        ensemble = nn.vmap(
            MLP,
            in_axes=None,
            out_axes=0,
            axis_size=self.num_critics,
            variable_axes={'params': 0},
            split_rngs={'params': True},
        )(
            hidden_sizes=self.hidden_sizes,
            out_dim=1,
            activation=self.activation,
            weight_initialization_mode=self.weight_initialization_mode,
            name='ensemble',
        )
        return jnp.squeeze(ensemble(x), axis=-1)


def build_critic(
    critic_type: str,
    hidden_sizes: Sequence[int],
    activation: str = 'relu',
    weight_initialization_mode: str = 'kaiming_uniform',
    num_critics: int = 1,
) -> nn.Module:
    """String-dispatch critic factory (reference: omnisafe/models/critic/critic_builder.py:26-133)."""
    if critic_type == 'v':
        return VCritic(
            hidden_sizes=tuple(hidden_sizes),
            activation=activation,
            weight_initialization_mode=weight_initialization_mode,
        )
    if critic_type == 'q':
        return QCritic(
            hidden_sizes=tuple(hidden_sizes),
            num_critics=num_critics,
            activation=activation,
            weight_initialization_mode=weight_initialization_mode,
        )
    raise NotImplementedError(f'critic_type {critic_type!r} is not implemented')


__all__ = ['VCritic', 'QCritic', 'build_critic']
