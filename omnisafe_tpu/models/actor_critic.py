"""Composite actor-critic models.

Counterparts of the reference composites (reference:
omnisafe/models/actor_critic/actor_critic.py:32-183,
constraint_actor_critic.py:29-129, actor_q_critic.py:28-165,
constraint_actor_q_critic.py:29-97).  The torch version is a stateful
``nn.Module`` owning optimizers; here the composite is a thin *builder* of
pure apply functions, and all learnable state (parameter pytrees, target
copies) lives in explicit ``flax.struct`` containers so the training step can
jit over it and shard it over a mesh.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.spaces import Box
from omnisafe_tpu.models.actor import build_actor
from omnisafe_tpu.models.critic import build_critic

Array = jax.Array


@struct.dataclass
class ACParams:
    """Parameters of a ConstraintActorCritic (actor + V_r + V_c)."""

    actor: Any
    reward_critic: Any
    cost_critic: Any


@struct.dataclass
class ACQParams:
    """Parameters of a ConstraintActorQCritic (+ target copies for TD)."""

    actor: Any
    reward_critic: Any
    cost_critic: Any
    target_actor: Any
    target_reward_critic: Any
    target_cost_critic: Any


class ConstraintActorCritic:
    """Actor + reward V-critic + cost V-critic
    (reference: omnisafe/models/actor_critic/constraint_actor_critic.py:29-129)."""

    def __init__(self, obs_space: Box, act_space: Box, model_cfgs: Any) -> None:
        self.obs_dim = obs_space.shape[0]
        self.act_dim = act_space.shape[0]
        actor_cfg = model_cfgs.actor
        critic_cfg = model_cfgs.critic
        self.actor = build_actor(
            model_cfgs.actor_type,
            act_dim=self.act_dim,
            hidden_sizes=actor_cfg.hidden_sizes,
            activation=actor_cfg.activation,
            weight_initialization_mode=model_cfgs.weight_initialization_mode,
        )
        self.reward_critic = build_critic(
            'v',
            hidden_sizes=critic_cfg.hidden_sizes,
            activation=critic_cfg.activation,
            weight_initialization_mode=model_cfgs.weight_initialization_mode,
        )
        self.cost_critic = build_critic(
            'v',
            hidden_sizes=critic_cfg.hidden_sizes,
            activation=critic_cfg.activation,
            weight_initialization_mode=model_cfgs.weight_initialization_mode,
        )

    def init(self, key: Array) -> ACParams:
        ka, kr, kc = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        return ACParams(
            actor=self.actor.init(ka, obs),
            reward_critic=self.reward_critic.init(kr, obs),
            cost_critic=self.cost_critic.init(kc, obs),
        )

    def distribution(self, params: ACParams, obs: Array):
        return self.actor.apply(params.actor, obs)

    def value(self, params: ACParams, obs: Array) -> Tuple[Array, Array]:
        return (
            self.reward_critic.apply(params.reward_critic, obs),
            self.cost_critic.apply(params.cost_critic, obs),
        )

    def step(
        self,
        params: ACParams,
        obs: Array,
        key: Array,
        deterministic: bool = False,
    ) -> Tuple[Array, Array, Array, Array]:
        """Choose action; returns ``(act, value_r, value_c, logp)``
        (reference: constraint_actor_critic.py:84-109)."""
        dist = self.distribution(params, obs)
        act = dist.mode() if deterministic else dist.sample(key)
        logp = dist.log_prob(act)
        value_r, value_c = self.value(params, obs)
        return act, value_r, value_c, logp


class ConstraintActorQCritic:
    """Actor + twin reward/cost Q-critics + target copies
    (reference: omnisafe/models/actor_critic/constraint_actor_q_critic.py:29-97)."""

    def __init__(self, obs_space: Box, act_space: Box, model_cfgs: Any) -> None:
        self.obs_dim = obs_space.shape[0]
        self.act_dim = act_space.shape[0]
        actor_cfg = model_cfgs.actor
        critic_cfg = model_cfgs.critic
        self.actor = build_actor(
            model_cfgs.actor_type,
            act_dim=self.act_dim,
            hidden_sizes=actor_cfg.hidden_sizes,
            activation=actor_cfg.activation,
            weight_initialization_mode=model_cfgs.weight_initialization_mode,
        )
        num_critics = getattr(critic_cfg, 'num_critics', 1)
        self.reward_critic = build_critic(
            'q',
            hidden_sizes=critic_cfg.hidden_sizes,
            activation=critic_cfg.activation,
            weight_initialization_mode=model_cfgs.weight_initialization_mode,
            num_critics=num_critics,
        )
        # the cost critic is single-head in the reference (pessimism is on
        # reward only; cost uses one head — constraint_actor_q_critic.py:61-97)
        self.cost_critic = build_critic(
            'q',
            hidden_sizes=critic_cfg.hidden_sizes,
            activation=critic_cfg.activation,
            weight_initialization_mode=model_cfgs.weight_initialization_mode,
            num_critics=1,
        )

    def init(self, key: Array) -> ACQParams:
        ka, kr, kc = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.act_dim))
        actor = self.actor.init(ka, obs)
        reward_critic = self.reward_critic.init(kr, obs, act)
        cost_critic = self.cost_critic.init(kc, obs, act)
        return ACQParams(
            actor=actor,
            reward_critic=reward_critic,
            cost_critic=cost_critic,
            target_actor=actor,
            target_reward_critic=reward_critic,
            target_cost_critic=cost_critic,
        )

    def polyak_update(self, params: ACQParams, polyak: float) -> ACQParams:
        """Soft target update (reference: actor_q_critic.py:153-165)."""
        ema = lambda t, s: jax.tree.map(lambda a, b: (1.0 - polyak) * a + polyak * b, t, s)
        return params.replace(
            target_actor=ema(params.target_actor, params.actor),
            target_reward_critic=ema(params.target_reward_critic, params.reward_critic),
            target_cost_critic=ema(params.target_cost_critic, params.cost_critic),
        )


__all__ = ['ACParams', 'ACQParams', 'ConstraintActorCritic', 'ConstraintActorQCritic']
