"""Saute / Simmer / Early-Terminated environment transformations.

Counterparts of the reference's stateful adapters
(reference: omnisafe/adapter/saute_adapter.py:31-259,
simmer_adapter.py:57-131, early_terminated_adapter.py:40-94), expressed as
pure wrappers:

* :class:`SauteWrapper` (vector level) augments the observation with the
  remaining safety budget ``z``, updates ``z -= cost/budget; z /= γ_saute``
  per step, and replaces the reward with ``unsafe_reward`` once the budget is
  exhausted.  The budget lives in the wrapper *state* so Simmer's PID
  controller can retune it between epochs.
* :class:`EarlyTerminatedWrapper` (single-env level, under AutoReset)
  accumulates episode cost and terminates with zero reward once it exceeds
  the cost limit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.core import CMDP, Wrapper
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array


def discounted_budget(budget: float, saute_gamma: float, max_ep_len: int) -> float:
    """Budget normalization by the discounted horizon
    (reference: saute_adapter.py:62-68)."""
    return budget * (1.0 - saute_gamma**max_ep_len) / (1.0 - saute_gamma) / max_ep_len


@struct.dataclass
class SauteState:
    env: Any
    safety_obs: Array   # (B,) remaining relative budget z
    budget: Array       # () current (possibly Simmer-controlled) scaled budget
    rel_budget: Array   # () budget / upper_budget — the reset value Simmer uses


class SauteWrapper(Wrapper):
    """State-augmentation wrapper over the *vectorized* stack."""

    # pylint: disable-next=too-many-arguments
    def __init__(
        self,
        env: CMDP,
        num_envs: int,
        safety_budget: float,
        saute_gamma: float,
        unsafe_reward: float,
        max_ep_len: int,
        upper_budget: float | None = None,
        simmer: bool = False,
    ) -> None:
        super().__init__(env)
        self._num_envs = num_envs
        self._saute_gamma = saute_gamma
        self._unsafe_reward = unsafe_reward
        self._init_budget = discounted_budget(safety_budget, saute_gamma, max_ep_len)
        self._upper_budget = discounted_budget(
            upper_budget if upper_budget is not None else safety_budget,
            saute_gamma,
            max_ep_len,
        )
        self._simmer = simmer

    @property
    def observation_space(self) -> Box:
        dim = self._env.observation_space.shape[0] + 1
        return Box.create(-jnp.inf, jnp.inf, (dim,))

    def _augment(self, obs: Array, safety_obs: Array) -> Array:
        return jnp.concatenate([obs, safety_obs[..., None]], axis=-1)

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        budget = jnp.asarray(self._init_budget)
        rel = jnp.asarray(self._init_budget / self._upper_budget)
        # Saute starts episodes at z=1; Simmer at the relative budget
        # (reference: saute_adapter.py:131-138, simmer_adapter.py:99-112)
        z0 = rel if self._simmer else jnp.asarray(1.0)
        safety_obs = jnp.full((self._num_envs,), z0)
        new_state = SauteState(env=state, safety_obs=safety_obs, budget=budget, rel_budget=rel)
        return new_state, self._augment(obs, safety_obs)

    def step(self, state: SauteState, action: Array, key: Array):
        inner, ts = self._env.step(state.env, action, key)
        raw_reward = ts.info.get('original_reward', ts.reward)
        info = dict(ts.info)
        info['original_reward'] = raw_reward

        # z update + reward replacement (reference: saute_adapter.py:180-203)
        safety_obs = (state.safety_obs - ts.cost / state.budget) / self._saute_gamma
        reward = jnp.where(safety_obs > 0.0, ts.reward, self._unsafe_reward)
        # on done the budget restarts at 1 (even under Simmer — the reference
        # resets to 1 on mid-epoch auto-resets, saute_adapter.py:186-188)
        done = ts.done
        safety_obs = jnp.where(done, 1.0, safety_obs)

        new_state = state.replace(env=inner, safety_obs=safety_obs)
        return new_state, ts.replace(
            obs=self._augment(ts.obs, safety_obs),
            final_obs=self._augment(ts.final_obs, safety_obs),
            reward=reward,
            info=info,
        )


@struct.dataclass
class EarlyTerminatedState:
    env: Any
    acc_cost: Array


class EarlyTerminatedWrapper(Wrapper):
    """Terminate (reward 0) once accumulated episode cost exceeds the limit
    (reference: early_terminated_adapter.py:77-88).  Sits under AutoReset so
    the triggered termination resets the episode in the same step."""

    def __init__(self, env: CMDP, cost_limit: float) -> None:
        super().__init__(env)
        self._cost_limit = cost_limit

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        return EarlyTerminatedState(env=state, acc_cost=jnp.zeros(())), obs

    def step(self, state: EarlyTerminatedState, action: Array, key: Array):
        inner, ts = self._env.step(state.env, action, key)
        acc = state.acc_cost + ts.cost
        trigger = acc > self._cost_limit
        ts = ts.replace(
            reward=jnp.where(trigger, 0.0, ts.reward),
            terminated=jnp.logical_or(ts.terminated, trigger),
        )
        return EarlyTerminatedState(env=inner, acc_cost=acc), ts


__all__ = ['SauteWrapper', 'SauteState', 'EarlyTerminatedWrapper', 'discounted_budget']
