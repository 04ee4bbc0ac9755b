"""Tiny synthetic CMDP used by the test-suite and examples.

Counterpart of the reference's ``Test-v0``/``Simple-v0`` envs
(reference: tests/simple_env.py:30-90, omnisafe/envs/custom_env.py:32-199):
a random-ish 8-dim obs / 2-dim act box CMDP with 10-step episodes.  Unlike
the reference's purely random rewards, the signal here is weakly learnable —
reward grows with ``act[0]``, cost with ``relu(act[1])`` — so smoke tests can
assert the *direction* of learning, not just that nothing crashes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array


@struct.dataclass
class SimpleState:
    obs: Array
    key: Array


@env_register
class SimpleEnv(CMDP):
    """Random-walk CMDP with learnable reward/cost directions."""

    _support_envs = ['Simple-v0', 'Test-v0']
    need_time_limit_wrapper = True
    need_auto_reset_wrapper = True

    _OBS_DIM = 8
    _ACT_DIM = 2

    @property
    def observation_space(self) -> Box:
        return Box.create(-jnp.inf, jnp.inf, (self._OBS_DIM,))

    @property
    def action_space(self) -> Box:
        return Box.create(-1.0, 1.0, (self._ACT_DIM,))

    @property
    def max_episode_steps(self) -> int:
        return 10

    def reset(self, key: Array):
        obs_key, state_key = jax.random.split(key)
        obs = jax.random.normal(obs_key, (self._OBS_DIM,))
        return SimpleState(obs=obs, key=state_key), obs

    def step(self, state: SimpleState, action: Array, key: Array) -> Tuple[SimpleState, TimeStep]:
        noise = jax.random.normal(key, (self._OBS_DIM,)) * 0.1
        obs = 0.9 * state.obs + noise
        reward = action[0] + 0.1 * jnp.sum(obs[:2])
        cost = jax.nn.relu(action[1])
        ts = TimeStep(
            obs=obs,
            reward=reward,
            cost=cost,
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
            final_obs=obs,
        )
        return SimpleState(obs=obs, key=state.key), ts


__all__ = ['SimpleEnv']
