"""Offline adapter: policy evaluation over the real environment.

Counterpart of the reference ``OfflineAdapter``
(reference: omnisafe/adapter/offline_adapter.py:32-149): no rollout
collection — only ``evaluate(episodes, predict_fn)`` for trained offline
policies, as one jitted scan over vectorized eval episodes.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.envs.core import make
from omnisafe_tpu.envs.wrappers import ActionScale, AutoReset, TimeLimit, Vectorize

Array = jax.Array


class OfflineAdapter:
    """Evaluation-only environment binding."""

    def __init__(self, env_id: str, num_envs: int = 1) -> None:
        env = make(env_id)
        self._raw = env
        stack = env
        if env.need_time_limit_wrapper:
            stack = TimeLimit(stack, env.max_episode_steps)
        if env.need_auto_reset_wrapper:
            stack = AutoReset(stack)
        stack = Vectorize(stack, num_envs)
        stack = ActionScale(stack, -1.0, 1.0)
        self._env = stack
        self._num_envs = num_envs
        self._max_steps = env.max_episode_steps

    @property
    def observation_space(self):
        return self._raw.observation_space

    @property
    def action_space(self):
        return self._env.action_space

    def evaluate(
        self,
        predict_fn: Callable[[Array, Array], Array],
        key: Array,
    ) -> Tuple[Array, Array, Array]:
        """One evaluation episode per vector slot; returns per-env
        (ep_ret, ep_cost, ep_len) (reference: offline_adapter.py:115-149)."""
        reset_key, roll_key = jax.random.split(key)
        env_state, obs = self._env.reset(reset_key)

        def body(carry, _):
            env_state, obs, rng, ep_ret, ep_cost, ep_len, alive = carry
            rng, a_key, s_key = jax.random.split(rng, 3)
            act = predict_fn(obs, a_key)
            env_state, ts = self._env.step(env_state, act, s_key)
            live = alive.astype(jnp.float32)
            ep_ret = ep_ret + ts.reward * live
            ep_cost = ep_cost + ts.cost * live
            ep_len = ep_len + live
            alive = jnp.logical_and(alive, jnp.logical_not(ts.done))
            return (env_state, ts.obs, rng, ep_ret, ep_cost, ep_len, alive), None

        zeros = jnp.zeros((self._num_envs,))
        (_, _, _, ep_ret, ep_cost, ep_len, _), _ = jax.lax.scan(
            body,
            (env_state, obs, roll_key, zeros, zeros, zeros, jnp.ones((self._num_envs,), bool)),
            None,
            length=self._max_steps,
        )
        return ep_ret, ep_cost, ep_len


__all__ = ['OfflineAdapter']
