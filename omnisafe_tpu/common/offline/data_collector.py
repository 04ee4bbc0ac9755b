"""Offline dataset collection by rolling a policy in an environment.

Counterpart of the reference's ``OfflineDataCollector``
(reference: omnisafe/common/offline/data_collector.py:42-212): rolls saved
policies (or a random policy) to build ``.npz`` datasets with
obs/action/reward/cost/next_obs/done.  The rollout is one jitted scan over
the vectorized env, so collecting a million transitions is a single compiled
program rather than a Python loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.envs.core import make
from omnisafe_tpu.envs.wrappers import ActionScale, AutoReset, TimeLimit, Vectorize

Array = jax.Array


class OfflineDataCollector:
    """Collects transitions into an npz dataset."""

    def __init__(self, env_id: str, num_envs: int = 8) -> None:
        env = make(env_id)
        stack = env
        if env.need_time_limit_wrapper:
            stack = TimeLimit(stack, env.max_episode_steps)
        if env.need_auto_reset_wrapper:
            stack = AutoReset(stack)
        stack = Vectorize(stack, num_envs)
        stack = ActionScale(stack, -1.0, 1.0)
        self._env = stack
        self._num_envs = num_envs
        self._act_dim = env.action_space.shape[0]

    def collect(
        self,
        size: int,
        save_path: str,
        policy: Optional[Callable[[Array, Array], Array]] = None,
        seed: int = 0,
    ) -> str:
        """Roll ``size`` transitions and save them to ``save_path``.

        ``policy(obs, key) -> action in [-1, 1]``; defaults to uniform random.
        """
        steps = -(-size // self._num_envs)
        key = jax.random.key(seed)
        key, reset_key = jax.random.split(key)
        env_state, obs = self._env.reset(reset_key)

        if policy is None:
            def policy(obs, key):  # noqa: ANN001
                return jax.random.uniform(
                    key, (obs.shape[0], self._act_dim), minval=-1.0, maxval=1.0
                )

        @jax.jit
        def roll(env_state, obs, key):
            def body(carry, _):
                env_state, obs, rng = carry
                rng, a_key, s_key = jax.random.split(rng, 3)
                act = policy(obs, a_key)
                env_state, ts = self._env.step(env_state, act, s_key)
                real_next = jnp.where(ts.done[:, None], ts.final_obs, ts.obs)
                rec = (obs, act, ts.reward, ts.cost, real_next,
                       ts.done.astype(jnp.float32))
                return (env_state, ts.obs, rng), rec

            (_, _, _), recs = jax.lax.scan(body, (env_state, obs, key), None, length=steps)
            return recs

        obs_r, act_r, rew_r, cost_r, next_r, done_r = jax.device_get(roll(env_state, obs, key))
        flat = lambda x: np.asarray(x).reshape((-1,) + x.shape[2:])[:size]
        if not save_path.endswith('.npz'):
            save_path = f'{save_path}.npz'
        np.savez(
            save_path,
            obs=flat(obs_r),
            action=flat(act_r),
            reward=flat(rew_r),
            cost=flat(cost_r),
            next_obs=flat(next_r),
            done=flat(done_r),
        )
        return save_path


__all__ = ['OfflineDataCollector']
