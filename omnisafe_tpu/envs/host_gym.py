"""Plain Gymnasium MuJoCo environments via host callbacks.

Counterpart of the reference's ``MujocoEnv`` (reference:
omnisafe/envs/mujoco_env.py:42-186): the unconstrained Gymnasium locomotion
tasks with the safe-RL cost channel defined as ``cost = terminated`` — an
episode-ending fall is the unsafe event (reference: mujoco_env.py:129).
Used by the CRABS family for barrier-certificate training on real physics.

Like :mod:`omnisafe_tpu.envs.host_mujoco`, the device program reaches the
host simulator through ``jax.experimental.io_callback`` inside the jitted
rollout scan, so the algorithm layer stays a single compiled program.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

_GYM_IDS = ('Ant-v4', 'Hopper-v4', 'Walker2d-v4', 'Humanoid-v4', 'Swimmer-v4',
            'HalfCheetah-v4')


@env_register
class HostGymMujocoEnv(CMDP):
    """Gymnasium MuJoCo tasks with cost = terminated (unsafe fall)."""

    _support_envs = list(_GYM_IDS)
    need_time_limit_wrapper = False   # gymnasium's TimeLimit handles this
    need_auto_reset_wrapper = False   # auto-reset happens host-side
    is_vectorized = True
    host_backed = True                # eligible for the host-driven rollout

    def __init__(self, env_id: str, num_envs: int = 1, **kwargs: Any) -> None:
        super().__init__(env_id, **kwargs)
        import gymnasium  # pylint: disable=import-outside-toplevel

        self._num_envs = num_envs
        self._envs = [gymnasium.make(env_id) for _ in range(num_envs)]
        self._obs_dim = int(self._envs[0].observation_space.shape[0])
        self._act_space = self._envs[0].action_space

    @property
    def num_envs(self) -> int:
        return self._num_envs

    @property
    def observation_space(self) -> Box:
        return Box.create(-jnp.inf, jnp.inf, (self._obs_dim,))

    @property
    def action_space(self) -> Box:
        return Box.create(
            np.asarray(self._act_space.low, np.float32),
            np.asarray(self._act_space.high, np.float32),
        )

    @property
    def max_episode_steps(self) -> int:
        return 1000

    # ------------------------------------------------------ host callbacks
    def _host_reset(self, seeds: np.ndarray) -> np.ndarray:
        obs = [env.reset(seed=int(s))[0] for env, s in zip(self._envs, seeds)]
        return np.stack(obs).astype(np.float32)

    def _host_step(self, actions: np.ndarray):
        b = self._num_envs
        obs = np.empty((b, self._obs_dim), np.float32)
        final_obs = np.empty((b, self._obs_dim), np.float32)
        reward = np.empty(b, np.float32)
        cost = np.empty(b, np.float32)
        term = np.empty(b, np.bool_)
        trunc = np.empty(b, np.bool_)
        for i, env in enumerate(self._envs):
            o, r, te, tr, _ = env.step(np.asarray(actions[i], np.float64))
            reward[i] = r
            cost[i] = float(te)
            term[i] = te
            trunc[i] = tr
            final_obs[i] = o
            if te or tr:
                o, _ = env.reset()
            obs[i] = o
        return obs, reward, cost, term, trunc, final_obs

    # direct entry points for the host-driven rollout (adapter/host_loop.py)
    host_reset_direct = _host_reset
    host_step_direct = _host_step

    # ------------------------------------------------------- CMDP interface
    def reset(self, key: Array):
        seeds = jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1)
        obs = io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self._num_envs, self._obs_dim), jnp.float32),
            seeds,
            ordered=True,
        )
        return jnp.zeros(()), obs

    def step(self, state: Array, action: Array, key: Array) -> Tuple[Array, TimeStep]:
        del key
        b, d = self._num_envs, self._obs_dim
        out_shapes = (
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.bool_),
            jax.ShapeDtypeStruct((b,), jnp.bool_),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        )
        obs, reward, cost, term, trunc, final_obs = io_callback(
            self._host_step, out_shapes, action, ordered=True
        )
        ts = TimeStep(
            obs=obs, reward=reward, cost=cost, terminated=term, truncated=trunc,
            final_obs=final_obs,
        )
        return state + 1.0, ts


__all__ = ['HostGymMujocoEnv']
