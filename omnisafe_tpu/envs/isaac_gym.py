"""Safety Isaac Gym ShadowHand backend (optional dependency).

Counterpart of the reference's ``SafetyIsaacGymEnv`` (reference:
omnisafe/envs/safety_isaac_gym_env.py:55-60, utils/isaac_gym_utils.py:42-104):
four GPU-vectorized ShadowHand manipulation tasks with finger/joint safety
constraints.  Isaac Gym is a CUDA-only simulator that cannot run in this
image (and has no TPU build), so the ids are recorded as *unavailable* unless
the ``isaacgym``/``safety_gymnasium`` task suite is importable; ``make``
then raises a message naming the missing dependency instead of an unknown-id
error, mirroring the reference's optional-import behavior.

When available, the env follows the same host-callback pattern as the other
non-jittable backends: Isaac Gym already steps thousands of envs in one
batched call, which maps directly onto one ``io_callback`` per scan step.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register, register_unavailable
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

_IDS = [
    'ShadowHandCatchOver2UnderarmSafeFinger',
    'ShadowHandOverSafeFinger',
    'ShadowHandCatchOver2UnderarmSafeJoint',
    'ShadowHandOverSafeJoint',
]

try:  # pragma: no cover - isaacgym is CUDA-only, absent from this image
    from safety_gymnasium.tasks.safe_isaac_gym import make_isaac_gym_env  # noqa: F401

    _HAVE_ISAAC = True
except ImportError:  # pragma: no cover
    _HAVE_ISAAC = False


class SafetyIsaacGymEnv(CMDP):
    """Host-callback wrapper over the batched Isaac Gym ShadowHand tasks."""

    _support_envs = list(_IDS)
    need_time_limit_wrapper = False
    need_auto_reset_wrapper = False
    is_vectorized = True

    def __init__(self, env_id: str, num_envs: int = 1, **kwargs: Any) -> None:  # pragma: no cover
        super().__init__(env_id, **kwargs)
        self._num_envs = num_envs
        self._env = make_isaac_gym_env(env_id, num_envs=num_envs)
        self._obs_dim = int(np.prod(self._env.observation_space.shape))
        self._act_dim = int(np.prod(self._env.action_space.shape))

    @property
    def num_envs(self) -> int:  # pragma: no cover
        return self._num_envs

    @property
    def observation_space(self) -> Box:  # pragma: no cover
        return Box.create(-jnp.inf, jnp.inf, (self._obs_dim,))

    @property
    def action_space(self) -> Box:  # pragma: no cover
        return Box.create(-1.0, 1.0, (self._act_dim,))

    @property
    def max_episode_steps(self) -> int:  # pragma: no cover
        return 1000

    def _host_reset(self, seeds: np.ndarray) -> np.ndarray:  # pragma: no cover
        obs, _ = self._env.reset(seed=int(seeds[0]))
        return np.asarray(obs, np.float32).reshape(self._num_envs, self._obs_dim)

    def _host_step(self, actions: np.ndarray):  # pragma: no cover
        obs, reward, cost, term, trunc, _ = self._env.step(actions)
        to = lambda x, dt: np.asarray(x, dt).reshape(self._num_envs, -1).squeeze(-1)
        obs = np.asarray(obs, np.float32).reshape(self._num_envs, self._obs_dim)
        return (
            obs,
            to(reward, np.float32),
            to(cost, np.float32),
            to(term, np.bool_),
            to(trunc, np.bool_),
            obs,
        )

    def reset(self, key: Array):  # pragma: no cover
        from jax.experimental import io_callback

        seeds = jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1)
        obs = io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self._num_envs, self._obs_dim), jnp.float32),
            seeds,
            ordered=True,
        )
        return jnp.zeros(()), obs

    def step(self, state: Array, action: Array, key: Array) -> Tuple[Array, TimeStep]:  # pragma: no cover
        from jax.experimental import io_callback

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


if _HAVE_ISAAC:  # pragma: no cover
    env_register(SafetyIsaacGymEnv)
else:
    register_unavailable(
        _IDS, "requires the optional CUDA-only 'isaacgym' + safe_isaac_gym task suite"
    )

__all__ = ['SafetyIsaacGymEnv']
