"""SafeMetaDrive driving backend (optional dependency).

Counterpart of the reference's ``SafetyMetaDriveEnv`` (reference:
omnisafe/envs/meta_drive_env.py:67-69): the ``SafeMetaDrive`` id wraps the
MetaDrive simulator with reward = driving reward and cost = crash/out-of-road
events.  MetaDrive is a host-side, non-jittable simulator, so — like the
real-MuJoCo backends — the device program reaches it through
``jax.experimental.io_callback`` inside the jitted rollout scan.

The ``metadrive`` package is an optional third-party dependency (absent from
this image).  When it is importable the env registers normally; otherwise the
id is recorded as *unavailable* so ``make('SafeMetaDrive')`` raises a message
naming the missing package instead of an unknown-id error — the same
degrade-gracefully behavior as the reference's optional import.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register, register_unavailable
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

_IDS = ['SafeMetaDrive']

try:  # pragma: no cover - exercised only when metadrive is installed
    import metadrive  # noqa: F401
    from metadrive.envs import SafeMetaDriveEnv as _SafeMetaDriveEnv

    _HAVE_METADRIVE = True
except ImportError:  # pragma: no cover
    _HAVE_METADRIVE = False


class SafetyMetaDriveEnv(CMDP):
    """Host-callback wrapper over MetaDrive's SafeMetaDriveEnv."""

    _support_envs = list(_IDS)
    need_time_limit_wrapper = False
    need_auto_reset_wrapper = False
    is_vectorized = True

    def __init__(self, env_id: str, num_envs: int = 1, **kwargs: Any) -> None:
        super().__init__(env_id, **kwargs)
        self._num_envs = num_envs
        cfg = {'use_render': False, 'log_level': 50}
        cfg.update(kwargs.get('env_cfgs', {}))
        self._envs = [_SafeMetaDriveEnv(dict(cfg)) for _ in range(num_envs)]
        self._obs_dim = int(np.prod(self._envs[0].observation_space.shape))
        self._act_dim = int(np.prod(self._envs[0].action_space.shape))

    @property
    def num_envs(self) -> int:
        return self._num_envs

    @property
    def observation_space(self) -> Box:
        return Box.create(-jnp.inf, jnp.inf, (self._obs_dim,))

    @property
    def action_space(self) -> Box:
        return Box.create(-1.0, 1.0, (self._act_dim,))

    @property
    def max_episode_steps(self) -> int:
        return 1000

    def _host_reset(self, seeds: np.ndarray) -> np.ndarray:
        obs = [
            np.asarray(env.reset(seed=int(s))[0], np.float32).reshape(-1)
            for env, s in zip(self._envs, seeds)
        ]
        return np.stack(obs)

    def _host_step(self, actions: np.ndarray):
        b = self._num_envs
        obs = np.empty((b, self._obs_dim), np.float32)
        final_obs = np.empty((b, self._obs_dim), np.float32)
        reward = np.empty(b, np.float32)
        cost = np.empty(b, np.float32)
        term = np.empty(b, np.bool_)
        trunc = np.empty(b, np.bool_)
        for i, env in enumerate(self._envs):
            o, r, te, tr, info = env.step(np.asarray(actions[i], np.float64))
            o = np.asarray(o, np.float32).reshape(-1)
            reward[i] = r
            cost[i] = float(info.get('cost', 0.0))
            term[i] = te
            trunc[i] = tr
            final_obs[i] = o
            if te or tr:
                o = np.asarray(env.reset()[0], np.float32).reshape(-1)
            obs[i] = o
        return obs, reward, cost, term, trunc, final_obs

    def reset(self, key: Array):
        from jax.experimental import io_callback

        seeds = jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1)
        obs = io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self._num_envs, self._obs_dim), jnp.float32),
            seeds,
            ordered=True,
        )
        return jnp.zeros(()), obs

    def step(self, state: Array, action: Array, key: Array) -> Tuple[Array, TimeStep]:
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


if _HAVE_METADRIVE:  # pragma: no cover
    env_register(SafetyMetaDriveEnv)
else:
    register_unavailable(_IDS, "requires the optional 'metadrive' package (pip install metadrive-simulator)")

__all__ = ['SafetyMetaDriveEnv']
