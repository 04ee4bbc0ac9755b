"""Minimal safety_gymnasium stand-in for running the REFERENCE implementation
on this image (which has gymnasium+mujoco but not safety_gymnasium).

Purpose: side-by-side λ/Jc trajectory comparison (round-5 VERDICT item 1).
Provides exactly what omnisafe/envs/safety_gymnasium_env.py touches for the
1-env velocity tasks: ``make(id=..., autoreset=False)`` returning an env with
the safety-gymnasium 6-tuple step API (obs, reward, cost, terminated,
truncated, info), gymnasium Box spaces, ``spec.max_episode_steps`` and
``metadata``.  Cost = 1[x_velocity > threshold] with the same thresholds the
repo's host envs use (omnisafe_tpu/envs/host_mujoco.py _SPECS), on the same
stock Gymnasium MuJoCo v4 physics safety_gymnasium's velocity tasks subclass.

Only the velocity tasks are provided; anything else raises.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any

import numpy as np

_SPECS = {
    'SafetyAntVelocity-v1': ('Ant-v4', 2.6222, True),
    'SafetyHalfCheetahVelocity-v1': ('HalfCheetah-v4', 3.2096, False),
    'SafetyHopperVelocity-v1': ('Hopper-v4', 0.7402, False),
    'SafetyWalker2dVelocity-v1': ('Walker2d-v4', 2.3415, False),
    'SafetySwimmerVelocity-v1': ('Swimmer-v4', 0.24455, False),
    'SafetyHumanoidVelocity-v1': ('Humanoid-v4', 1.4149, False),
}


def register(*args: Any, **kwargs: Any) -> None:  # envs_from_crabs import hook
    """No-op (the CRABS classic-control ids are not used in this experiment)."""


class _VelocityCostEnv:
    """Stock MuJoCo env + velocity-threshold cost channel, safety-gymnasium
    step signature."""

    def __init__(self, env_id: str, **kwargs: Any) -> None:
        import gymnasium

        gym_id, self._limit, self._planar = _SPECS[env_id]
        kwargs.pop('autoreset', None)
        # the raw (un-TimeLimit-ed) env: omnisafe adds its own TimeLimit
        # wrapper when need_time_limit_wrapper is True
        self._env = gymnasium.make(
            gym_id, disable_env_checker=True, **kwargs
        ).unwrapped
        self.spec = SimpleNamespace(id=env_id, max_episode_steps=1000)
        self.metadata = dict(getattr(self._env, 'metadata', {}))
        self.action_space = self._env.action_space
        self.observation_space = self._env.observation_space

    def reset(self, seed=None, options=None):
        return self._env.reset(seed=seed, options=options)

    def step(self, action):
        obs, reward, terminated, truncated, info = self._env.step(action)
        if self._planar:
            vel = float(np.hypot(info.get('x_velocity', 0.0),
                                 info.get('y_velocity', 0.0)))
        else:
            vel = float(info.get('x_velocity', 0.0))
        cost = float(vel > self._limit)
        return obs, reward, cost, terminated, truncated, info

    def render(self):
        return self._env.render()

    def close(self) -> None:
        self._env.close()


def make(id: str, **kwargs: Any):  # pylint: disable=redefined-builtin
    if id not in _SPECS:
        raise NotImplementedError(f'shim only provides velocity tasks, not {id}')
    return _VelocityCostEnv(id, **kwargs)


vector = SimpleNamespace(
    make=lambda **kw: (_ for _ in ()).throw(
        NotImplementedError('shim is single-env only')
    )
)
