"""Pure-JAX velocity-constrained locomotion tasks.

TPU-native stand-ins for the Safety-Gymnasium ``Safety*Velocity-v1`` suite the
reference supports (reference: omnisafe/envs/safety_gymnasium_env.py:55-125,
velocity ids at :119-125).  The MuJoCo articulated-body physics is replaced by
an analytic planar "crawler": joint angles respond to torques with
damping/stiffness, and forward speed integrates a thrust produced by torque
projected through joint posture minus drag.  The safe-RL structure matches the
original exactly — ``reward = forward velocity + alive bonus - ctrl cost`` and
``cost = 1[v > velocity_limit]`` — so unconstrained learners saturate the cost
channel (~1 per step, cf. the reference's ~950/1e3 episode costs) while
Lagrangian learners must ride just below the limit.  Returns are not
numerically comparable to MuJoCo, but the constrained-optimization geometry
is faithful.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

_DT = 0.05

# robot -> (n_joints, thrust gain, drag, ctrl cost coef)
_ROBOTS = {
    'Ant': (8, 6.0, 1.0, 0.5e-2),
    'HalfCheetah': (6, 8.0, 1.0, 0.1e-2),
    'Hopper': (3, 3.0, 1.0, 0.1e-2),
    'Walker2d': (6, 5.0, 1.0, 0.1e-2),
    'Swimmer': (2, 1.0, 1.0, 1e-4),
    'Humanoid': (17, 4.0, 1.0, 0.5e-2),
}


@struct.dataclass
class VelocityState:
    q: Array    # joint angles
    qd: Array   # joint velocities
    vx: Array   # forward body velocity
    key: Array


@env_register
class SafetyVelocityEnv(CMDP):
    """Velocity-limited locomotion surrogate (cost channel = speed limit)."""

    _support_envs = [f'Safety{r}Velocity-v1' for r in _ROBOTS]
    need_time_limit_wrapper = True
    need_auto_reset_wrapper = True

    def __init__(self, env_id: str, **kwargs) -> None:
        super().__init__(env_id, **kwargs)
        robot = env_id[len('Safety'):-len('Velocity-v1')]
        self._n, self._gain, self._drag, self._ctrl_coef = _ROBOTS[robot]
        # joints servo toward the commanded angle, and thrust = E[a cos q]
        # peaks at ~0.56*gain near a~=0.86; the cost threshold sits at ~45% of
        # that top speed, mirroring how Safety-Gymnasium calibrates its
        # velocity limits at ~50% of the unconstrained agent's speed.
        self._v_limit = 0.25 * self._gain / self._drag

    @property
    def velocity_limit(self) -> float:
        return self._v_limit

    @property
    def observation_space(self) -> Box:
        return Box.create(-jnp.inf, jnp.inf, (2 * self._n + 1,))

    @property
    def action_space(self) -> Box:
        return Box.create(-1.0, 1.0, (self._n,))

    @property
    def max_episode_steps(self) -> int:
        return 1000

    def _obs(self, state: VelocityState) -> Array:
        return jnp.concatenate([state.q, state.qd, state.vx[None]])

    def reset(self, key: Array):
        q_key, qd_key, state_key = jax.random.split(key, 3)
        state = VelocityState(
            q=jax.random.uniform(q_key, (self._n,), minval=-0.1, maxval=0.1),
            qd=jax.random.uniform(qd_key, (self._n,), minval=-0.1, maxval=0.1),
            vx=jnp.zeros(()),
            key=state_key,
        )
        return state, self._obs(state)

    def step(self, state: VelocityState, action: Array, key: Array) -> Tuple[VelocityState, TimeStep]:
        del key
        action = jnp.clip(action, -1.0, 1.0)
        # position-servo joint dynamics: q tracks the commanded angle
        qd = state.qd + _DT * (4.0 * (action - state.q) - 2.0 * state.qd)
        q = jnp.clip(state.q + _DT * qd, -jnp.pi / 2, jnp.pi / 2)
        # thrust is command projected through posture (a*cos q): pushing
        # harder folds the joints and yields diminishing returns, so top
        # speed requires modulation, not saturation.
        thrust = jnp.mean(action * jnp.cos(q))
        vx = state.vx + _DT * (self._gain * thrust - self._drag * state.vx)

        reward = vx + 1.0 - self._ctrl_coef * jnp.sum(jnp.square(action))
        cost = (vx > self._v_limit).astype(jnp.float32)

        new_state = VelocityState(q=q, qd=qd, vx=vx, key=state.key)
        obs = self._obs(new_state)
        ts = TimeStep(
            obs=obs,
            reward=reward,
            cost=cost,
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
            final_obs=obs,
        )
        return new_state, ts


__all__ = ['SafetyVelocityEnv']
