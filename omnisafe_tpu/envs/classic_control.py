"""Pure-JAX safe classic-control environments (the CRABS task suite).

Counterparts of the reference's CRABS envs (reference:
omnisafe/envs/classic_control/envs_from_crabs.py:25-200, envs/crabs_env.py:
43-47): inverted-pendulum-on-cart tasks exposing the ``SafeEnv`` hooks the
CRABS stack needs — ``is_state_safe``, ``barrier_fn`` (interval barrier), and
``reward_fn`` over *predicted* states.  The MuJoCo cart-pole physics is
replaced with the standard analytic cart-pole ODE; thresholds, reward forms
(upright/swing/move), violation penalty, and the episode-unsafe termination
semantics follow the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

_DT = 0.02
_GRAVITY = 9.8
_CART_MASS = 1.0
_POLE_MASS = 0.1
_POLE_LEN = 0.5
_FORCE_MAG = 10.0


def interval_barrier(x: Array, lb: float, rb: float, eps: float = 1e-2) -> Array:
    """Log-barrier on an interval, normalized to hit 1 at the edges
    (reference: envs_from_crabs.py:58-67)."""
    x = (x - lb) / (rb - lb) * 2.0 - 1.0
    b = -jnp.log((1.0 + x + eps) * (1.0 - x + eps) / (1.0 + eps) ** 2)
    b_max = -jnp.log(eps * (2.0 + eps) / (1.0 + eps) ** 2)
    grad = 2.0 / eps / (2.0 + eps)
    out = grad * (jnp.abs(x) - 1.0)
    return jnp.where(jnp.logical_and(x > -1.0, x < 1.0), b / b_max, 1.0 + out)


@struct.dataclass
class PendulumState:
    state: Array        # (4,) = [x, theta, x_dot, theta_dot]
    unsafe: Array       # () bool — episode became unsafe


@env_register
class SafeInvertedPendulumEnv(CMDP):
    """Cart-pole inverted pendulum with safety thresholds."""

    _support_envs = [
        'SafeInvertedPendulum-v2',
        'SafeInvertedPendulumSwing-v2',
        'SafeInvertedPendulumMove-v2',
    ]
    need_time_limit_wrapper = True
    need_auto_reset_wrapper = True

    _TASKS = {
        'SafeInvertedPendulum-v2': ('upright', 0.2),
        'SafeInvertedPendulumSwing-v2': ('swing', 1.5),
        'SafeInvertedPendulumMove-v2': ('move', 0.2),
    }

    def __init__(self, env_id: str, violation_penalty: float = 10.0, **kwargs) -> None:
        super().__init__(env_id, **kwargs)
        self._task, self._threshold = self._TASKS[env_id]
        self._violation_penalty = violation_penalty

    @property
    def observation_space(self) -> Box:
        return Box.create(-jnp.inf, jnp.inf, (4,))

    @property
    def action_space(self) -> Box:
        return Box.create(-1.0, 1.0, (1,))

    @property
    def max_episode_steps(self) -> int:
        return 1000

    @property
    def threshold(self) -> float:
        return self._threshold

    # ------------------------------------------------------- SafeEnv hooks
    def is_state_safe(self, states: Array) -> Array:
        """(reference: envs_from_crabs.py:136-139)."""
        return self.barrier_fn(states) <= 1.0

    def barrier_fn(self, states: Array) -> Array:
        """(reference: envs_from_crabs.py:141-146)."""
        return jnp.maximum(
            interval_barrier(states[..., 1], -self._threshold, self._threshold),
            interval_barrier(states[..., 0], -0.9, 0.9),
        )

    def reward_fn(self, states: Array, actions: Array, next_states: Array) -> Array:
        """(reference: envs_from_crabs.py:147-150)."""
        del states
        return (
            -(next_states[..., 0] ** 2 + next_states[..., 1] ** 2)
            - 0.01 * actions[..., 0] ** 2
        )

    # ------------------------------------------------------------ dynamics
    def _ode(self, state: Array, force: Array) -> Array:
        x, theta, x_dot, theta_dot = state
        total_mass = _CART_MASS + _POLE_MASS
        pole_ml = _POLE_MASS * _POLE_LEN
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        temp = (force + pole_ml * theta_dot**2 * sin_t) / total_mass
        theta_acc = (_GRAVITY * sin_t - cos_t * temp) / (
            _POLE_LEN * (4.0 / 3.0 - _POLE_MASS * cos_t**2 / total_mass)
        )
        x_acc = temp - pole_ml * theta_acc * cos_t / total_mass
        return jnp.stack([
            x + _DT * x_dot,
            theta + _DT * theta_dot,
            x_dot + _DT * x_acc,
            theta_dot + _DT * theta_acc,
        ])

    def reset(self, key: Array):
        if self._task == 'swing':
            # start hanging down-ish
            noise = jax.random.uniform(key, (4,), minval=-0.01, maxval=0.01)
            state = jnp.asarray([0.0, jnp.pi, 0.0, 0.0]) + noise
        else:
            state = jax.random.uniform(key, (4,), minval=-0.01, maxval=0.01)
        env_state = PendulumState(state=state, unsafe=jnp.zeros((), bool))
        return env_state, state

    def step(self, state: PendulumState, action: Array, key: Array
             ) -> Tuple[PendulumState, TimeStep]:
        del key
        force = jnp.clip(action[0], -1.0, 1.0) * _FORCE_MAG
        next_s = self._ode(state.state, force)
        if self._task == 'upright':
            reward = -next_s[1] ** 2
        elif self._task == 'swing':
            reward = next_s[1] ** 2
        else:  # move
            reward = next_s[0] ** 2
        violated = jnp.logical_or(
            jnp.abs(next_s[1]) > self._threshold, jnp.abs(next_s[0]) > 0.9
        )
        reward = jnp.where(violated, reward - self._violation_penalty, reward)
        cost = violated.astype(jnp.float32)
        new_state = PendulumState(state=next_s, unsafe=violated)
        ts = TimeStep(
            obs=next_s,
            reward=reward,
            cost=cost,
            terminated=violated,
            truncated=jnp.zeros((), bool),
            final_obs=next_s,
        )
        return new_state, ts


__all__ = ['SafeInvertedPendulumEnv', 'interval_barrier']
