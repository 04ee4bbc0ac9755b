"""Functional environment wrappers.

Counterparts of the reference's wrapper stack (reference:
omnisafe/envs/wrapper.py:29-652), re-designed as pure state-threading
combinators:

* ``TimeLimit`` / ``AutoReset`` operate on a *single* env and are meant to sit
  under :class:`Vectorize`, which ``vmap``s the whole inner stack over the env
  batch axis — the compiler-visible replacement for the reference's
  ``safety_gymnasium.vector.make`` subprocess vectorization.
* ``ObsNormalize`` / ``RewardNormalize`` / ``CostNormalize`` sit *above*
  ``Vectorize`` so a single set of running statistics is shared by all envs,
  matching the reference's vector-env normalizer placement
  (reference: omnisafe/adapter/online_adapter.py:120-140).
* ``ActionScale`` rescales the action space to ``[-1, 1]``
  (reference: omnisafe/envs/wrapper.py:426-514).

The reference's ``Unsqueeze`` wrapper is unnecessary: batching is an explicit
vmapped axis here, never a singleton dim bolted on at the edge.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.common.normalizer import RunningStats
from omnisafe_tpu.envs.core import CMDP, TimeStep, Wrapper
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array


def _select(done: Array, a, b):
    """Per-leaf ``where(done, a, b)`` over two matching pytrees."""
    return jax.tree.map(lambda x, y: jnp.where(done, x, y), a, b)


@struct.dataclass
class TimeLimitState:
    env: Any
    elapsed: Array


class TimeLimit(Wrapper):
    """Truncate episodes after ``time_limit`` steps
    (reference: omnisafe/envs/wrapper.py:29-112)."""

    def __init__(self, env: CMDP, time_limit: int) -> None:
        super().__init__(env)
        self._time_limit = time_limit

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        return TimeLimitState(env=state, elapsed=jnp.zeros((), jnp.int32)), obs

    def step(self, state: TimeLimitState, action: Array, key: Array):
        inner, ts = self._env.step(state.env, action, key)
        elapsed = state.elapsed + 1
        truncated = jnp.logical_or(ts.truncated, elapsed >= self._time_limit)
        return (
            TimeLimitState(env=inner, elapsed=elapsed),
            ts.replace(truncated=truncated),
        )


@struct.dataclass
class AutoResetState:
    env: Any


class AutoReset(Wrapper):
    """Reset the env in the same step an episode ends.

    The pre-reset observation is preserved in ``TimeStep.final_obs`` — the
    functional version of the reference's ``info['final_observation']``
    convention (reference: omnisafe/envs/wrapper.py:115-176).  A fresh reset
    state is computed every step and selected elementwise on ``done``; under
    ``vmap``+``lax.scan`` this is branch-free and cheap for pure-JAX envs.
    """

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        return AutoResetState(env=state), obs

    def step(self, state: AutoResetState, action: Array, key: Array):
        step_key, reset_key = jax.random.split(key)
        inner, ts = self._env.step(state.env, action, step_key)
        done = ts.done
        reset_state, reset_obs = self._env.reset(reset_key)
        new_inner = _select(done, reset_state, inner)
        new_obs = jnp.where(done, reset_obs, ts.obs)
        return (
            AutoResetState(env=new_inner),
            ts.replace(obs=new_obs, final_obs=ts.obs),
        )


class Vectorize(Wrapper):
    """vmap the wrapped (single-env) stack over a leading env-batch axis.

    Replaces the reference's process/thread vector envs
    (reference: omnisafe/envs/safety_gymnasium_env.py:139) with an XLA batch
    dimension, so one policy forward and one env step serve all envs.
    """

    def __init__(self, env: CMDP, num_envs: int) -> None:
        super().__init__(env)
        self._num_envs = num_envs
        self._vreset = jax.vmap(env.reset)
        self._vstep = jax.vmap(env.step)

    @property
    def num_envs(self) -> int:
        return self._num_envs

    is_vectorized = True

    def reset(self, key: Array):
        keys = jax.random.split(key, self._num_envs)
        return self._vreset(keys)

    def step(self, state, action: Array, key: Array):
        # derive the local batch size from the action so the same wrapper
        # serves both the full batch (single device) and a per-device shard
        # inside shard_map
        keys = jax.random.split(key, action.shape[0])
        return self._vstep(state, action, keys)


@struct.dataclass
class NormalizeState:
    env: Any
    stats: RunningStats


class ObsNormalize(Wrapper):
    """Normalize observations with shared running statistics, clamped at
    +-clip like the reference's Normalizer
    (reference: omnisafe/envs/wrapper.py:179-277, clip=5 at :202)."""

    def __init__(self, env: CMDP, clip: float = 5.0) -> None:
        super().__init__(env)
        self._clip = clip

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        stats = RunningStats.create(self.observation_space.shape)
        stats = stats.update(obs)
        return NormalizeState(env=state, stats=stats), stats.normalize(obs, clip=self._clip)

    def step(self, state: NormalizeState, action: Array, key: Array):
        inner, ts = self._env.step(state.env, action, key)
        stats = state.stats.update(ts.obs)
        return (
            NormalizeState(env=inner, stats=stats),
            ts.replace(obs=stats.normalize(ts.obs, clip=self._clip),
                       final_obs=stats.normalize(ts.final_obs, clip=self._clip)),
        )


class RewardNormalize(Wrapper):
    """Normalize rewards with running statistics, clamped at +-clip; the raw
    reward is kept in ``TimeStep.info['original_reward']`` for episode
    metrics (reference: omnisafe/envs/wrapper.py:280-350, clip=5 at :302)."""

    def __init__(self, env: CMDP, clip: float = 5.0) -> None:
        super().__init__(env)
        self._clip = clip

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        return NormalizeState(env=state, stats=RunningStats.create(())), obs

    def step(self, state: NormalizeState, action: Array, key: Array):
        inner, ts = self._env.step(state.env, action, key)
        stats = state.stats.update(ts.reward)
        info = dict(ts.info)
        info['original_reward'] = ts.reward
        return (
            NormalizeState(env=inner, stats=stats),
            ts.replace(reward=stats.normalize(ts.reward, clip=self._clip), info=info),
        )


class CostNormalize(Wrapper):
    """Normalize costs with running statistics, clamped at +-clip
    (reference: omnisafe/envs/wrapper.py:353-423, clip=5 at :375)."""

    def __init__(self, env: CMDP, clip: float = 5.0) -> None:
        super().__init__(env)
        self._clip = clip

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        return NormalizeState(env=state, stats=RunningStats.create(())), obs

    def step(self, state: NormalizeState, action: Array, key: Array):
        inner, ts = self._env.step(state.env, action, key)
        stats = state.stats.update(ts.cost)
        info = dict(ts.info)
        info['original_cost'] = ts.cost
        return (
            NormalizeState(env=inner, stats=stats),
            ts.replace(cost=stats.normalize(ts.cost, clip=self._clip), info=info),
        )


@struct.dataclass
class ActionRepeatState:
    env: Any


class ActionRepeat(Wrapper):
    """Repeat each action ``times`` steps, summing rewards and costs
    (reference: omnisafe/envs/wrapper.py:517-574).  Stops early within the
    repeat window on termination/truncation (remaining repeats are masked)."""

    def __init__(self, env: CMDP, times: int) -> None:
        super().__init__(env)
        self._times = times

    def reset(self, key: Array):
        state, obs = self._env.reset(key)
        return ActionRepeatState(env=state), obs

    def step(self, state: ActionRepeatState, action: Array, key: Array):
        def body(carry, rep_key):
            inner, ts_acc, alive = carry

            def do_step(_):
                new_inner, ts = self._env.step(inner, action, rep_key)
                return new_inner, ts

            def no_step(_):
                return inner, ts_acc

            new_inner, ts = jax.lax.cond(alive, do_step, no_step, None)
            live = alive.astype(jnp.float32)
            merged = ts.replace(
                reward=ts_acc.reward + ts.reward * live,
                cost=ts_acc.cost + ts.cost * live,
                terminated=jnp.where(alive, ts.terminated, ts_acc.terminated),
                truncated=jnp.where(alive, ts.truncated, ts_acc.truncated),
                obs=jnp.where(alive, ts.obs, ts_acc.obs),
                final_obs=jnp.where(alive, ts.final_obs, ts_acc.final_obs),
            )
            new_alive = jnp.logical_and(alive, jnp.logical_not(merged.done))
            return (new_inner, merged, new_alive), None

        first_key, *rep_keys = jax.random.split(key, self._times + 1)
        inner, ts0 = self._env.step(state.env, action, first_key)
        alive = jnp.logical_not(ts0.done)
        (inner, ts, _), _ = jax.lax.scan(
            body, (inner, ts0, alive), jnp.stack(rep_keys)[: self._times - 1]
        )
        return ActionRepeatState(env=inner), ts


class ActionScale(Wrapper):
    """Present a ``[-1, 1]`` action space and affinely map actions back to the
    env's native bounds (reference: omnisafe/envs/wrapper.py:426-514)."""

    def __init__(self, env: CMDP, low: float = -1.0, high: float = 1.0) -> None:
        super().__init__(env)
        self._low = low
        self._high = high
        inner = env.action_space
        self._scale = (inner.high_array - inner.low_array) / (high - low)
        self._offset = inner.low_array - low * self._scale

    @property
    def action_space(self) -> Box:
        dim = self._env.action_space.shape[0]
        return Box.create([self._low] * dim, [self._high] * dim)

    def step(self, state, action: Array, key: Array):
        native = self._offset + self._scale * action
        return self._env.step(state, native, key)


__all__ = [
    'TimeLimit',
    'AutoReset',
    'Vectorize',
    'ObsNormalize',
    'RewardNormalize',
    'CostNormalize',
    'ActionScale',
    'NormalizeState',
]
