"""Host-driven rollout for host-backed (non-jittable) environments.

The device-side rollout (``OnPolicyAdapter.rollout``) scans env steps inside
one XLA program and reaches host physics through ``io_callback``.  That is
the right shape for pure-JAX envs, but for host MuJoCo the callback executes
inside XLA's run loop where (measured on this image) ``mj_step`` runs ~4-7x
slower than standalone — the callback thread contends with XLA's worker pool.

This runner inverts control for those envs, mirroring the reference's own
collection loop (reference: omnisafe/adapter/onpolicy_adapter.py:58-136): the
host Python loop owns physics directly, and everything device-worthy per step
— normalizer-state updates, the policy forward, action unscaling, episode
accounting — is fused into ONE small jitted program per step.  The epoch's
batch assembly (advantage scans) and the SGD sweep remain the same big jitted
programs as the pure-JAX path, so only the collection loop differs.

Wrapper semantics are preserved exactly by *grafting*: the host env at the
bottom of the wrapper stack is swapped for a ``_RelayEnv`` whose functional
``step`` simply emits the raw :class:`TimeStep` stored in its state.  Each
iteration the runner injects the real host timestep into the state pytree and
runs the *unmodified* wrapper stack over it, so ObsNormalize / Saute / etc.
behave identically to the device path.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from omnisafe_tpu.adapter.onpolicy import EpisodeMetrics, RolloutCarry
from omnisafe_tpu.common.buffer.advantages import Trajectory
from omnisafe_tpu.envs.core import CMDP, TimeStep, Wrapper
from omnisafe_tpu.envs.spaces import Box
from omnisafe_tpu.envs.wrappers import ActionScale

Array = jax.Array


class _RelayEnv(CMDP):
    """Stand-in for a host env inside a functional wrapper stack.

    Its state IS a raw :class:`TimeStep`; ``step`` returns it unchanged, so
    the wrappers above transform whatever the host injected.  ``reset``
    emits ``_reset_obs`` (set by the runner right after the real host reset).
    """

    need_time_limit_wrapper = False
    need_auto_reset_wrapper = False
    is_vectorized = True

    def __init__(self, base: CMDP) -> None:  # pylint: disable=super-init-not-called
        self._env_id = base.env_id
        self._obs_space = base.observation_space
        self._act_space = base.action_space
        self._num_envs = base.num_envs
        self._reset_obs: Optional[Array] = None

    @property
    def observation_space(self) -> Box:
        return self._obs_space

    @property
    def action_space(self) -> Box:
        return self._act_space

    @property
    def num_envs(self) -> int:
        return self._num_envs

    def reset(self, key: Array):
        del key
        obs = self._reset_obs
        assert obs is not None, 'host reset must run before stack reset'
        placeholder = TimeStep(
            obs=obs,
            reward=jnp.zeros(obs.shape[:1]),
            cost=jnp.zeros(obs.shape[:1]),
            terminated=jnp.zeros(obs.shape[:1], bool),
            truncated=jnp.zeros(obs.shape[:1], bool),
            final_obs=obs,
        )
        return placeholder, obs

    def step(self, state: TimeStep, action: Array, key: Array):
        del action, key
        return state, state


def _graft(state: Any, raw_ts: TimeStep) -> Any:
    """Replace the innermost (relay) leaf of a wrapper-state pytree."""
    if isinstance(state, TimeStep):
        return raw_ts
    if hasattr(state, 'env'):
        return state.replace(env=_graft(state.env, raw_ts))
    raise TypeError(f'unexpected wrapper state {type(state).__name__}')


def find_host_base(env: CMDP) -> Optional[CMDP]:
    """Return the innermost env if it is host-backed, else None."""
    node = env
    while isinstance(node, Wrapper):
        node = node._env  # pylint: disable=protected-access
    return node if getattr(node, 'host_backed', False) else None


@struct.dataclass
class _Pending:
    """Action issued on the current obs, not yet executed by the host."""

    act: Array
    logp: Array
    value_r: Array
    value_c: Array


class HostRolloutRunner:
    """Drop-in replacement for ``OnPolicyAdapter.rollout`` on host envs."""

    def __init__(self, env_stack: CMDP, actor_critic: Any) -> None:
        self._stack = env_stack
        self._ac = actor_critic

        # locate the base host env and splice the relay in its place
        chain: List[CMDP] = [env_stack]
        node = env_stack
        while isinstance(node, Wrapper):
            node = node._env  # pylint: disable=protected-access
            chain.append(node)
        base = chain[-1]
        assert getattr(base, 'host_backed', False), f'{type(base).__name__} is not host-backed'
        self._base = base
        self._relay = _RelayEnv(base)
        if len(chain) >= 2:
            chain[-2]._env = self._relay  # pylint: disable=protected-access
        else:
            self._stack = self._relay

        scale_wrapper = next((w for w in chain if isinstance(w, ActionScale)), None)
        if scale_wrapper is not None:
            scale = scale_wrapper._scale  # pylint: disable=protected-access
            offset = scale_wrapper._offset  # pylint: disable=protected-access
            self._to_native = lambda a: offset + scale * a
        else:
            self._to_native = lambda a: a

        self._num_envs = base.num_envs
        self._first_fn = jax.jit(self._first)
        self._mid_fn = jax.jit(self._mid)
        self._last_fn = jax.jit(self._last)

    # ---------------------------------------------------------------- jitted
    def _act(self, params: Any, obs: Array, rng: Array):
        rng, act_key = jax.random.split(rng)
        act, value_r, value_c, logp = self._ac.step(params, obs, act_key)
        return _Pending(act=act, logp=logp, value_r=value_r, value_c=value_c), \
            self._to_native(act), rng

    def _first(self, carry: RolloutCarry, params: Any, rng: Array):
        pending, native, rng = self._act(params, carry.obs, rng)
        return pending, native, rng

    def _ingest(self, carry: RolloutCarry, pending: _Pending, raw_ts: TimeStep, key: Array):
        """Process the host timestep through the wrapper stack and finish the
        record for the action in ``pending`` (mirrors the device scan body,
        adapter/onpolicy.py:154-178)."""
        ws = _graft(carry.env_state, raw_ts)
        new_ws, ts = self._stack.step(ws, pending.act, key)
        raw_r = ts.info.get('original_reward', ts.reward)
        raw_c = ts.info.get('original_cost', ts.cost)
        ep_ret = carry.ep_ret + raw_r
        ep_cost = carry.ep_cost + raw_c
        ep_len = carry.ep_len + 1.0
        done = ts.done
        record = (
            carry.obs, pending.act, pending.logp, ts.reward, ts.cost,
            pending.value_r, pending.value_c, ts.terminated, ts.truncated,
            ts.final_obs, done, ep_ret, ep_cost, ep_len,
        )
        not_done = 1.0 - done.astype(jnp.float32)
        new_carry = RolloutCarry(
            env_state=new_ws,
            obs=ts.obs,
            ep_ret=ep_ret * not_done,
            ep_cost=ep_cost * not_done,
            ep_len=ep_len * not_done,
        )
        return new_carry, record

    def _mid(self, carry: RolloutCarry, pending: _Pending, raw_ts: TimeStep,
             params: Any, rng: Array):
        rng, step_key = jax.random.split(rng)
        new_carry, record = self._ingest(carry, pending, raw_ts, step_key)
        next_pending, native, rng = self._act(params, new_carry.obs, rng)
        return new_carry, record, next_pending, native, rng

    def _last(self, carry: RolloutCarry, pending: _Pending, raw_ts: TimeStep, rng: Array):
        rng, step_key = jax.random.split(rng)
        new_carry, record = self._ingest(carry, pending, raw_ts, step_key)
        return new_carry, record, rng

    # ------------------------------------------------------------------ host
    def _wrap_raw(self, host_out) -> TimeStep:
        obs, reward, cost, term, trunc, final_obs = host_out
        return TimeStep(
            obs=jnp.asarray(obs), reward=jnp.asarray(reward), cost=jnp.asarray(cost),
            terminated=jnp.asarray(term), truncated=jnp.asarray(trunc),
            final_obs=jnp.asarray(final_obs),
        )

    def reset(self, key: Array) -> RolloutCarry:
        seeds = np.asarray(
            jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1)
        )
        raw_obs = self._base.host_reset_direct(seeds)
        self._relay._reset_obs = jnp.asarray(raw_obs)  # pylint: disable=protected-access
        env_state, obs = self._stack.reset(key)
        zeros = jnp.zeros((self._num_envs,))
        return RolloutCarry(env_state=env_state, obs=obs, ep_ret=zeros,
                            ep_cost=zeros, ep_len=zeros)

    def rollout(
        self,
        carry: RolloutCarry,
        params: Any,
        actor_critic: Any,
        key: Array,
        steps_per_env: int,
    ) -> Tuple[RolloutCarry, Trajectory, Array, Array, EpisodeMetrics]:
        """Same contract as ``OnPolicyAdapter.rollout``."""
        del actor_critic  # bound at construction
        host_step = self._base.host_step_direct
        pending, native, rng = self._first_fn(carry, params, key)
        records = []
        for t in range(steps_per_env):
            raw = self._wrap_raw(host_step(np.asarray(native)))
            if t + 1 < steps_per_env:
                carry, record, pending, native, rng = self._mid_fn(
                    carry, pending, raw, params, rng
                )
            else:
                carry, record, rng = self._last_fn(carry, pending, raw, rng)
            records.append(record)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *records)
        (obs, act, logp, reward, cost, value_r, value_c,
         terminated, truncated, final_obs, done, ep_ret, ep_cost, ep_len) = stacked

        tb = final_obs.shape[0] * final_obs.shape[1]
        fv_r, fv_c = self._ac.value(params, final_obs.reshape(tb, -1))
        last_value_r, last_value_c = self._ac.value(params, carry.obs)

        traj = Trajectory(
            obs=obs, act=act, logp=logp, reward=reward, cost=cost,
            value_r=value_r, value_c=value_c,
            terminated=terminated, truncated=truncated,
            final_value_r=fv_r.reshape(final_obs.shape[:2]),
            final_value_c=fv_c.reshape(final_obs.shape[:2]),
        )
        metrics = EpisodeMetrics(done=done, ep_ret=ep_ret, ep_cost=ep_cost, ep_len=ep_len)
        return carry, traj, last_value_r, last_value_c, metrics


__all__ = ['HostRolloutRunner', 'find_host_base']
