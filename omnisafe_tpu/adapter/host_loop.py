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
        # state is a scalar token: the real timestep is grafted in per step
        # and must NOT be carried (carrying it would alias its arrays with
        # the rollout obs and break buffer donation)
        return jnp.zeros(()), obs

    def step(self, state: TimeStep, action: Array, key: Array):
        del action, key
        return jnp.zeros(()), state  # state IS the grafted raw TimeStep


def _graft(state: Any, raw_ts: TimeStep) -> Any:
    """Replace the innermost (relay) leaf of a wrapper-state pytree."""
    if hasattr(state, 'env'):
        return state.replace(env=_graft(state.env, raw_ts))
    return raw_ts  # the relay's scalar token (or a stale grafted ts)


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
        self._ac = actor_critic
        self._stack, self._base, self._relay, self._to_native = _spliced(env_stack)
        self._num_envs = self._base.num_envs
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


class HostOffPolicyRunner:
    """Host-driven collection for off-policy learners on host-backed envs.

    Same inversion as :class:`HostRolloutRunner` (host loop owns physics, one
    small jitted program per step), with the transition stored into the
    device replay ring per step — the ring buffers are donated so the store
    is in-place.  Mirrors ``OffPolicyAdapter.rollout``
    (adapter/offpolicy.py:54-109): warm-up random actions, TD done =
    terminated AND NOT truncated, real_next_obs from the pre-reset obs.

    Also fixes a host-env-specific hazard of the device path: evaluation
    episodes must NOT reset the training envs (host state is real), so
    ``eval_episode`` runs on a separate env stack.
    """

    def __init__(self, env_stack: CMDP, predict_fn, buffer: Optional[Any]) -> None:
        self._predict = predict_fn  # (policy_state, obs, key) -> act in [-1, 1]
        # buffer=None -> external-store mode: transitions are returned to the
        # caller instead of written into a local ring (the TPU-learner path
        # ships them to the device-resident ring in one transfer per cycle)
        self._buffer = buffer
        self._stack, self._base, self._relay, self._to_native = _spliced(env_stack)
        self._num_envs = self._base.num_envs
        self._act_dim = int(self._base.action_space.shape[0])
        self._first_fn = jax.jit(self._first)
        donate = (1,) if buffer is not None else ()
        self._mid_fn = jax.jit(self._mid, donate_argnums=donate)
        self._last_fn = jax.jit(self._last, donate_argnums=donate)

    # ---------------------------------------------------------------- jitted
    def _act(self, policy_state: Any, obs: Array, rng: Array, use_rand: Array):
        rng, act_key, rand_key = jax.random.split(rng, 3)
        policy_act = self._predict(policy_state, obs, act_key)
        rand_act = jax.random.uniform(
            rand_key, (self._num_envs, self._act_dim), minval=-1.0, maxval=1.0
        )
        act = jnp.where(use_rand, rand_act, policy_act)
        return act, self._to_native(act), rng

    def _first(self, carry: RolloutCarry, policy_state: Any, rng: Array, use_rand: Array):
        return self._act(policy_state, carry.obs, rng, use_rand)

    def _ingest_store(self, buf_state: Any, carry: RolloutCarry, act: Array,
                      raw_ts: TimeStep, key: Array):
        ws = _graft(carry.env_state, raw_ts)
        new_ws, ts = self._stack.step(ws, act, key)
        raw_r = ts.info.get('original_reward', ts.reward)
        raw_c = ts.info.get('original_cost', ts.cost)
        done = ts.done
        real_next_obs = jnp.where(done[:, None], ts.final_obs, ts.obs)
        td_done = jnp.logical_and(ts.terminated, jnp.logical_not(ts.truncated))
        transition = {
            'obs': carry.obs,
            'act': act,
            'reward': ts.reward,
            'cost': ts.cost,
            'done': td_done.astype(jnp.float32),
            'next_obs': real_next_obs,
        }
        if self._buffer is not None:
            buf_state = self._buffer.store(buf_state, transition)
        else:
            buf_state = transition  # handed back to the caller per step
        ep_ret = carry.ep_ret + raw_r
        ep_cost = carry.ep_cost + raw_c
        ep_len = carry.ep_len + 1.0
        record = (done, ep_ret, ep_cost, ep_len)
        not_done = 1.0 - done.astype(jnp.float32)
        new_carry = RolloutCarry(
            env_state=new_ws,
            obs=ts.obs,
            ep_ret=ep_ret * not_done,
            ep_cost=ep_cost * not_done,
            ep_len=ep_len * not_done,
        )
        return buf_state, new_carry, record

    def _mid(self, policy_state: Any, buf_state: Any, carry: RolloutCarry, act: Array,
             raw_ts: TimeStep, rng: Array, use_rand: Array):
        rng, step_key = jax.random.split(rng)
        buf_state, new_carry, record = self._ingest_store(buf_state, carry, act, raw_ts, step_key)
        next_act, native, rng = self._act(policy_state, new_carry.obs, rng, use_rand)
        return buf_state, new_carry, record, next_act, native, rng

    def _last(self, policy_state: Any, buf_state: Any, carry: RolloutCarry, act: Array,
              raw_ts: TimeStep, rng: Array):
        del policy_state
        rng, step_key = jax.random.split(rng)
        buf_state, new_carry, record = self._ingest_store(buf_state, carry, act, raw_ts, step_key)
        return buf_state, new_carry, record, rng

    # ------------------------------------------------------------------ host
    def _wrap_raw(self, host_out) -> TimeStep:
        obs, reward, cost, term, trunc, final_obs = host_out
        return TimeStep(
            obs=jnp.asarray(obs), reward=jnp.asarray(reward), cost=jnp.asarray(cost),
            terminated=jnp.asarray(term), truncated=jnp.asarray(trunc),
            final_obs=jnp.asarray(final_obs),
        )

    def reset(self, key: Array) -> RolloutCarry:
        seeds = np.asarray(jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1))
        raw_obs = self._base.host_reset_direct(seeds)
        self._relay._reset_obs = jnp.asarray(raw_obs)  # pylint: disable=protected-access
        env_state, obs = self._stack.reset(key)
        zeros = jnp.zeros((self._num_envs,))
        return RolloutCarry(env_state=env_state, obs=obs, ep_ret=zeros,
                            ep_cost=zeros, ep_len=zeros)

    def rollout(self, carry: RolloutCarry, buf_state: Any, policy_state: Any,
                key: Array, steps: int, use_rand) -> Tuple[RolloutCarry, Any, EpisodeMetrics]:
        """Collect ``steps`` host steps.  Returns the updated ring state, or —
        in external-store mode (buffer=None) — the stacked ``(steps, B, ...)``
        transition pytree for the caller to ship to the device ring."""
        external = self._buffer is None
        host_step = self._base.host_step_direct
        use_rand = jnp.asarray(use_rand)
        act, native, rng = self._first_fn(carry, policy_state, key, use_rand)
        records = []
        transitions = []
        for t in range(steps):
            raw = self._wrap_raw(host_step(np.asarray(native)))
            if t + 1 < steps:
                out, carry, record, act, native, rng = self._mid_fn(
                    policy_state, buf_state if not external else None,
                    carry, act, raw, rng, use_rand
                )
            else:
                out, carry, record, rng = self._last_fn(
                    policy_state, buf_state if not external else None,
                    carry, act, raw, rng
                )
            if external:
                transitions.append(out)
            else:
                buf_state = out
            records.append(record)
        done, ep_ret, ep_cost, ep_len = jax.tree.map(lambda *xs: jnp.stack(xs), *records)
        metrics = EpisodeMetrics(done=done, ep_ret=ep_ret, ep_cost=ep_cost, ep_len=ep_len)
        if external:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *transitions)
            return carry, stacked, metrics
        return carry, buf_state, metrics


class HostEvalRunner:
    """Deterministic evaluation episodes on a dedicated host env stack
    (mirrors ``OffPolicyAdapter.eval_episode``, adapter/offpolicy.py:111-142,
    without touching the training envs' host state)."""

    def __init__(self, env_stack: CMDP, predict_fn) -> None:
        self._stack, self._base, self._relay, self._to_native = _spliced(env_stack)
        self._predict = predict_fn
        self._num_envs = self._base.num_envs
        self._step_fn = jax.jit(self._step)

    def _step(self, ws: Any, policy_state: Any, raw_ts: TimeStep, rng: Array):
        ws = _graft(ws, raw_ts)
        rng, step_key, act_key = jax.random.split(rng, 3)
        new_ws, ts = self._stack.step(ws, jnp.zeros((self._num_envs, 1)), step_key)
        raw_r = ts.info.get('original_reward', ts.reward)
        raw_c = ts.info.get('original_cost', ts.cost)
        act = self._predict(policy_state, ts.obs, act_key)
        return new_ws, self._to_native(act), raw_r, raw_c, ts.done, rng

    def eval_episode(self, policy_state: Any, key: Array, max_steps: int = 1000):
        seeds = np.asarray(jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1))
        raw_obs = self._base.host_reset_direct(seeds)
        self._relay._reset_obs = jnp.asarray(raw_obs)  # pylint: disable=protected-access
        ws, obs = self._stack.reset(key)
        rng, act_key = jax.random.split(key)
        act = self._predict(policy_state, obs, act_key)
        native = np.asarray(self._to_native(act))
        ep_ret = np.zeros(self._num_envs)
        ep_cost = np.zeros(self._num_envs)
        ep_len = np.zeros(self._num_envs)
        alive = np.ones(self._num_envs, bool)
        for _ in range(max_steps):
            raw = self._wrap_raw(self._base.host_step_direct(native))
            ws, native_j, raw_r, raw_c, done, rng = self._step_fn(ws, policy_state, raw, rng)
            native = np.asarray(native_j)
            live = alive.astype(np.float64)
            ep_ret += np.asarray(raw_r) * live
            ep_cost += np.asarray(raw_c) * live
            ep_len += live
            alive &= ~np.asarray(done)
            if not alive.any():
                break
        return jnp.asarray(ep_ret), jnp.asarray(ep_cost), jnp.asarray(ep_len)

    def _wrap_raw(self, host_out) -> TimeStep:
        obs, reward, cost, term, trunc, final_obs = host_out
        return TimeStep(
            obs=jnp.asarray(obs), reward=jnp.asarray(reward), cost=jnp.asarray(cost),
            terminated=jnp.asarray(term), truncated=jnp.asarray(trunc),
            final_obs=jnp.asarray(final_obs),
        )


def _spliced(env_stack: CMDP):
    """Splice a relay into ``env_stack``; returns (stack, base, relay, to_native)."""
    chain: List[CMDP] = [env_stack]
    node = env_stack
    while isinstance(node, Wrapper):
        node = node._env  # pylint: disable=protected-access
        chain.append(node)
    base = chain[-1]
    assert getattr(base, 'host_backed', False), f'{type(base).__name__} is not host-backed'
    relay = _RelayEnv(base)
    stack = env_stack
    if len(chain) >= 2:
        chain[-2]._env = relay  # pylint: disable=protected-access
    else:
        stack = relay
    scale_wrapper = next((w for w in chain if isinstance(w, ActionScale)), None)
    if scale_wrapper is not None:
        scale = scale_wrapper._scale  # pylint: disable=protected-access
        offset = scale_wrapper._offset  # pylint: disable=protected-access
        to_native = lambda a: offset + scale * a  # noqa: E731
    else:
        to_native = lambda a: a  # noqa: E731
    return stack, base, relay, to_native


__all__ = ['HostRolloutRunner', 'HostOffPolicyRunner', 'HostEvalRunner', 'find_host_base']
