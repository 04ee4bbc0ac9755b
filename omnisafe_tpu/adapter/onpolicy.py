"""On-policy rollout engine.

Counterpart of the reference's ``OnlineAdapter``/``OnPolicyAdapter``
(reference: omnisafe/adapter/online_adapter.py:38-246,
onpolicy_adapter.py:31-190).  The reference steps one (vectorized) env per
Python iteration with numpy<->torch marshaling; here the rollout is a single
``lax.scan`` over time of a vmapped pure-JAX env + one batched policy forward,
compiled into the same XLA program as the advantage scans.

Wrapper order matches the reference (online_adapter.py:120-140):
TimeLimit -> AutoReset -> [Vectorize] -> ObsNormalize -> RewardNormalize ->
CostNormalize -> ActionScale.  Episode metric accumulation mirrors
``_log_value``/``_log_metrics`` (onpolicy_adapter.py:138-190) with raw
rewards/costs taken from ``info['original_*']`` when normalization is on.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.common.buffer.advantages import Trajectory
from omnisafe_tpu.envs.core import CMDP, make
from omnisafe_tpu.envs.wrappers import (
    ActionScale,
    AutoReset,
    CostNormalize,
    ObsNormalize,
    RewardNormalize,
    TimeLimit,
    Vectorize,
)

Array = jax.Array


def build_env_stack(
    env_id: str,
    num_envs: int,
    algo_cfgs: Any,
    inner_wrapper: Optional[Callable[[CMDP], CMDP]] = None,
    outer_wrapper: Optional[Callable[[CMDP], CMDP]] = None,
    time_limit: Optional[int] = None,
    early_term_cost_limit: Optional[float] = None,
    **env_kwargs: Any,
) -> CMDP:
    """Assemble the wrapper stack in the reference's fixed order.

    ``early_term_cost_limit`` (EarlyTerminated family) is declarative
    because the two backends implement it at different layers: pure-JAX
    envs get :class:`EarlyTerminatedWrapper` under AutoReset, host-backed
    vectorized envs (which own their auto-reset) implement it inside the
    host step loop (envs/host_mujoco.py ``early_term_cost_limit``).
    """
    from omnisafe_tpu.envs.core import _ENV_REGISTRY  # pylint: disable=import-outside-toplevel

    cls = _ENV_REGISTRY.get(env_id)
    if cls is not None and getattr(cls, 'is_vectorized', False):
        # host-backed envs own their batch and auto-reset themselves
        if inner_wrapper is not None:
            raise ValueError(
                f'{env_id} is host-vectorized: single-env inner wrappers '
                f'cannot sit under its host-side auto-reset'
            )
        if early_term_cost_limit is not None:
            if not getattr(cls, 'supports_host_early_term', False):
                raise ValueError(
                    f'{env_id} does not implement host-side early termination'
                )
            env_kwargs['early_term_cost_limit'] = early_term_cost_limit
        env = make(env_id, num_envs=num_envs, **env_kwargs)
    else:
        env = make(env_id, **env_kwargs)
        if env.need_time_limit_wrapper:
            env = TimeLimit(env, time_limit or env.max_episode_steps)
        # inner wrappers (EarlyTerminated) sit under AutoReset so their
        # termination triggers the in-step reset
        if early_term_cost_limit is not None:
            from omnisafe_tpu.adapter.saute import EarlyTerminatedWrapper  # pylint: disable=import-outside-toplevel

            env = EarlyTerminatedWrapper(env, early_term_cost_limit)
        if inner_wrapper is not None:
            env = inner_wrapper(env)
        if env.need_auto_reset_wrapper:
            env = AutoReset(env)
        env = Vectorize(env, num_envs)
    if getattr(algo_cfgs, 'obs_normalize', False):
        env = ObsNormalize(env)
    if getattr(algo_cfgs, 'reward_normalize', False):
        env = RewardNormalize(env)
    if getattr(algo_cfgs, 'cost_normalize', False):
        env = CostNormalize(env)
    env = ActionScale(env, -1.0, 1.0)
    if outer_wrapper is not None:
        env = outer_wrapper(env)
    return env


@struct.dataclass
class RolloutCarry:
    """Scan carry for the rollout loop."""

    env_state: Any
    obs: Array        # (B, O) current observation
    ep_ret: Array     # (B,) running episode return (raw reward)
    ep_cost: Array    # (B,) running episode cost (raw cost)
    ep_len: Array     # (B,)


@struct.dataclass
class EpisodeMetrics:
    """Per-step episode-completion records; fields are valid where ``done``."""

    done: Array       # (T, B) bool
    ep_ret: Array     # (T, B)
    ep_cost: Array    # (T, B)
    ep_len: Array     # (T, B)


class OnPolicyAdapter:
    """Pure rollout collection for on-policy learners."""

    def __init__(
        self,
        env_id: str,
        num_envs: int,
        algo_cfgs: Any,
        inner_wrapper: Optional[Callable[[CMDP], CMDP]] = None,
        outer_wrapper: Optional[Callable[[CMDP], CMDP]] = None,
        **env_kwargs: Any,
    ) -> None:
        self._env = build_env_stack(
            env_id, num_envs, algo_cfgs,
            inner_wrapper=inner_wrapper, outer_wrapper=outer_wrapper, **env_kwargs,
        )
        self._num_envs = num_envs

    @property
    def env(self) -> CMDP:
        return self._env

    @property
    def observation_space(self):
        return self._env.observation_space

    @property
    def action_space(self):
        return self._env.action_space

    @property
    def num_envs(self) -> int:
        return self._num_envs

    def reset(self, key: Array) -> RolloutCarry:
        env_state, obs = self._env.reset(key)
        zeros = jnp.zeros((self._num_envs,))
        return RolloutCarry(env_state=env_state, obs=obs, ep_ret=zeros, ep_cost=zeros, ep_len=zeros)

    # pylint: disable-next=too-many-locals
    def rollout(
        self,
        carry: RolloutCarry,
        params: Any,
        actor_critic: Any,
        key: Array,
        steps_per_env: int,
    ) -> Tuple[RolloutCarry, Trajectory, Array, Array, EpisodeMetrics]:
        """Collect ``steps_per_env`` steps from every env in one scan.

        Returns the new carry, the (T, B) trajectory, the epoch-cut bootstrap
        values, and episode metrics (reference: onpolicy_adapter.py:58-136).
        """

        def body(state: Tuple[RolloutCarry, Array], _):
            rc, rng = state
            rng, act_key, step_key = jax.random.split(rng, 3)
            act, value_r, value_c, logp = actor_critic.step(params, rc.obs, act_key)
            env_state, ts = self._env.step(rc.env_state, act, step_key)
            raw_r = ts.info.get('original_reward', ts.reward)
            raw_c = ts.info.get('original_cost', ts.cost)
            ep_ret = rc.ep_ret + raw_r
            ep_cost = rc.ep_cost + raw_c
            ep_len = rc.ep_len + 1.0
            done = ts.done
            record = (
                rc.obs, act, logp, ts.reward, ts.cost, value_r, value_c,
                ts.terminated, ts.truncated, ts.final_obs,
                done, ep_ret, ep_cost, ep_len,
            )
            not_done = 1.0 - done.astype(jnp.float32)
            new_rc = RolloutCarry(
                env_state=env_state,
                obs=ts.obs,
                ep_ret=ep_ret * not_done,
                ep_cost=ep_cost * not_done,
                ep_len=ep_len * not_done,
            )
            return (new_rc, rng), record

        (carry, _), records = jax.lax.scan(body, (carry, key), None, length=steps_per_env)
        (obs, act, logp, reward, cost, value_r, value_c,
         terminated, truncated, final_obs, done, ep_ret, ep_cost, ep_len) = records

        # bootstrap values: batched critic passes over (T*B, O) for the
        # truncation case and (B, O) for the epoch cut
        tb = final_obs.shape[0] * final_obs.shape[1]
        flat_final = final_obs.reshape(tb, -1)
        fv_r, fv_c = actor_critic.value(params, flat_final)
        last_value_r, last_value_c = actor_critic.value(params, carry.obs)

        traj = Trajectory(
            obs=obs,
            act=act,
            logp=logp,
            reward=reward,
            cost=cost,
            value_r=value_r,
            value_c=value_c,
            terminated=terminated,
            truncated=truncated,
            final_value_r=fv_r.reshape(final_obs.shape[:2]),
            final_value_c=fv_c.reshape(final_obs.shape[:2]),
        )
        metrics = EpisodeMetrics(done=done, ep_ret=ep_ret, ep_cost=ep_cost, ep_len=ep_len)
        return carry, traj, last_value_r, last_value_c, metrics


__all__ = ['OnPolicyAdapter', 'build_env_stack', 'RolloutCarry', 'EpisodeMetrics']
