"""Off-policy rollout engine.

Counterpart of the reference ``OffPolicyAdapter`` (reference:
omnisafe/adapter/offpolicy_adapter.py:30-207): a persistent observation
stream, warm-up random actions, TD-bootstrap ``done = terminated AND NOT
truncated``, ``real_next_obs`` patched from the pre-reset observation, and a
deterministic eval loop — all expressed as scans so the sample-update cycle
compiles into one program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.adapter.onpolicy import EpisodeMetrics, RolloutCarry, build_env_stack
from omnisafe_tpu.common.buffer.offpolicy import ReplayBuffer, ReplayBufferState

Array = jax.Array


class OffPolicyAdapter:
    """Pure rollout collection for off-policy learners."""

    def __init__(self, env_id: str, num_envs: int, algo_cfgs: Any, **kwargs: Any) -> None:
        self._env = build_env_stack(env_id, num_envs, algo_cfgs, **kwargs)
        self._num_envs = num_envs

    @property
    def env(self):
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
        buffer: ReplayBuffer,
        buffer_state: ReplayBufferState,
        predict_fn: Callable[[Array, Array], Array],
        key: Array,
        steps: int,
        use_rand_action: Array,
    ) -> Tuple[RolloutCarry, ReplayBufferState, EpisodeMetrics]:
        """Collect ``steps`` transitions into the replay buffer
        (reference: offpolicy_adapter.py:106-153)."""

        def body(state, _):
            rc, buf, rng = state
            rng, act_key, rand_key, step_key = jax.random.split(rng, 4)
            act_dim = self._env.action_space.shape[0]
            policy_act = predict_fn(rc.obs, act_key)
            # batch size from the carry, not self._num_envs: inside shard_map
            # each device sees its env shard
            rand_act = jax.random.uniform(
                rand_key, (rc.obs.shape[0], act_dim), minval=-1.0, maxval=1.0
            )
            act = jnp.where(use_rand_action, rand_act, policy_act)
            env_state, ts = self._env.step(rc.env_state, act, step_key)
            raw_r = ts.info.get('original_reward', ts.reward)
            raw_c = ts.info.get('original_cost', ts.cost)
            done = ts.done
            # real next obs: pre-reset observation when auto-reset fired
            real_next_obs = jnp.where(done[:, None], ts.final_obs, ts.obs)
            td_done = jnp.logical_and(ts.terminated, jnp.logical_not(ts.truncated))
            buf = buffer.store(buf, {
                'obs': rc.obs,
                'act': act,
                'reward': ts.reward,
                'cost': ts.cost,
                'done': td_done.astype(jnp.float32),
                'next_obs': real_next_obs,
            })
            ep_ret = rc.ep_ret + raw_r
            ep_cost = rc.ep_cost + raw_c
            ep_len = rc.ep_len + 1.0
            record = (done, ep_ret, ep_cost, ep_len)
            not_done = 1.0 - done.astype(jnp.float32)
            new_rc = RolloutCarry(
                env_state=env_state,
                obs=ts.obs,
                ep_ret=ep_ret * not_done,
                ep_cost=ep_cost * not_done,
                ep_len=ep_len * not_done,
            )
            return (new_rc, buf, rng), record

        (carry, buffer_state, _), (done, ep_ret, ep_cost, ep_len) = jax.lax.scan(
            body, (carry, buffer_state, key), None, length=steps
        )
        metrics = EpisodeMetrics(done=done, ep_ret=ep_ret, ep_cost=ep_cost, ep_len=ep_len)
        return carry, buffer_state, metrics

    def eval_episode(
        self,
        predict_fn: Callable[[Array, Array], Array],
        key: Array,
        max_steps: int = 1000,
    ) -> Tuple[Array, Array, Array]:
        """One deterministic evaluation episode per env instance
        (reference: offpolicy_adapter.py:66-104); returns per-env
        (ep_ret, ep_cost, ep_len) of the FIRST episode, masked after done."""
        reset_key, roll_key = jax.random.split(key)
        env_state, obs = self._env.reset(reset_key)

        def body(state, _):
            env_state, obs, rng, ep_ret, ep_cost, ep_len, alive = state
            rng, act_key, step_key = jax.random.split(rng, 3)
            act = predict_fn(obs, act_key)
            env_state, ts = self._env.step(env_state, act, step_key)
            raw_r = ts.info.get('original_reward', ts.reward)
            raw_c = ts.info.get('original_cost', ts.cost)
            live = alive.astype(jnp.float32)
            ep_ret = ep_ret + raw_r * live
            ep_cost = ep_cost + raw_c * live
            ep_len = ep_len + live
            alive = jnp.logical_and(alive, jnp.logical_not(ts.done))
            return (env_state, ts.obs, rng, ep_ret, ep_cost, ep_len, alive), None

        zeros = jnp.zeros((self._num_envs,))
        alive = jnp.ones((self._num_envs,), bool)
        (_, _, _, ep_ret, ep_cost, ep_len, _), _ = jax.lax.scan(
            body, (env_state, obs, roll_key, zeros, zeros, zeros, alive), None, length=max_steps
        )
        return ep_ret, ep_cost, ep_len


__all__ = ['OffPolicyAdapter']
