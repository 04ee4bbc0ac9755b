"""Data-parallel (SPMD) wrapping of the off-policy epoch program.

The reference asserts ``parallel == 1`` for its off-policy family
(reference: omnisafe/utils/config.py:288-291) — data parallelism there
would need a parameter server around the replay buffer.  The TPU-native
design removes that limitation for the fully-jitted path: the replay ring
already lives on-device with a ``(capacity, num_envs, ...)`` layout, so the
env-stream axis shards over the dp mesh — each device owns its env shard
AND the ring shard those envs feed, TD updates sample per-device batches
from the local shard, and gradient averaging is the same ``pmean`` the
on-policy programs use.  λ (and α) stay replicated: their inputs (epoch Jc,
pmean'd losses) are identical on every device.

Like the on-policy convention, ``vector_env_nums`` is PER-DEVICE; the
adapter owns ``vector_env_nums * num_devices`` global env streams.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from omnisafe_tpu.adapter.onpolicy import EpisodeMetrics, RolloutCarry
from omnisafe_tpu.common.buffer.offpolicy import ReplayBufferState
from omnisafe_tpu.parallel.axis import mesh_axis
from omnisafe_tpu.parallel.onpolicy import AXIS, _env_state_spec, make_mesh  # noqa: F401


def make_offpolicy_state_spec(state: Any, num_envs: int):
    """PartitionSpecs for ``OffPolicyTrainState``: env streams + ring shard
    over dp, everything learnable replicated."""
    replicate = lambda tree: jax.tree.map(lambda _: P(), tree)  # noqa: E731
    rollout_spec = RolloutCarry(
        env_state=_env_state_spec(state.rollout.env_state, num_envs),
        obs=P(AXIS), ep_ret=P(AXIS), ep_cost=P(AXIS), ep_len=P(AXIS),
    )
    buffer_spec = ReplayBufferState(
        data={k: P(None, AXIS) for k in state.buffer.data},
        ptr=P(), size=P(),
    )
    return state.replace(
        params=replicate(state.params),
        actor_opt=replicate(state.actor_opt),
        reward_critic_opt=replicate(state.reward_critic_opt),
        cost_critic_opt=replicate(state.cost_critic_opt),
        alpha=replicate(state.alpha),
        buffer=buffer_spec,
        rollout=rollout_spec,
        extra=replicate(state.extra),
        update_count=P(),
        global_step=P(),
        key=P(),
    )


def make_distributed_epoch(algo, mesh: Mesh, example_state) -> Any:
    """Jitted shard_map'ed epoch program for a DDPG-family instance."""
    num_envs = algo._num_envs  # pylint: disable=protected-access
    state_spec = make_offpolicy_state_spec(example_state, num_envs)
    ep_spec = EpisodeMetrics(done=P(None, None, AXIS), ep_ret=P(None, None, AXIS),
                             ep_cost=P(None, None, AXIS), ep_len=P(None, None, AXIS))

    def body(state, Jc, lr, do_lambda):
        with mesh_axis(AXIS):
            return algo._epoch_program(state, Jc, lr, do_lambda)  # pylint: disable=protected-access

    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(state_spec, P(), P(), P()),
            out_specs=(state_spec, ep_spec, P()),
            check_vma=False,
        )
    )


__all__ = ['make_offpolicy_state_spec', 'make_distributed_epoch', 'make_mesh']
