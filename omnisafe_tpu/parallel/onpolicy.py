"""Data-parallel (SPMD) wrapping of the on-policy training programs.

TPU-native counterpart of the reference's torchrun data parallelism
(reference: omnisafe/utils/distributed.py:83-139): instead of forking
processes and allreducing per-minibatch, the rollout/update programs are
``shard_map``-ped over a ``jax.sharding.Mesh`` axis ``'dp'`` — the env batch
and the flattened training batch are sharded, parameters and optimizer state
replicated, and every reduction the reference routes through
``avg_grads``/``dist_avg``/``dist_statistics_scalar`` becomes a ``pmean``
over ICI inside the compiled program.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from omnisafe_tpu.adapter.onpolicy import EpisodeMetrics, RolloutCarry
from omnisafe_tpu.algorithms.on_policy.policy_gradient import OnPolicyTrainState
from omnisafe_tpu.parallel.axis import mesh_axis

AXIS = 'dp'


def make_mesh(num_devices: int) -> Mesh:
    devices = np.asarray(jax.devices()[:num_devices])
    return Mesh(devices, (AXIS,))


def _env_state_spec(env_state: Any, num_envs: int):
    """Infer the dp sharding of a wrapped env-state pytree.

    Leaves produced under ``Vectorize``'s vmap carry a leading env-batch axis
    and shard over dp; shared running statistics (any leaf under a ``stats``
    field) and other batchless leaves stay replicated.
    """

    def spec_for(path, leaf):
        for entry in path:
            name = getattr(entry, 'name', None)
            if name == 'stats':
                return P()
        if getattr(leaf, 'ndim', 0) >= 1 and leaf.shape[0] == num_envs:
            return P(AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, env_state)


def make_state_spec(state: OnPolicyTrainState, num_envs: int):
    """Pytree of PartitionSpecs for the train state: env batch sharded,
    everything learnable replicated."""
    rollout_spec = RolloutCarry(
        env_state=_env_state_spec(state.rollout.env_state, num_envs),
        obs=P(AXIS),
        ep_ret=P(AXIS),
        ep_cost=P(AXIS),
        ep_len=P(AXIS),
    )
    replicate = lambda tree: jax.tree.map(lambda _: P(), tree)
    return OnPolicyTrainState(
        params=replicate(state.params),
        actor_opt=replicate(state.actor_opt),
        reward_critic_opt=replicate(state.reward_critic_opt),
        cost_critic_opt=replicate(state.cost_critic_opt),
        rollout=rollout_spec,
        extra=replicate(state.extra),
        key=P(),
    )


def make_distributed_programs(algo, mesh: Mesh, example_state: OnPolicyTrainState) -> Tuple[Any, Any]:
    """Build jitted shard_map'ed (rollout, update) callables for ``algo``.

    ``algo`` must be a PolicyGradient-family instance configured with
    ``train_cfgs.num_devices == mesh size`` (its ``_axis_name`` is 'dp').
    """
    num_envs = algo._adapter.num_envs  # pylint: disable=protected-access
    state_spec = make_state_spec(example_state, num_envs)
    batch_spec = P(AXIS)        # every OnPolicyBatch leaf is (N_local, ...)
    metrics_spec = P()          # losses/KL are pmean'd inside the program
    ep_spec = EpisodeMetrics(done=P(None, AXIS), ep_ret=P(None, AXIS),
                             ep_cost=P(None, AXIS), ep_len=P(None, AXIS))

    def rollout_body(state):
        with mesh_axis(AXIS):
            return algo._rollout_program(state)  # pylint: disable=protected-access

    def update_body(state, batch, Jc, lr):
        with mesh_axis(AXIS):
            return algo._update_program(state, batch, Jc, lr)  # pylint: disable=protected-access

    rollout = jax.jit(
        shard_map(
            rollout_body,
            mesh=mesh,
            in_specs=(state_spec,),
            out_specs=(state_spec, batch_spec, ep_spec, metrics_spec),
            check_vma=False,
        )
    )
    update = jax.jit(
        shard_map(
            update_body,
            mesh=mesh,
            in_specs=(state_spec, batch_spec, P(), P()),
            out_specs=(state_spec, metrics_spec),
            check_vma=False,
        ),
        # match the single-device path: the assembled batch is consumed by
        # the update and never reused, so donate its buffers
        donate_argnums=1,
    )
    return rollout, update


__all__ = ['AXIS', 'make_mesh', 'make_state_spec', 'make_distributed_programs']
