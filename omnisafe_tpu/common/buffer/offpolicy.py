"""Device-resident circular replay buffer.

Counterpart of the reference's ``OffPolicyBuffer``/``VectorOffPolicyBuffer``
(reference: omnisafe/common/buffer/offpolicy_buffer.py:26-120,
vector_offpolicy_buffer.py:26-143): same ``(size, num_envs, *shape)`` layout
and flattened uniform gather sampling, but the storage is a sharded device
array written with ``dynamic_update_slice`` inside the jitted sample-cycle
scan — transitions never leave HBM.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class ReplayBufferState:
    data: Dict[str, Array]   # each (capacity, num_envs, *shape)
    ptr: Array               # () int32 next write slot
    size: Array              # () int32 number of valid slots


class ReplayBuffer:
    """Static shape info + pure store/sample ops."""

    FIELDS = ('obs', 'act', 'reward', 'cost', 'done', 'next_obs')

    def __init__(self, obs_dim: int, act_dim: int, capacity: int, num_envs: int,
                 penalty_coefficient: float = 0.0) -> None:
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.capacity = capacity
        self.num_envs = num_envs
        self.penalty_coefficient = penalty_coefficient

    def init(self) -> ReplayBufferState:
        c, b = self.capacity, self.num_envs
        data = {
            'obs': jnp.zeros((c, b, self.obs_dim)),
            'act': jnp.zeros((c, b, self.act_dim)),
            'reward': jnp.zeros((c, b)),
            'cost': jnp.zeros((c, b)),
            'done': jnp.zeros((c, b)),
            'next_obs': jnp.zeros((c, b, self.obs_dim)),
        }
        return ReplayBufferState(
            data=data, ptr=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32)
        )

    def store(self, state: ReplayBufferState, transition: Dict[str, Array]) -> ReplayBufferState:
        """Write one (num_envs,) batch of transitions at the ring pointer.

        Penalty reward shaping on store mirrors the reference
        (reference: offpolicy_buffer.py:98-112).
        """
        transition = dict(transition)
        if self.penalty_coefficient:
            transition['reward'] = (
                transition['reward'] - self.penalty_coefficient * transition['cost']
            )
        data = {
            key: state.data[key].at[state.ptr].set(transition[key]) for key in self.FIELDS
        }
        return ReplayBufferState(
            data=data,
            ptr=(state.ptr + 1) % self.capacity,
            size=jnp.minimum(state.size + 1, self.capacity),
        )

    def sample(self, state: ReplayBufferState, key: Array, batch_size: int) -> Dict[str, Array]:
        """Uniform gather over the valid (size x num_envs) region
        (reference: vector_offpolicy_buffer.py:128-143)."""
        slot_key, env_key = jax.random.split(key)
        slots = jax.random.randint(slot_key, (batch_size,), 0, jnp.maximum(state.size, 1))
        envs = jax.random.randint(env_key, (batch_size,), 0, self.num_envs)
        return {k: state.data[k][slots, envs] for k in self.FIELDS}


__all__ = ['ReplayBuffer', 'ReplayBufferState']
