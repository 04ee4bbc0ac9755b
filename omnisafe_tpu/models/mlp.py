"""Flax MLP builder matching the reference's network construction semantics.

Counterpart of ``build_mlp_network``/``initialize_layer``/``get_activation``
(reference: omnisafe/utils/model.py:25-120).  The reference's
``kaiming_uniform`` with ``a=sqrt(5)`` is torch's default Linear init —
``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` — which maps to
``variance_scaling(1/3, 'fan_in', 'uniform')`` here; biases follow the same
torch convention.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_ACTIVATIONS: dict[str, Callable[[Array], Array]] = {
    'identity': lambda x: x,
    'relu': jax.nn.relu,
    'sigmoid': jax.nn.sigmoid,
    'softplus': jax.nn.softplus,
    'tanh': jnp.tanh,
    'gelu': jax.nn.gelu,
}

_INITS = {
    'kaiming_uniform': nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform'),
    'xavier_normal': nn.initializers.glorot_normal(),
    'glorot': nn.initializers.glorot_uniform(),
    'xavier_uniform': nn.initializers.glorot_uniform(),
    # note: plain float, not jnp.sqrt — a jnp call here would initialize the
    # XLA backend at import time, which breaks jax.distributed.initialize
    'orthogonal': nn.initializers.orthogonal(2.0 ** 0.5),
}


def get_activation(name: str) -> Callable[[Array], Array]:
    if name not in _ACTIVATIONS:
        raise KeyError(f'invalid activation: {name!r}; choose from {sorted(_ACTIVATIONS)}')
    return _ACTIVATIONS[name]


def _torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MLP(nn.Module):
    """Plain MLP: ``sizes`` hidden layers + linear head of ``out_dim``.

    All matmuls accumulate in float32 on the MXU via
    ``preferred_element_type``; parameters stay float32 (these nets are tiny —
    the win on TPU comes from batching the whole (T, B) rollout through them,
    not from low precision).
    """

    hidden_sizes: Sequence[int]
    out_dim: int
    activation: str = 'relu'
    output_activation: str = 'identity'
    weight_initialization_mode: str = 'kaiming_uniform'

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = get_activation(self.activation)
        out_act = get_activation(self.output_activation)
        kernel_init = _INITS[self.weight_initialization_mode]
        sizes = (*self.hidden_sizes, self.out_dim)
        fan_in = x.shape[-1]
        for i, size in enumerate(sizes):
            x = nn.Dense(
                size,
                kernel_init=kernel_init,
                bias_init=lambda k, s, d, f=fan_in: _torch_bias_init(k, s, d, f),
                name=f'dense_{i}',
            )(x)
            x = act(x) if i < len(sizes) - 1 else out_act(x)
            fan_in = size
        return x


__all__ = ['MLP', 'get_activation']
