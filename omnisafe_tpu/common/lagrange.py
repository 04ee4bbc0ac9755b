"""Lagrange multiplier as pure optimizer state.

Counterpart of the reference's ``Lagrange`` (reference:
omnisafe/common/lagrange.py:22-136): the multiplier is a scalar parameter
ascended on the constraint violation ``Jc - cost_limit`` via a torch
optimizer, then projected to ``[0, upper_bound]``.  Here the parameter and
its optax state are one ``flax.struct`` pytree so the λ update lives *inside*
the jitted training step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array


@struct.dataclass
class LagrangeState:
    param: Array        # raw multiplier parameter (projected on update)
    opt_state: Any

    @property
    def multiplier(self) -> Array:
        """ReLU range projection (reference: lagrange.py:84-85)."""
        return jax.nn.relu(self.param)


class Lagrange:
    """Static configuration + pure update rule for the Lagrange multiplier."""

    def __init__(
        self,
        cost_limit: float,
        lagrangian_multiplier_init: float,
        lambda_lr: float,
        lambda_optimizer: str = 'Adam',
        lagrangian_upper_bound: Optional[float] = None,
    ) -> None:
        self.cost_limit = float(cost_limit)
        self.upper_bound = lagrangian_upper_bound
        name = lambda_optimizer.lower()
        if name == 'adam':
            self._tx = optax.adam(lambda_lr)
        elif name == 'sgd':
            self._tx = optax.sgd(lambda_lr)
        elif name == 'adamw':
            self._tx = optax.adamw(lambda_lr)
        else:
            raise NotImplementedError(f'lambda_optimizer {lambda_optimizer!r} not supported')
        self._init_value = max(lagrangian_multiplier_init, 0.0)

    def init(self) -> LagrangeState:
        param = jnp.asarray(self._init_value, jnp.float32)
        return LagrangeState(param=param, opt_state=self._tx.init(param))

    def update(self, state: LagrangeState, mean_ep_cost: Array) -> LagrangeState:
        """One ascent step on ``-λ (Jc - limit)`` followed by clamping
        (reference: lagrange.py:114-136)."""
        grad = jax.grad(lambda p: -p * (mean_ep_cost - self.cost_limit))(state.param)
        updates, opt_state = self._tx.update(grad, state.opt_state, state.param)
        param = optax.apply_updates(state.param, updates)
        upper = jnp.inf if self.upper_bound is None else self.upper_bound
        param = jnp.clip(param, 0.0, upper)
        return LagrangeState(param=param, opt_state=opt_state)


__all__ = ['Lagrange', 'LagrangeState']
