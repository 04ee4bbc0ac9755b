"""PID-controlled Lagrange multiplier (Stooke et al. 2020) as pure state.

Counterpart of the reference's ``PIDLagrangian`` (reference:
omnisafe/common/pid_lagrange.py:24-125).  The delayed derivative deque becomes
a fixed-size ring buffer (an array + rolling index), so the whole controller
is a pytree updated branch-free inside the jitted epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class PIDLagrangianState:
    pid_i: Array          # integral term (ReLU floor)
    delta_p: Array        # EMA'd proportional error
    cost_d: Array         # EMA'd cost (for the derivative)
    cost_ds: Array        # ring buffer of delayed cost_d values, shape (d_delay,)
    ring_idx: Array       # next write position in the ring
    ring_fill: Array      # number of valid entries (deque starts with one 0.0)
    cost_penalty: Array   # current multiplier output

    @property
    def multiplier(self) -> Array:
        return self.cost_penalty


class PIDLagrangian:
    """Static gains + pure ``pid_update`` (reference: pid_lagrange.py:92-125)."""

    # pylint: disable-next=too-many-arguments
    def __init__(
        self,
        pid_kp: float,
        pid_ki: float,
        pid_kd: float,
        pid_d_delay: int,
        pid_delta_p_ema_alpha: float,
        pid_delta_d_ema_alpha: float,
        sum_norm: bool,
        diff_norm: bool,
        penalty_max: float,
        lagrangian_multiplier_init: float,
        cost_limit: float,
    ) -> None:
        self.kp, self.ki, self.kd = pid_kp, pid_ki, pid_kd
        self.d_delay = int(pid_d_delay)
        self.alpha_p = pid_delta_p_ema_alpha
        self.alpha_d = pid_delta_d_ema_alpha
        self.sum_norm = sum_norm
        self.diff_norm = diff_norm
        self.penalty_max = penalty_max
        self.init_value = lagrangian_multiplier_init
        self.cost_limit = cost_limit

    def init(self) -> PIDLagrangianState:
        return PIDLagrangianState(
            pid_i=jnp.asarray(self.init_value, jnp.float32),
            delta_p=jnp.zeros(()),
            cost_d=jnp.zeros(()),
            cost_ds=jnp.zeros((self.d_delay,)),
            # the deque is seeded with one 0.0 occupying slot 0, so the first
            # write lands at slot 1 (or 0 when the capacity is 1).
            ring_idx=jnp.asarray(1 % self.d_delay, jnp.int32),
            ring_fill=jnp.ones((), jnp.int32),
            cost_penalty=jnp.zeros(()),
        )

    def update(self, state: PIDLagrangianState, ep_cost_avg: Array) -> PIDLagrangianState:
        delta = ep_cost_avg - self.cost_limit
        pid_i = jnp.maximum(0.0, state.pid_i + delta * self.ki)
        if self.diff_norm:
            pid_i = jnp.clip(pid_i, 0.0, 1.0)
        delta_p = self.alpha_p * state.delta_p + (1.0 - self.alpha_p) * delta
        cost_d = self.alpha_d * state.cost_d + (1.0 - self.alpha_d) * ep_cost_avg
        # the deque's leftmost element: with fill < capacity it is index 0,
        # once full it is the slot about to be overwritten.
        oldest = jnp.where(
            state.ring_fill < self.d_delay,
            state.cost_ds[0],
            state.cost_ds[state.ring_idx],
        )
        pid_d = jnp.maximum(0.0, cost_d - oldest)
        pid_o = self.kp * delta_p + pid_i + self.kd * pid_d
        penalty = jnp.maximum(0.0, pid_o)
        if self.diff_norm:
            penalty = jnp.minimum(1.0, penalty)
        if not (self.diff_norm or self.sum_norm):
            penalty = jnp.minimum(penalty, self.penalty_max)
        cost_ds = state.cost_ds.at[state.ring_idx].set(cost_d)
        return PIDLagrangianState(
            pid_i=pid_i,
            delta_p=delta_p,
            cost_d=cost_d,
            cost_ds=cost_ds,
            ring_idx=(state.ring_idx + 1) % self.d_delay,
            ring_fill=jnp.minimum(state.ring_fill + 1, self.d_delay),
            cost_penalty=penalty,
        )


__all__ = ['PIDLagrangian', 'PIDLagrangianState']
