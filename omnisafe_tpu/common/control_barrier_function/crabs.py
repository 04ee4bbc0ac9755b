"""CRABS control-barrier-function stack: barrier net, core objective,
adversarial state optimizers, certificate training.

Counterparts of the reference's CRABS machinery (reference:
omnisafe/common/control_barrier_function/crabs/models.py:323-396 [CrabsCore],
optimizers.py:28-66 [Barrier], :66-153 [StateBox], :153-369
[SLangevinOptimizer], :369-470 [SSampleOptimizer/SGradOptimizer], :470-537
[PolicyAdvTraining], :537-... [BarrierCertOptimizer]).

Structural deviations from the reference (documented, all pure-JAX):

* the reference's pytorch-lightning trainers become jitted update functions;
* the Langevin (MALA) adversarial sampler keeps a fixed-size device pool with
  tempered Metropolis acceptance instead of the reference's per-chain
  adaptive step sizes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omnisafe_tpu.models.mlp import MLP

Array = jax.Array


class Barrier:
    """h(s) = softplus(net(s) - net(s0)) * ell_coef + env_barrier(s) * barrier_coef - 1
    (reference: optimizers.py:28-66)."""

    def __init__(
        self,
        net: MLP,
        env_barrier_fn: Callable[[Array], Array],
        s0: Array,
        ell_coef: float = 1.0,
        barrier_coef: float = 1.0,
    ) -> None:
        self.net = net
        self.env_barrier_fn = env_barrier_fn
        self.s0 = s0
        self.ell_coef = ell_coef
        self.barrier_coef = barrier_coef

    def init(self, key: Array) -> Any:
        return self.net.init(key, self.s0[None])

    def __call__(self, params: Any, states: Array) -> Array:
        net_s = self.net.apply(params, states)[..., 0]
        net_s0 = self.net.apply(params, self.s0[None])[0, 0]
        return (
            jax.nn.softplus(net_s - net_s0) * self.ell_coef
            + self.env_barrier_fn(states) * self.barrier_coef
            - 1.0
        )


@struct.dataclass
class StateBoxState:
    """Running axis-aligned bounds of visited states
    (reference: optimizers.py:66-153)."""

    low: Array
    high: Array

    def update(self, states: Array) -> 'StateBoxState':
        return StateBoxState(
            low=jnp.minimum(self.low, jnp.min(states, axis=0)),
            high=jnp.maximum(self.high, jnp.max(states, axis=0)),
        )

    def project(self, states: Array) -> Array:
        return jnp.clip(states, self.low, self.high)

    def sample(self, key: Array, n: int) -> Array:
        return jax.random.uniform(
            key, (n, self.low.shape[0]), minval=self.low, maxval=self.high
        )


def make_state_box(dim: int, init_radius: float = 0.1) -> StateBoxState:
    return StateBoxState(low=-init_radius * jnp.ones(dim), high=init_radius * jnp.ones(dim))


class CrabsCore:
    """U(s) = max_elite h(model(s, π(s))) and the certificate objective
    (reference: models.py:323-396)."""

    # pylint: disable-next=too-many-arguments
    def __init__(self, barrier: Barrier, dynamics, actor, eps: float = 0.01,
                 neg_coef: float = 1.0) -> None:
        self.barrier = barrier
        self.dynamics = dynamics
        self.actor = actor
        self.eps = eps
        self.neg_coef = neg_coef

    def u(self, h_params, dyn_state, actor_params, states: Array,
          actions: Array | None = None) -> Array:
        """Worst-case next-step barrier over the model ensemble."""
        if actions is None:
            dist = self.actor.apply(actor_params, states)
            actions = dist.mode()
        E = self.dynamics.num_ensemble
        states_e = jnp.broadcast_to(states[None], (E,) + states.shape)
        actions_e = jnp.broadcast_to(actions[None], (E,) + actions.shape)
        next_states, _, _ = self.dynamics.sample(
            dyn_state, states_e, actions_e, jax.random.key(0), deterministic=True
        )
        nh = self.barrier(h_params, next_states)  # (E, N)
        # only elite models participate; non-elites are masked to -inf
        mask = dyn_state.elite_mask[:, None]
        nh = jnp.where(mask > 0, nh, -jnp.inf)
        return jnp.max(nh, axis=0)

    def obj_eval(self, h_params, dyn_state, actor_params, s: Array) -> Dict[str, Array]:
        """(reference: models.py:368-396)."""
        h = self.barrier(h_params, s)
        u = self.u(h_params, dyn_state, actor_params, s)
        obj = u + self.eps
        mask = jnp.logical_and(h < 0, obj > 0)
        return {
            'h': h,
            'u': u,
            'obj': obj,
            'constraint': h,
            'mask': mask,
            'max_obj': jnp.max(obj * mask),
            'hard_obj': jnp.where(h < 0, u + self.eps, -h - 1000.0),
        }


@struct.dataclass
class LangevinState:
    """Adversarial state pool + sampler temperature."""

    pool: Array   # (N, dim)
    key: Array


class SLangevinOptimizer:
    """MALA sampler maximizing the certificate violation ``hard_obj``
    (reference: optimizers.py:153-369)."""

    def __init__(self, core: CrabsCore, dim: int, pool_size: int = 256,
                 lr: float = 0.01, temperature: float = 0.03, n_steps: int = 1) -> None:
        self.core = core
        self.dim = dim
        self.pool_size = pool_size
        self.lr = lr
        self.temperature = temperature
        self.n_steps = n_steps

    def init(self, key: Array, box: StateBoxState) -> LangevinState:
        pool_key, state_key = jax.random.split(key)
        return LangevinState(pool=box.sample(pool_key, self.pool_size), key=state_key)

    def step(self, state: LangevinState, h_params, dyn_state, actor_params,
             box: StateBoxState) -> Tuple[LangevinState, Dict[str, Array]]:
        """One tempered MALA sweep over the pool."""

        def hard_obj(s):
            return self.core.obj_eval(h_params, dyn_state, actor_params, s)['hard_obj']

        def sweep(carry, _):
            pool, key = carry
            key, noise_key, accept_key = jax.random.split(key, 3)
            obj = hard_obj(pool)
            grad = jax.grad(lambda s: jnp.sum(hard_obj(s)))(pool)
            grad = jnp.nan_to_num(grad)
            noise = jax.random.normal(noise_key, pool.shape)
            proposal = pool + self.lr * grad + jnp.sqrt(2.0 * self.lr * self.temperature) * noise
            proposal = box.project(proposal)
            new_obj = hard_obj(proposal)
            log_alpha = (new_obj - obj) / self.temperature
            accept = jnp.log(jax.random.uniform(accept_key, obj.shape)) < log_alpha
            pool = jnp.where(accept[:, None], proposal, pool)
            return (pool, key), jnp.mean(accept.astype(jnp.float32))

        (pool, key), accept_rates = jax.lax.scan(
            sweep, (state.pool, state.key), None, length=self.n_steps
        )
        info = {'Barrier/langevin_accept_rate': jnp.mean(accept_rates)}
        return LangevinState(pool=pool, key=key), info


class SSampleOptimizer:
    """Uniform-resampling adversarial search (reference: optimizers.py:369-430)."""

    def __init__(self, core: CrabsCore, pool_size: int = 256) -> None:
        self.core = core
        self.pool_size = pool_size

    def sample(self, key: Array, box: StateBoxState) -> Array:
        return box.sample(key, self.pool_size)


class SGradOptimizer:
    """Pure gradient-ascent adversarial search (reference: optimizers.py:430-470)."""

    def __init__(self, core: CrabsCore, lr: float = 0.01, steps: int = 10) -> None:
        self.core = core
        self.lr = lr
        self.steps = steps

    def ascend(self, states: Array, h_params, dyn_state, actor_params,
               box: StateBoxState) -> Array:
        def hard_obj_sum(s):
            return jnp.sum(
                self.core.obj_eval(h_params, dyn_state, actor_params, s)['hard_obj']
            )

        def body(s, _):
            g = jnp.nan_to_num(jax.grad(hard_obj_sum)(s))
            return box.project(s + self.lr * g), None

        states, _ = jax.lax.scan(body, states, None, length=self.steps)
        return states


class BarrierCertOptimizer:
    """Train h to push the certificate violation below zero on the
    adversarial pool (reference: optimizers.py:537-...)."""

    def __init__(self, core: CrabsCore, lr: float = 3e-4, weight_decay: float = 1e-4) -> None:
        self.core = core
        self.tx = optax.adamw(lr, weight_decay=weight_decay)

    def init(self, h_params) -> Any:
        return self.tx.init(h_params)

    def step(self, h_params, opt_state, dyn_state, actor_params, pool: Array, s0: Array
             ) -> Tuple[Any, Any, Dict[str, Array]]:
        def loss_fn(params):
            out = self.core.obj_eval(params, dyn_state, actor_params, pool)
            # certify: violations (masked obj > 0) descend; keep s0 feasible
            viol = jnp.mean(jax.nn.relu(out['obj']) * out['mask'].astype(jnp.float32))
            feas = jax.nn.relu(self.core.barrier(params, s0[None])[0] + 0.1)
            return viol + feas, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(h_params)
        updates, opt_state = self.tx.update(grads, opt_state, h_params)
        h_params = optax.apply_updates(h_params, updates)
        info = {
            'Barrier/cert_loss': loss,
            'Barrier/max_obj': out['max_obj'],
            'Barrier/mean_h': jnp.mean(out['h']),
        }
        return h_params, opt_state, info


class PolicyAdvTraining:
    """Adversarial policy regularization: penalize U at worst-case states
    (reference: optimizers.py:470-537)."""

    def __init__(self, core: CrabsCore, coef: float = 1.0) -> None:
        self.core = core
        self.coef = coef

    def loss(self, actor_params, h_params, dyn_state, pool: Array) -> Array:
        u = self.core.u(h_params, dyn_state, actor_params, pool)
        return self.coef * jnp.mean(jax.nn.relu(u + self.core.eps))


__all__ = [
    'Barrier', 'CrabsCore', 'StateBoxState', 'make_state_box',
    'LangevinState', 'SLangevinOptimizer', 'SSampleOptimizer', 'SGradOptimizer',
    'BarrierCertOptimizer', 'PolicyAdvTraining',
]
