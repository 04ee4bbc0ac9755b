"""COptiDICE — constrained offline stationary-distribution correction.

Counterpart of the reference COptiDICE (reference:
omnisafe/algorithms/offline/coptidice.py:40-323): ν/χ value networks,
f-divergence closures (kl / softchi / chisquare), weighted BC on the
corrected distribution, a cost-bound λ multiplier and a KL-budget τ
temperature — every update is pure and runs inside the jitted epoch scan.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omnisafe_tpu.algorithms.offline.base import BaseOffline
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.offline.dataset import OfflineDatasetWithInit
from omnisafe_tpu.models.actor import GaussianLearningActor
from omnisafe_tpu.models.critic import VCritic

Array = jax.Array


def get_f_divergence_fns(fn_type: str) -> Tuple[Callable, Callable]:
    """(reference: coptidice.py:239-276)."""
    if fn_type == 'kl':
        fn = lambda x: x * jnp.log(x + 1e-10)
        fn_inv = lambda x: jnp.exp(x - 1.0)
    elif fn_type == 'softchi':
        fn = lambda x: jnp.where(
            x < 1.0, x * (jnp.log(x + 1e-10) - 1.0) + 1.0, 0.5 * jnp.square(x - 1.0)
        )
        fn_inv = lambda x: jnp.where(x < 0.0, jnp.exp(jnp.minimum(x, 0.0)), x + 1.0)
    elif fn_type == 'chisquare':
        fn = lambda x: 0.5 * jnp.square(x - 1.0)
        fn_inv = lambda x: x + 1.0
    else:
        raise NotImplementedError(f'f-divergence {fn_type!r} not supported')
    return fn, fn_inv


@struct.dataclass
class COptiDICEState:
    actor: Any
    actor_opt: Any
    nu: Any
    nu_opt: Any
    chi: Any
    chi_opt: Any
    lamb: Array
    lamb_opt: Any
    tau: Array
    tau_opt: Any


@registry.register
class COptiDICE(BaseOffline):
    """Offline constrained policy via stationary-distribution correction."""

    _dataset_cls = OfflineDatasetWithInit

    def _init_model(self) -> None:
        cfgs = self._cfgs.model_cfgs
        act_dim = self._adapter.action_space.shape[0]
        self._actor = GaussianLearningActor(
            act_dim=act_dim,
            hidden_sizes=tuple(cfgs.actor.hidden_sizes),
            activation=cfgs.actor.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._nu_net = VCritic(
            hidden_sizes=tuple(cfgs.nu.hidden_sizes),
            activation=cfgs.nu.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._chi_net = VCritic(
            hidden_sizes=tuple(cfgs.chi.hidden_sizes),
            activation=cfgs.chi.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._actor_tx = optax.adam(float(cfgs.actor.lr))
        self._nu_tx = optax.adam(float(cfgs.nu.lr))
        self._chi_tx = optax.adam(float(cfgs.chi.lr))
        self._lamb_tx = optax.adam(float(cfgs.lamb.lr))
        self._tau_tx = optax.adam(float(cfgs.tau.lr))
        self._fn, self._fn_inv = get_f_divergence_fns(str(self._cfgs.algo_cfgs.fn_type))

    def _register_extra_keys(self, log) -> None:
        for key in ['Loss/Loss_actor', 'Loss/Loss_Nu', 'Loss/Loss_Chi', 'Loss/Loss_Lamb',
                    'Loss/Loss_Tau', 'Train/CostUB', 'Train/KL_divergence', 'Train/tau',
                    'Train/lagrange_multiplier', 'Train/PolicyStd']:
            log.register_key(key)

    def _init_state(self) -> COptiDICEState:
        cfgs = self._cfgs.model_cfgs
        self._key, k1, k2, k3 = jax.random.split(self._key, 4)
        obs0 = jnp.zeros((1, self._adapter.observation_space.shape[0]))
        actor = self._actor.init(k1, obs0)
        nu = self._nu_net.init(k2, obs0)
        chi = self._chi_net.init(k3, obs0)
        lamb = jnp.clip(jnp.asarray(float(cfgs.lamb.init)), 0.0, 1e3)
        tau = jnp.asarray(float(cfgs.tau.init) + 1e-6)
        return COptiDICEState(
            actor=actor, actor_opt=self._actor_tx.init(actor),
            nu=nu, nu_opt=self._nu_tx.init(nu),
            chi=chi, chi_opt=self._chi_tx.init(chi),
            lamb=lamb, lamb_opt=self._lamb_tx.init(lamb),
            tau=tau, tau_opt=self._tau_tx.init(tau),
        )

    def _advantage(self, reward, cost, done, nu, nu_next, lamb) -> Array:
        """e_λ(s,a) (reference: coptidice.py:221-236)."""
        gamma = float(self._cfgs.algo_cfgs.gamma)
        return reward - lamb * cost + (1.0 - done) * gamma * nu_next - nu

    def _w_sa(self, adv: Array) -> Array:
        alpha = float(self._cfgs.algo_cfgs.alpha)
        return jax.nn.relu(self._fn_inv(adv / alpha))

    # pylint: disable-next=too-many-locals,too-many-statements
    def _train_step(self, state: COptiDICEState, batch, key: Array
                    ) -> Tuple[COptiDICEState, Dict[str, Array]]:
        del key
        algo = self._cfgs.algo_cfgs
        obs, action, reward, cost, next_obs, done, init_obs = batch
        gamma, alpha = float(algo.gamma), float(algo.alpha)
        batch_size = obs.shape[0]
        lamb = jax.lax.stop_gradient(state.lamb)

        # ν update (reference: coptidice.py:131-146)
        def nu_loss_fn(nu_params):
            nu = self._nu_net.apply(nu_params, obs)
            nu_next = self._nu_net.apply(nu_params, next_obs)
            nu_init = self._nu_net.apply(nu_params, init_obs)
            adv = self._advantage(reward, cost, done, nu, nu_next, lamb)
            w_sa = self._w_sa(adv)
            loss = (
                (1.0 - gamma) * jnp.mean(nu_init)
                - alpha * jnp.mean(self._fn(w_sa))
                + jnp.mean(w_sa * adv)
            )
            return loss, (adv, w_sa)

        (nu_loss, (adv, w_sa)), nu_grads = jax.value_and_grad(nu_loss_fn, has_aux=True)(state.nu)
        nu_grads = self._pmean(nu_grads)
        updates, nu_opt = self._nu_tx.update(nu_grads, state.nu_opt, state.nu)
        nu_params = optax.apply_updates(state.nu, updates)
        w_sa_ng = jax.lax.stop_gradient(w_sa)

        # χ + τ update (reference: coptidice.py:147-181)
        def chi_loss_fn(chi_params):
            chi = self._chi_net.apply(chi_params, obs)
            chi_next = self._chi_net.apply(chi_params, next_obs)
            chi_init = self._chi_net.apply(chi_params, init_obs)
            ell = (1.0 - gamma) * chi_init + w_sa_ng * (
                cost + gamma * (1.0 - done) * chi_next - chi
            )
            logist = ell / jax.lax.stop_gradient(state.tau)
            weights = jax.nn.softmax(logist, axis=0) * batch_size
            log_weights = jax.nn.log_softmax(logist, axis=0) + jnp.log(float(batch_size))
            kl = jnp.mean(weights * log_weights - weights + 1.0)
            loss = jnp.mean(weights * ell)
            return loss, kl

        (chi_loss, kl_div), chi_grads = jax.value_and_grad(chi_loss_fn, has_aux=True)(state.chi)
        chi_grads = self._pmean(chi_grads)
        updates, chi_opt = self._chi_tx.update(chi_grads, state.chi_opt, state.chi)
        chi_params = optax.apply_updates(state.chi, updates)
        kl_div = jax.lax.stop_gradient(kl_div)

        cost_ub = jnp.mean(w_sa_ng * cost)

        def tau_loss_fn(tau):
            return -tau * (kl_div - float(algo.cost_ub_eps))

        tau_loss, tau_grad = jax.value_and_grad(tau_loss_fn)(state.tau)
        tau_grad = self._pmean(tau_grad)
        updates, tau_opt = self._tau_tx.update(tau_grad, state.tau_opt, state.tau)
        tau = jnp.maximum(optax.apply_updates(state.tau, updates), 1e-6)

        # λ update (reference: coptidice.py:168-189)
        def lamb_loss_fn(lamb):
            return -lamb * (cost_ub - float(algo.cost_limit))

        lamb_loss, lamb_grad = jax.value_and_grad(lamb_loss_fn)(state.lamb)
        lamb_grad = self._pmean(lamb_grad)
        updates, lamb_opt = self._lamb_tx.update(lamb_grad, state.lamb_opt, state.lamb)
        new_lamb = jnp.clip(optax.apply_updates(state.lamb, updates), 0.0, 1e3)

        # actor: weighted BC (reference: coptidice.py:195-220)
        def pi_loss_fn(actor_params):
            dist = self._actor.apply(actor_params, obs)
            logp = dist.log_prob(action)
            return -jnp.mean(w_sa_ng * logp), jnp.mean(dist.scale)

        (pi_loss, std), a_grads = jax.value_and_grad(pi_loss_fn, has_aux=True)(state.actor)
        a_grads = self._pmean(a_grads)
        updates, actor_opt = self._actor_tx.update(a_grads, state.actor_opt, state.actor)
        actor = optax.apply_updates(state.actor, updates)

        new_state = COptiDICEState(
            actor=actor, actor_opt=actor_opt,
            nu=nu_params, nu_opt=nu_opt,
            chi=chi_params, chi_opt=chi_opt,
            lamb=new_lamb, lamb_opt=lamb_opt,
            tau=tau, tau_opt=tau_opt,
        )
        metrics = {
            'Loss/Loss_actor': pi_loss,
            'Loss/Loss_Nu': nu_loss,
            'Loss/Loss_Chi': chi_loss,
            'Loss/Loss_Lamb': lamb_loss,
            'Loss/Loss_Tau': tau_loss,
            'Train/CostUB': cost_ub,
            'Train/KL_divergence': kl_div,
            'Train/tau': tau,
            'Train/lagrange_multiplier': new_lamb,
            'Train/PolicyStd': std,
        }
        return new_state, metrics

    def _predict(self, state: COptiDICEState, obs: Array, key: Array) -> Array:
        del key
        return self._actor.apply(state.actor, obs).mode()


__all__ = ['COptiDICE', 'COptiDICEState', 'get_f_divergence_fns']
