"""BCQ / BCQLag — batch-constrained Q-learning.

Counterparts of the reference (reference:
omnisafe/algorithms/offline/bcq.py:40-230, bcq_lag.py:34-210): a conditional
VAE constrains actions to the data manifold, a bounded perturbation head
fine-tunes them, twin critics with the 0.75·min + 0.25·max pessimistic target
over ``sampled_action_num`` proposals; BCQLag adds a cost critic and λ ascent
on the mean predicted episode cost after ``lagrange_start_step``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omnisafe_tpu.algorithms.offline.base import BaseOffline
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.lagrange import Lagrange
from omnisafe_tpu.models.actor import VAE
from omnisafe_tpu.models.critic import QCritic
from omnisafe_tpu.models.mlp import MLP

Array = jax.Array


@struct.dataclass
class BCQState:
    vae: Any
    vae_opt: Any
    pert: Any
    pert_opt: Any
    reward_critic: Any
    target_reward_critic: Any
    rc_opt: Any
    cost_critic: Any
    target_cost_critic: Any
    cc_opt: Any
    lagrange: Any
    step: Array


@registry.register
class BCQ(BaseOffline):
    """Batch-Constrained deep Q-learning."""

    _use_cost = False

    def _init_model(self) -> None:
        cfgs = self._cfgs.model_cfgs
        act_dim = self._adapter.action_space.shape[0]
        self._vae = VAE(
            act_dim=act_dim,
            hidden_sizes=tuple(cfgs.actor.hidden_sizes),
            activation=cfgs.actor.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._pert = MLP(
            hidden_sizes=tuple(cfgs.actor.hidden_sizes),
            out_dim=act_dim,
            activation=cfgs.actor.activation,
            output_activation='tanh',
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._critic = QCritic(
            hidden_sizes=tuple(cfgs.critic.hidden_sizes),
            num_critics=2,
            activation=cfgs.critic.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._vae_tx = optax.adam(float(cfgs.actor.lr))
        self._pert_tx = optax.adam(float(cfgs.actor.lr))
        self._rc_tx = optax.adam(float(cfgs.critic.lr))
        self._cc_tx = optax.adam(float(cfgs.critic.lr))
        if self._use_cost:
            self._lagrange = Lagrange(**self._cfgs.lagrange_cfgs.todict())

    def _register_extra_keys(self, log) -> None:
        for key in ['Loss/Loss_actor', 'Loss/Loss_vae', 'Loss/Loss_recon', 'Loss/Loss_kl',
                    'Loss/Loss_reward_critic', 'Qr/data_Qr', 'Qr/current_Qr']:
            log.register_key(key)
        if self._use_cost:
            log.register_key('Loss/Loss_cost_critic')
            log.register_key('Qc/current_Qc')
            log.register_key('Metrics/LagrangeMultiplier')

    def _init_state(self) -> BCQState:
        self._key, k1, k2, k3, k4 = jax.random.split(self._key, 5)
        obs_dim = self._adapter.observation_space.shape[0]
        act_dim = self._adapter.action_space.shape[0]
        obs0, act0 = jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim))
        vae = self._vae.init(k1, obs0, act0, jax.random.key(0))
        pert = self._pert.init(k2, jnp.concatenate([obs0, act0], axis=-1))
        rc = self._critic.init(k3, obs0, act0)
        cc = self._critic.init(k4, obs0, act0)
        return BCQState(
            vae=vae, vae_opt=self._vae_tx.init(vae),
            pert=pert, pert_opt=self._pert_tx.init(pert),
            reward_critic=rc, target_reward_critic=rc, rc_opt=self._rc_tx.init(rc),
            cost_critic=cc, target_cost_critic=cc, cc_opt=self._cc_tx.init(cc),
            lagrange=self._lagrange.init() if self._use_cost else None,
            step=jnp.zeros((), jnp.int32),
        )

    def _policy(self, vae_params, pert_params, obs: Array, key: Array) -> Array:
        """(reference: perturbation_actor.py:50-61)."""
        act = self._vae.apply(vae_params, obs, key, method=VAE.predict)
        pert = self._pert.apply(pert_params, jnp.concatenate([obs, act], axis=-1))
        return act + float(self._cfgs.algo_cfgs.phi) * pert

    def _bcq_target(self, critic_params, state: BCQState, next_obs: Array, key: Array) -> Array:
        """Pessimistic max-over-proposals target (reference: bcq.py:141-160)."""
        algo = self._cfgs.algo_cfgs
        n = int(algo.sampled_action_num)
        b = next_obs.shape[0]
        rep = jnp.repeat(next_obs, n, axis=0)
        next_act = self._policy(state.vae, state.pert, rep, key)
        q = self._critic.apply(critic_params, rep, next_act)  # (2, B*n)
        w = float(algo.minimum_weighting)
        q = w * jnp.min(q, axis=0) + (1.0 - w) * jnp.max(q, axis=0)
        return jnp.max(q.reshape(b, n), axis=1)

    # pylint: disable-next=too-many-locals
    def _train_step(self, state: BCQState, batch, key: Array
                    ) -> Tuple[BCQState, Dict[str, Array]]:
        algo = self._cfgs.algo_cfgs
        obs, action, reward, cost, next_obs, done = batch[:6]
        k_t, k_tc, k_vae, k_pi = jax.random.split(key, 4)

        # reward critic (reference: bcq.py:133-177)
        target_q = self._bcq_target(state.target_reward_critic, state, next_obs, k_t)
        target = jax.lax.stop_gradient(reward + (1.0 - done) * float(algo.gamma) * target_q)

        def rc_loss(params):
            q = self._critic.apply(params, obs, action)
            return jnp.sum(jnp.mean(jnp.square(q - target[None]), axis=1)), jnp.mean(q[0])

        (r_loss, q_data), r_grads = jax.value_and_grad(rc_loss, has_aux=True)(state.reward_critic)
        r_grads = self._pmean(r_grads)
        updates, rc_opt = self._rc_tx.update(r_grads, state.rc_opt, state.reward_critic)
        reward_critic = optax.apply_updates(state.reward_critic, updates)

        # cost critic (reference: bcq_lag.py:100-148)
        if self._use_cost:
            target_qc = self._bcq_target(state.target_cost_critic, state, next_obs, k_tc)
            target_c = jax.lax.stop_gradient(
                cost + (1.0 - done) * float(algo.cost_gamma) * target_qc
            )

            def cc_loss(params):
                q = self._critic.apply(params, obs, action)
                return jnp.sum(jnp.mean(jnp.square(q - target_c[None]), axis=1))

            c_loss, c_grads = jax.value_and_grad(cc_loss)(state.cost_critic)
            c_grads = self._pmean(c_grads)
            updates, cc_opt = self._cc_tx.update(c_grads, state.cc_opt, state.cost_critic)
            cost_critic = optax.apply_updates(state.cost_critic, updates)
        else:
            c_loss, cost_critic, cc_opt = jnp.zeros(()), state.cost_critic, state.cc_opt

        # VAE (reference: bcq.py:179-187)
        def vae_loss(params):
            recon, kl = self._vae.apply(params, obs, action, k_vae, method=VAE.loss)
            return recon + kl, (recon, kl)

        (v_loss, (recon, kl)), v_grads = jax.value_and_grad(vae_loss, has_aux=True)(state.vae)
        v_grads = self._pmean(v_grads)
        updates, vae_opt = self._vae_tx.update(v_grads, state.vae_opt, state.vae)
        vae = optax.apply_updates(state.vae, updates)

        # perturbation actor (reference: bcq.py:188-196, bcq_lag.py:149-170)
        lagrange = state.lagrange

        def pi_loss(pert_params):
            act = self._policy(vae, pert_params, obs, k_pi)
            qr = self._critic.apply(reward_critic, obs, act)[0]
            if self._use_cost:
                qc = self._critic.apply(cost_critic, obs, act)[0]
                return -jnp.mean(qr - lagrange.multiplier * qc), (qr, qc)
            return -jnp.mean(qr), (qr, jnp.zeros_like(qr))

        (a_loss, (qr_curr, qc_curr)), p_grads = jax.value_and_grad(pi_loss, has_aux=True)(
            state.pert
        )
        p_grads = self._pmean(p_grads)
        updates, pert_opt = self._pert_tx.update(p_grads, state.pert_opt, state.pert)
        pert = optax.apply_updates(state.pert, updates)

        # λ ascent after warmup (reference: bcq_lag.py:164-170)
        if self._use_cost:
            new_lag = self._lagrange.update(lagrange, jnp.mean(qc_curr))
            start = int(algo.lagrange_start_step)
            lagrange = jax.tree.map(
                lambda new, old: jnp.where(state.step > start, new, old), new_lag, lagrange
            )

        polyak = float(algo.polyak)
        ema = lambda t, s: jax.tree.map(lambda a, b: (1 - polyak) * a + polyak * b, t, s)
        new_state = state.replace(
            vae=vae, vae_opt=vae_opt, pert=pert, pert_opt=pert_opt,
            reward_critic=reward_critic, rc_opt=rc_opt,
            target_reward_critic=ema(state.target_reward_critic, reward_critic),
            cost_critic=cost_critic, cc_opt=cc_opt,
            target_cost_critic=ema(state.target_cost_critic, cost_critic),
            lagrange=lagrange, step=state.step + 1,
        )
        metrics = {
            'Loss/Loss_actor': a_loss,
            'Loss/Loss_vae': v_loss,
            'Loss/Loss_recon': recon,
            'Loss/Loss_kl': kl,
            'Loss/Loss_reward_critic': r_loss,
            'Qr/data_Qr': q_data,
            'Qr/current_Qr': jnp.mean(qr_curr),
        }
        if self._use_cost:
            metrics['Loss/Loss_cost_critic'] = c_loss
            metrics['Qc/current_Qc'] = jnp.mean(qc_curr)
            metrics['Metrics/LagrangeMultiplier'] = lagrange.multiplier
        return new_state, metrics

    def _predict(self, state: BCQState, obs: Array, key: Array) -> Array:
        return self._policy(state.vae, state.pert, obs, key)


@registry.register
class BCQLag(BCQ):
    """BCQ with a Lagrangian cost critic (reference: bcq_lag.py:34-210)."""

    _use_cost = True


__all__ = ['BCQ', 'BCQLag', 'BCQState']
