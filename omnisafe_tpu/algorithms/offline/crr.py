"""CRR / C-CRR — critic-regularized regression.

Counterparts of the reference (reference:
omnisafe/algorithms/offline/crr.py:40-230, c_crr.py:40-230): advantage-
weighted behavior cloning with ``exp(adv/β)`` weights, where the advantage is
the data action's Q minus the mean Q over sampled policy actions; C-CRR adds
a cost critic and weights by ``exp(adv_r - λ adv_c)`` with λ ascending on the
mean predicted cost after ``lagrange_start_step``.
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
from omnisafe_tpu.models.actor import GaussianLearningActor
from omnisafe_tpu.models.critic import QCritic

Array = jax.Array


@struct.dataclass
class CRRState:
    actor: Any
    actor_opt: Any
    reward_critic: Any
    target_reward_critic: Any
    rc_opt: Any
    cost_critic: Any
    target_cost_critic: Any
    cc_opt: Any
    lagrange: Any
    step: Array


@registry.register
class CRR(BaseOffline):
    """Critic-Regularized Regression."""

    _use_cost = False

    def _init_model(self) -> None:
        cfgs = self._cfgs.model_cfgs
        act_dim = self._adapter.action_space.shape[0]
        self._actor = GaussianLearningActor(
            act_dim=act_dim,
            hidden_sizes=tuple(cfgs.actor.hidden_sizes),
            activation=cfgs.actor.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._critic = QCritic(
            hidden_sizes=tuple(cfgs.critic.hidden_sizes),
            num_critics=2,
            activation=cfgs.critic.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._actor_tx = optax.adam(float(cfgs.actor.lr))
        self._rc_tx = optax.adam(float(cfgs.critic.lr))
        self._cc_tx = optax.adam(float(cfgs.critic.lr))
        if self._use_cost:
            self._lagrange = Lagrange(**self._cfgs.lagrange_cfgs.todict())

    def _register_extra_keys(self, log) -> None:
        for key in ['Loss/Loss_actor', 'Loss/Loss_reward_critic', 'Qr/data_Qr']:
            log.register_key(key)
        if self._use_cost:
            log.register_key('Loss/Loss_cost_critic')
            log.register_key('Qc/data_Qc')
            log.register_key('Metrics/LagrangeMultiplier')

    def _init_state(self) -> CRRState:
        self._key, k1, k2, k3 = jax.random.split(self._key, 4)
        obs_dim = self._adapter.observation_space.shape[0]
        act_dim = self._adapter.action_space.shape[0]
        obs0, act0 = jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim))
        actor = self._actor.init(k1, obs0)
        rc = self._critic.init(k2, obs0, act0)
        cc = self._critic.init(k3, obs0, act0)
        return CRRState(
            actor=actor, actor_opt=self._actor_tx.init(actor),
            reward_critic=rc, target_reward_critic=rc, rc_opt=self._rc_tx.init(rc),
            cost_critic=cc, target_cost_critic=cc, cc_opt=self._cc_tx.init(cc),
            lagrange=self._lagrange.init() if self._use_cost else None,
            step=jnp.zeros((), jnp.int32),
        )

    def _mean_sampled_q(self, critic_params, actor_params, obs: Array, key: Array) -> Array:
        """Mean Q over sampled policy actions (reference: crr.py:160-172)."""
        n = int(self._cfgs.algo_cfgs.sampled_action_num)
        rep = jnp.repeat(obs, n, axis=0)
        dist = self._actor.apply(actor_params, rep)
        act = dist.sample(key)
        q = jnp.min(self._critic.apply(critic_params, rep, act), axis=0)
        return jnp.mean(q.reshape(obs.shape[0], n), axis=1)

    def _td_update(self, critic_params, target_params, tx, opt, actor_params,
                   obs, action, signal, next_obs, done, gamma, key):
        dist = self._actor.apply(actor_params, next_obs)
        next_act = dist.sample(key)
        next_q = jnp.min(self._critic.apply(target_params, next_obs, next_act), axis=0)
        target = jax.lax.stop_gradient(signal + (1.0 - done) * gamma * next_q)

        def loss_fn(params):
            q = self._critic.apply(params, obs, action)
            return jnp.sum(jnp.mean(jnp.square(q - target[None]), axis=1)), jnp.mean(q[0])

        (loss, q_data), grads = jax.value_and_grad(loss_fn, has_aux=True)(critic_params)
        grads = self._pmean(grads)
        updates, opt = tx.update(grads, opt, critic_params)
        return optax.apply_updates(critic_params, updates), opt, loss, q_data

    # pylint: disable-next=too-many-locals
    def _train_step(self, state: CRRState, batch, key: Array
                    ) -> Tuple[CRRState, Dict[str, Array]]:
        algo = self._cfgs.algo_cfgs
        obs, action, reward, cost, next_obs, done = batch[:6]
        k_r, k_c, k_s, k_sc = jax.random.split(key, 4)

        reward_critic, rc_opt, r_loss, qr_data_mean = self._td_update(
            state.reward_critic, state.target_reward_critic, self._rc_tx, state.rc_opt,
            state.actor, obs, action, reward, next_obs, done, float(algo.gamma), k_r,
        )
        if self._use_cost:
            cost_critic, cc_opt, c_loss, qc_data_mean = self._td_update(
                state.cost_critic, state.target_cost_critic, self._cc_tx, state.cc_opt,
                state.actor, obs, action, cost, next_obs, done,
                float(algo.get('cost_gamma', algo.gamma)), k_c,
            )
        else:
            cost_critic, cc_opt = state.cost_critic, state.cc_opt
            c_loss, qc_data_mean = jnp.zeros(()), jnp.zeros(())

        # advantage-weighted regression (reference: crr.py:157-185, c_crr.py:135-190)
        qr_data = jnp.min(self._critic.apply(reward_critic, obs, action), axis=0)
        adv_r = qr_data - self._mean_sampled_q(reward_critic, state.actor, obs, k_s)
        if self._use_cost:
            qc_data = jnp.min(self._critic.apply(cost_critic, obs, action), axis=0)
            mean_qc = self._mean_sampled_q(cost_critic, state.actor, obs, k_sc)
            adv_c = qc_data - mean_qc
            lagrange = state.lagrange
            exp_adv = jnp.exp(
                jax.lax.stop_gradient(adv_r - lagrange.multiplier * adv_c)
                / float(algo.beta)
            )
        else:
            lagrange = state.lagrange
            mean_qc = jnp.zeros(())
            exp_adv = jnp.exp(jax.lax.stop_gradient(adv_r) / float(algo.beta))
        exp_adv = jnp.clip(exp_adv, 0.0, 1e10)

        def pi_loss(actor_params):
            dist = self._actor.apply(actor_params, obs)
            bc_loss = -dist.log_prob(action)
            return jnp.mean(exp_adv * bc_loss)

        a_loss, a_grads = jax.value_and_grad(pi_loss)(state.actor)
        a_grads = self._pmean(a_grads)
        updates, actor_opt = self._actor_tx.update(a_grads, state.actor_opt, state.actor)
        actor = optax.apply_updates(state.actor, updates)

        if self._use_cost:
            new_lag = self._lagrange.update(lagrange, jnp.mean(mean_qc))
            start = int(algo.lagrange_start_step)
            lagrange = jax.tree.map(
                lambda new, old: jnp.where(state.step > start, new, old), new_lag, lagrange
            )

        polyak = float(algo.polyak)
        ema = lambda t, s: jax.tree.map(lambda a, b: (1 - polyak) * a + polyak * b, t, s)
        new_state = state.replace(
            actor=actor, actor_opt=actor_opt,
            reward_critic=reward_critic, rc_opt=rc_opt,
            target_reward_critic=ema(state.target_reward_critic, reward_critic),
            cost_critic=cost_critic, cc_opt=cc_opt,
            target_cost_critic=ema(state.target_cost_critic, cost_critic),
            lagrange=lagrange, step=state.step + 1,
        )
        metrics = {
            'Loss/Loss_actor': a_loss,
            'Loss/Loss_reward_critic': r_loss,
            'Qr/data_Qr': qr_data_mean,
        }
        if self._use_cost:
            metrics['Loss/Loss_cost_critic'] = c_loss
            metrics['Qc/data_Qc'] = qc_data_mean
            metrics['Metrics/LagrangeMultiplier'] = lagrange.multiplier
        return new_state, metrics

    def _predict(self, state: CRRState, obs: Array, key: Array) -> Array:
        del key
        return self._actor.apply(state.actor, obs).mode()


@registry.register
class CCRR(CRR):
    """Constrained CRR (reference: c_crr.py:40-230)."""

    _use_cost = True


__all__ = ['CRR', 'CCRR', 'CRRState']
