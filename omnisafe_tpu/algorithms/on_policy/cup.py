"""CUP — Constrained Update Projection.

Counterpart of the reference CUP (reference:
omnisafe/algorithms/on_policy/first_order/cup.py:30-200): a standard PPO
update (phase 1, with naive Lagrange ascent on the multiplier) followed by a
KL-projection phase that minimizes ``λ·coef·ratio·adv_c + KL(new||old)``
against the post-phase-1 policy, with its own KL early stop.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.mixins import LagrangeMixin
from omnisafe_tpu.algorithms.on_policy.policy_gradient import OnPolicyTrainState, _apply_tx
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch

Array = jax.Array


@registry.register
class CUP(LagrangeMixin, PPO):
    """Two-phase constrained update projection."""

    def _compute_adv_surrogate(self, extra: Any, adv_r: Array, adv_c: Array) -> Array:
        """Phase 1 is plain PPO on the reward advantage (reference: cup.py)."""
        del extra, adv_c
        return adv_r

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Loss/Loss_pi_c', delta=True)
        log.register_key('Train/SecondStepStopIter')
        log.register_key('Train/SecondStepEntropy')
        log.register_key('Train/SecondStepPolicyRatio', min_and_max=True)

    # pylint: disable-next=too-many-locals,too-many-statements
    def _update_program(self, state: OnPolicyTrainState, batch: OnPolicyBatch, Jc: Array, lr: Array):
        state, metrics = super()._update_program(state, batch, Jc, lr)

        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        extra = state.extra  # multiplier already ascended in phase 1
        batch = self._standardize_batch(batch)
        coef = (1.0 - float(algo.gamma) * float(algo.lam)) / (1.0 - float(algo.gamma))
        penalty = extra.multiplier

        old_dist = jax.lax.stop_gradient(ac.actor.apply(state.params.actor, batch.obs))
        n = batch.obs.shape[0]
        batch_size = min(int(algo.batch_size), n)
        num_minibatches = max(n // batch_size, 1)
        update_iters = int(algo.update_iters)
        target_kl = float(algo.target_kl)
        kl_early_stop = bool(algo.get('kl_early_stop', False))

        key, *iter_keys = jax.random.split(state.key, update_iters + 1)
        iter_keys = jnp.stack(iter_keys)

        def proj_loss(actor_params, mb_idx):
            """(reference: cup.py:74-131)."""
            obs, act, logp = batch.obs[mb_idx], batch.act[mb_idx], batch.logp[mb_idx]
            adv_c = batch.adv_c[mb_idx]
            old_mb = jax.tree.map(lambda x: x[mb_idx], old_dist)
            dist = ac.actor.apply(actor_params, obs)
            ratio = jnp.exp(dist.log_prob(act) - logp)
            kl = dist.kl(old_mb)
            loss = jnp.mean(penalty * coef * ratio * adv_c + kl)
            aux = {'entropy': jnp.mean(dist.entropy()), 'ratio': jnp.mean(ratio)}
            return loss, aux

        def minibatch_step(carry, mb_idx):
            actor_params, a_opt = carry
            (loss, aux), grads = jax.value_and_grad(proj_loss, has_aux=True)(
                actor_params, mb_idx
            )
            grads = self._pmean(grads)
            actor_params, a_opt = _apply_tx(self._actor_tx, grads, a_opt, actor_params, lr)
            return (actor_params, a_opt), {
                'Loss/Loss_pi_c': loss,
                'Train/SecondStepEntropy': aux['entropy'],
                'Train/SecondStepPolicyRatio': aux['ratio'],
            }

        def iter_step(carry, iter_key):
            actor_params, a_opt, stop, count, final_kl = carry

            def run(_):
                perm = jax.random.permutation(iter_key, n)
                idx = perm[: num_minibatches * batch_size].reshape(num_minibatches, batch_size)
                (new_actor, na), mb_metrics = jax.lax.scan(
                    minibatch_step, (actor_params, a_opt), idx
                )
                new_dist = ac.actor.apply(new_actor, batch.obs)
                kl = self._pmean(jnp.mean(old_dist.kl(new_dist)))
                return new_actor, na, kl, jax.tree.map(jnp.mean, mb_metrics)

            def skip(_):
                zeros = {
                    'Loss/Loss_pi_c': jnp.zeros(()),
                    'Train/SecondStepEntropy': jnp.zeros(()),
                    'Train/SecondStepPolicyRatio': jnp.zeros(()),
                }
                return actor_params, a_opt, final_kl, zeros

            new_actor, a_opt2, kl, mb_metrics = jax.lax.cond(stop, skip, run, None)
            executed = jnp.logical_not(stop)
            count = count + executed.astype(jnp.int32)
            new_stop = jnp.logical_or(stop, kl > target_kl) if kl_early_stop else stop
            out = dict(mb_metrics)
            out['_executed'] = executed.astype(jnp.float32)
            return (new_actor, a_opt2, new_stop, count, kl), out

        init = (state.params.actor, state.actor_opt, jnp.zeros((), bool),
                jnp.zeros((), jnp.int32), jnp.zeros(()))
        (actor_params, a_opt, _, count, _), iter_metrics = jax.lax.scan(
            iter_step, init, iter_keys
        )

        weights = iter_metrics.pop('_executed')
        total = jnp.maximum(jnp.sum(weights), 1.0)
        phase2 = {k: self._pmean(jnp.sum(v * weights) / total) for k, v in iter_metrics.items()}
        phase2['Train/SecondStepStopIter'] = count.astype(jnp.float32)
        metrics = dict(metrics)
        metrics.update(phase2)

        new_state = state.replace(
            params=state.params.replace(actor=actor_params),
            actor_opt=a_opt,
            key=key,
        )
        return new_state, metrics


__all__ = ['CUP']
