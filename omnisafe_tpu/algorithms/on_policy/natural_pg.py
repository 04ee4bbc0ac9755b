"""Natural Policy Gradient — the second-order on-policy template.

Counterpart of the reference NaturalPG (reference:
omnisafe/algorithms/on_policy/base/natural_pg.py:32-231): the actor takes a
full-batch natural-gradient step (CG on Fisher-vector products, scaled into
the KL trust region), then the critics sweep their minibatches for a fixed
number of iterations.  The FVP is a jvp-of-grad closure instead of the
reference's double backward, and the whole update — CG loop included — is one
compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.policy_gradient import (
    OnPolicyTrainState,
    PolicyGradient,
    _apply_tx,
)
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch
from omnisafe_tpu.ops.trust_region import flatten_params, make_fvp, npg_direction

Array = jax.Array


@registry.register
class NaturalPG(PolicyGradient):
    """Natural policy gradient with KL trust-region scaling."""

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Misc/Alpha')
        log.register_key('Misc/FinalStepNorm')
        log.register_key('Misc/xHx')
        log.register_key('Misc/gradient_norm')
        log.register_key('Misc/H_inv_g')

    # -------------------------------------------------------------- tr step
    def _trust_region_step(
        self, params: Any, batch: OnPolicyBatch, extra: Any, Jc: Array
    ) -> Tuple[Any, Dict[str, Array]]:
        """Full-batch natural-gradient actor step
        (reference: natural_pg.py:121-180)."""
        del Jc
        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        obs, act, logp = batch.obs, batch.act, batch.logp
        adv = self._compute_adv_surrogate(extra, batch.adv_r, batch.adv_c)
        theta, unravel = flatten_params(params.actor)

        def loss_at(flat: Array) -> Array:
            loss, _ = self._loss_pi(unravel(flat), extra, obs, act, logp, adv)
            return loss

        loss_before, aux = self._loss_pi(params.actor, extra, obs, act, logp, adv)
        loss_before = self._pmean(loss_before)
        grads = -self._pmean(jax.grad(loss_at)(theta))

        fvp_obs = obs[:: int(algo.fvp_sample_freq)]
        p_dist_fvp = jax.lax.stop_gradient(ac.actor.apply(params.actor, fvp_obs))

        def kl_at(flat: Array) -> Array:
            dist = ac.actor.apply(unravel(flat), fvp_obs)
            return jnp.mean(p_dist_fvp.kl(dist))

        fvp = make_fvp(kl_at, theta, float(algo.cg_damping), self._pmean)
        step_direction, x, xHx, alpha = npg_direction(
            grads, fvp, int(algo.cg_iters), float(algo.target_kl)
        )

        theta_new = theta + step_direction
        p_dist = jax.lax.stop_gradient(ac.actor.apply(params.actor, obs))
        new_dist = ac.actor.apply(unravel(theta_new), obs)
        kl = self._pmean(jnp.mean(p_dist.kl(new_dist)))
        loss_after, _ = self._loss_pi(unravel(theta_new), extra, obs, act, logp, adv)

        metrics = {
            'Loss/Loss_pi': self._pmean(loss_after),
            'Train/KL': kl,
            'Train/Entropy': aux['entropy'],
            'Train/PolicyRatio': aux['ratio'],
            'Train/PolicyStd': aux['std'],
            'Misc/Alpha': alpha,
            'Misc/FinalStepNorm': jnp.linalg.norm(step_direction),
            'Misc/xHx': xHx,
            'Misc/gradient_norm': jnp.linalg.norm(grads),
            'Misc/H_inv_g': jnp.linalg.norm(x),
        }
        return unravel(theta_new), metrics

    # ------------------------------------------------------------- program
    def _update_program(self, state: OnPolicyTrainState, batch: OnPolicyBatch, Jc: Array, lr: Array):
        """Actor trust-region step first, then the critic-only minibatch sweep
        (reference: natural_pg.py:184-230)."""
        del lr  # the trust-region step sets its own scale
        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        extra, extra_metrics = self._update_extra(state.extra, Jc)
        batch = self._standardize_batch(batch)

        new_actor, tr_metrics = self._trust_region_step(state.params, batch, extra, Jc)
        params = state.params.replace(actor=new_actor)

        n = batch.obs.shape[0]
        batch_size = min(int(algo.batch_size), n)
        num_minibatches = max(n // batch_size, 1)
        update_iters = int(algo.update_iters)
        use_cost = bool(algo.use_cost)

        key, *iter_keys = jax.random.split(state.key, update_iters + 1)
        iter_keys = jnp.stack(iter_keys)

        def minibatch_step(carry, mb_idx):
            params, r_opt, c_opt = carry
            mb_obs = batch.obs[mb_idx]
            r_loss, r_grads = jax.value_and_grad(self._critic_loss)(
                params.reward_critic, ac.reward_critic, mb_obs, batch.target_value_r[mb_idx]
            )
            r_grads = self._pmean(r_grads)
            new_rc, r_opt = _apply_tx(
                self._reward_critic_tx, r_grads, r_opt, params.reward_critic, self._critic_lr
            )
            if use_cost:
                c_loss, c_grads = jax.value_and_grad(self._critic_loss)(
                    params.cost_critic, ac.cost_critic, mb_obs, batch.target_value_c[mb_idx]
                )
                c_grads = self._pmean(c_grads)
                new_cc, c_opt = _apply_tx(
                    self._cost_critic_tx, c_grads, c_opt, params.cost_critic, self._critic_lr
                )
            else:
                c_loss, new_cc = jnp.zeros(()), params.cost_critic
            params = params.replace(reward_critic=new_rc, cost_critic=new_cc)
            return (params, r_opt, c_opt), {'Loss/Loss_reward_critic': r_loss,
                                            'Loss/Loss_cost_critic': c_loss}

        def iter_step(carry, iter_key):
            params, r_opt, c_opt = carry
            perm = jax.random.permutation(iter_key, n)
            idx = perm[: num_minibatches * batch_size].reshape(num_minibatches, batch_size)
            (params, r_opt, c_opt), mb_metrics = jax.lax.scan(
                minibatch_step, (params, r_opt, c_opt), idx
            )
            return (params, r_opt, c_opt), jax.tree.map(jnp.mean, mb_metrics)

        (params, r_opt, c_opt), critic_metrics = jax.lax.scan(
            iter_step, (params, state.reward_critic_opt, state.cost_critic_opt), iter_keys
        )

        metrics = dict(tr_metrics)
        metrics.update(jax.tree.map(lambda v: self._pmean(jnp.mean(v)), critic_metrics))
        metrics['Train/StopIter'] = jnp.asarray(float(update_iters))
        metrics['Value/Adv'] = jnp.mean(batch.adv_r)
        metrics.update(extra_metrics)
        metrics = jax.tree.map(self._pmean, metrics)

        new_state = state.replace(
            params=params,
            reward_critic_opt=r_opt,
            cost_critic_opt=c_opt,
            extra=extra,
            key=key,
        )
        return new_state, metrics


__all__ = ['NaturalPG']
