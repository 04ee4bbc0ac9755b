"""CPO — Constrained Policy Optimization.

Counterpart of the reference CPO (reference:
omnisafe/algorithms/on_policy/second_order/cpo.py:33-462): two CG solves
(reward and cost directions), the 5-case feasibility analysis with the
analytic 2x2 dual QP, and a 20-trial line search enforcing both the cost and
KL constraints.  The case analysis and dual solution run branch-free inside
the compiled program (omnisafe_tpu/ops/trust_region.py:cpo_case_and_direction)
and the line search is a single vmapped candidate evaluation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch
from omnisafe_tpu.ops.trust_region import (
    cpo_case_and_direction,
    flatten_params,
    line_search,
    make_fvp,
)
from omnisafe_tpu.utils.math import conjugate_gradients

Array = jax.Array


@registry.register
class CPO(TRPO):
    """Constrained trust-region policy update."""

    _search_total_steps = 20

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        for key in ['Misc/cost_gradient_norm', 'Misc/Lambda_star', 'Misc/Nu_star',
                    'Misc/OptimCase', 'Misc/A', 'Misc/B', 'Misc/q', 'Misc/r', 'Misc/s']:
            log.register_key(key)

    def _loss_pi_cost(self, actor_params: Any, obs: Array, act: Array, logp: Array,
                      adv_c: Array) -> Array:
        """Cost surrogate ``E[ratio * adv_c]`` (reference: cpo.py:182-212)."""
        dist = self._actor_critic.actor.apply(actor_params, obs)
        ratio = jnp.exp(dist.log_prob(act) - logp)
        return jnp.mean(ratio * adv_c)

    # pylint: disable-next=too-many-locals,too-many-statements
    def _trust_region_step(
        self, params: Any, batch: OnPolicyBatch, extra: Any, Jc: Array
    ) -> Tuple[Any, Dict[str, Array]]:
        """(reference: cpo.py:340-462)."""
        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        obs, act, logp = batch.obs, batch.act, batch.logp
        adv_r, adv_c = batch.adv_r, batch.adv_c
        target_kl = float(algo.target_kl)
        theta, unravel = flatten_params(params.actor)

        def loss_r_at(flat: Array) -> Array:
            loss, _ = self._loss_pi(unravel(flat), extra, obs, act, logp, adv_r)
            return loss

        def loss_c_at(flat: Array) -> Array:
            return self._loss_pi_cost(unravel(flat), obs, act, logp, adv_c)

        loss_reward_before, aux = self._loss_pi(params.actor, extra, obs, act, logp, adv_r)
        loss_reward_before = self._pmean(loss_reward_before)
        loss_cost_before = self._pmean(loss_c_at(theta))

        grads = -self._pmean(jax.grad(loss_r_at)(theta))
        b_grads = self._pmean(jax.grad(loss_c_at)(theta))

        fvp_obs = obs[:: int(algo.fvp_sample_freq)]
        p_dist_fvp = jax.lax.stop_gradient(ac.actor.apply(params.actor, fvp_obs))

        def kl_at(flat: Array) -> Array:
            dist = ac.actor.apply(unravel(flat), fvp_obs)
            return jnp.mean(p_dist_fvp.kl(dist))

        fvp = make_fvp(kl_at, theta, float(algo.cg_damping), self._pmean)
        cg_iters = int(algo.cg_iters)
        x = conjugate_gradients(fvp, grads, cg_iters)
        p = conjugate_gradients(fvp, b_grads, cg_iters)
        q = jnp.dot(x, fvp(x))
        r = jnp.dot(grads, p)
        s = jnp.dot(b_grads, p)
        ep_costs = Jc - float(algo.cost_limit)

        step_direction, optim_case, lambda_star, nu_star, A, B = cpo_case_and_direction(
            x=x, p=p, q=q, r=r, s=s, b_grads=b_grads, ep_costs=ep_costs, target_kl=target_kl
        )

        p_dist = jax.lax.stop_gradient(ac.actor.apply(params.actor, obs))

        def eval_candidate(flat: Array) -> Dict[str, Array]:
            loss_r, _ = self._loss_pi(unravel(flat), extra, obs, act, logp, adv_r)
            loss_c = loss_c_at(flat)
            dist = ac.actor.apply(unravel(flat), obs)
            kl = self._pmean(jnp.mean(p_dist.kl(dist)))
            return {'loss': self._pmean(loss_r), 'loss_cost': self._pmean(loss_c), 'kl': kl}

        def accept(stats: Dict[str, Array]) -> Array:
            """(reference: cpo.py:144-171)."""
            finite = jnp.logical_and(jnp.isfinite(stats['loss']), jnp.isfinite(stats['kl']))
            reward_improve = loss_reward_before - stats['loss']
            reward_ok = jnp.where(optim_case > 1, reward_improve >= 0.0, True)
            cost_diff = stats['loss_cost'] - loss_cost_before
            cost_ok = cost_diff <= jnp.maximum(-ep_costs, 0.0)
            kl_ok = stats['kl'] <= target_kl
            return finite & reward_ok & cost_ok & kl_ok

        result = line_search(
            eval_candidate, theta, step_direction, accept,
            total_steps=self._search_total_steps, decay=0.8,
        )

        theta_new = theta + result.step
        loss_r_after, _ = self._loss_pi(unravel(theta_new), extra, obs, act, logp, adv_r)
        loss_c_after = loss_c_at(theta_new)
        alpha = jnp.sqrt(2.0 * target_kl / (q + 1e-8))

        metrics = {
            'Loss/Loss_pi': self._pmean(loss_r_after + loss_c_after),
            'Train/KL': result.final_kl,
            'Train/Entropy': aux['entropy'],
            'Train/PolicyRatio': aux['ratio'],
            'Train/PolicyStd': aux['std'],
            'Misc/Alpha': alpha,
            'Misc/FinalStepNorm': jnp.linalg.norm(result.step),
            'Misc/xHx': q,
            'Misc/gradient_norm': jnp.linalg.norm(grads),
            'Misc/H_inv_g': jnp.linalg.norm(x),
            'Misc/AcceptanceStep': result.accept_step.astype(jnp.float32),
            'Misc/cost_gradient_norm': jnp.linalg.norm(b_grads),
            'Misc/Lambda_star': lambda_star,
            'Misc/Nu_star': nu_star,
            'Misc/OptimCase': optim_case.astype(jnp.float32),
            'Misc/A': A,
            'Misc/B': B,
            'Misc/q': q,
            'Misc/r': r,
            'Misc/s': s,
        }
        return unravel(theta_new), metrics


__all__ = ['CPO']
