"""PCPO — Projection-based Constrained Policy Optimization.

Counterpart of the reference PCPO (reference:
omnisafe/algorithms/on_policy/second_order/pcpo.py:41-152): a TRPO reward
step followed by a projection onto the cost constraint, then the CPO line
search with 200 trials.  The reference's ``H_inv_g = fvp(x)`` quirk (the
projection's first term uses H x, not x) is reproduced for parity.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.cpo import CPO
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch
from omnisafe_tpu.ops.trust_region import flatten_params, line_search, make_fvp
from omnisafe_tpu.utils.math import conjugate_gradients

Array = jax.Array


@registry.register
class PCPO(CPO):
    """Projection-based constrained trust-region update."""

    _search_total_steps = 200

    # pylint: disable-next=too-many-locals
    def _trust_region_step(
        self, params: Any, batch: OnPolicyBatch, extra: Any, Jc: Array
    ) -> Tuple[Any, Dict[str, Array]]:
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
        xHx = jnp.dot(x, fvp(x))
        H_x = fvp(x)  # the reference's 'H_inv_g' (pcpo.py:81)
        alpha = jnp.sqrt(2.0 * target_kl / (xHx + 1e-8))

        p = conjugate_gradients(fvp, b_grads, cg_iters)
        q = xHx
        r = jnp.dot(grads, p)
        s = jnp.dot(b_grads, p)
        ep_costs = Jc - float(algo.cost_limit)

        scale = jnp.sqrt(2.0 * target_kl / (q + 1e-8))
        projection = jnp.maximum((jnp.sqrt(2.0 * target_kl / q) * r + ep_costs) / s, 0.0)
        step_direction = scale * H_x - projection * p

        p_dist = jax.lax.stop_gradient(ac.actor.apply(params.actor, obs))

        def eval_candidate(flat: Array) -> Dict[str, Array]:
            loss_r, _ = self._loss_pi(unravel(flat), extra, obs, act, logp, adv_r)
            loss_c = loss_c_at(flat)
            dist = ac.actor.apply(unravel(flat), obs)
            kl = self._pmean(jnp.mean(p_dist.kl(dist)))
            return {'loss': self._pmean(loss_r), 'loss_cost': self._pmean(loss_c), 'kl': kl}

        def accept(stats: Dict[str, Array]) -> Array:
            # optim_case defaults to 0 in the reference call (pcpo.py:114-126),
            # so the reward-improvement check is inactive
            finite = jnp.logical_and(jnp.isfinite(stats['loss']), jnp.isfinite(stats['kl']))
            cost_ok = (stats['loss_cost'] - loss_cost_before) <= jnp.maximum(-ep_costs, 0.0)
            kl_ok = stats['kl'] <= target_kl
            return finite & cost_ok & kl_ok

        result = line_search(
            eval_candidate, theta, step_direction, accept,
            total_steps=self._search_total_steps, decay=0.8,
        )

        theta_new = theta + result.step
        loss_r_after, _ = self._loss_pi(unravel(theta_new), extra, obs, act, logp, adv_r)
        loss_c_after = loss_c_at(theta_new)

        metrics = {
            'Loss/Loss_pi': self._pmean(loss_r_after + loss_c_after),
            'Train/KL': result.final_kl,
            'Train/Entropy': aux['entropy'],
            'Train/PolicyRatio': aux['ratio'],
            'Train/PolicyStd': aux['std'],
            'Misc/Alpha': alpha,
            'Misc/FinalStepNorm': jnp.linalg.norm(result.step),
            'Misc/xHx': xHx,
            'Misc/gradient_norm': jnp.linalg.norm(grads),
            'Misc/H_inv_g': jnp.linalg.norm(x),
            'Misc/AcceptanceStep': result.accept_step.astype(jnp.float32),
            'Misc/cost_gradient_norm': jnp.linalg.norm(b_grads),
            'Misc/Lambda_star': jnp.ones(()),
            'Misc/Nu_star': jnp.ones(()),
            'Misc/OptimCase': jnp.ones(()),
            'Misc/A': jnp.ones(()),
            'Misc/B': jnp.ones(()),
            'Misc/q': q,
            'Misc/r': r,
            'Misc/s': s,
        }
        return unravel(theta_new), metrics


__all__ = ['PCPO']
