"""TRPO — NaturalPG + backtracking line search.

Counterpart of the reference TRPO (reference:
omnisafe/algorithms/on_policy/base/trpo.py:34-222).  The 15-trial decaying
line search becomes one vmapped candidate evaluation (see
omnisafe_tpu/ops/trust_region.py); acceptance semantics — finite loss,
non-negative improvement, KL within the trust region, zero step on failure —
match the reference exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.natural_pg import NaturalPG
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch
from omnisafe_tpu.ops.trust_region import flatten_params, line_search, make_fvp, npg_direction

Array = jax.Array


@registry.register
class TRPO(NaturalPG):
    """Trust Region Policy Optimization."""

    _search_total_steps = 15

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Misc/AcceptanceStep')

    def _accept_fn(self, stats: Dict[str, Array], loss_before: Array, Jc: Array):
        """(reference: trpo.py:121-137)."""
        del Jc
        improve = loss_before - stats['loss']
        return jnp.logical_and(
            jnp.isfinite(stats['loss']),
            jnp.logical_and(improve >= 0.0, stats['kl'] <= float(self._cfgs.algo_cfgs.target_kl)),
        )

    def _trust_region_step(
        self, params: Any, batch: OnPolicyBatch, extra: Any, Jc: Array
    ) -> Tuple[Any, Dict[str, Array]]:
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

        p_dist = jax.lax.stop_gradient(ac.actor.apply(params.actor, obs))

        def eval_candidate(flat: Array) -> Dict[str, Array]:
            loss, _ = self._loss_pi(unravel(flat), extra, obs, act, logp, adv)
            dist = ac.actor.apply(unravel(flat), obs)
            kl = self._pmean(jnp.mean(p_dist.kl(dist)))
            return {'loss': self._pmean(loss), 'kl': kl}

        result = line_search(
            eval_candidate,
            theta,
            step_direction,
            lambda stats: self._accept_fn(stats, loss_before, Jc),
            total_steps=self._search_total_steps,
            decay=0.8,
        )

        theta_new = theta + result.step
        loss_after, _ = self._loss_pi(unravel(theta_new), extra, obs, act, logp, adv)

        metrics = {
            'Loss/Loss_pi': self._pmean(loss_after),
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
        }
        return unravel(theta_new), metrics


__all__ = ['TRPO']
