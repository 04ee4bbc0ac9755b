"""Penalty-function variants: IPO, P3O.

Counterparts of the reference (reference:
omnisafe/algorithms/on_policy/penalty_function/ipo.py:24-75, p3o.py:27-131).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch

Array = jax.Array


@registry.register
class IPO(PPO):
    """Interior-point Policy Optimization: log-barrier penalty on the cost
    (reference: ipo.py:45-75)."""

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Misc/Penalty')

    def _update_extra(self, extra: Any, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        algo = self._cfgs.algo_cfgs
        penalty = float(algo.kappa) / (float(algo.cost_limit) - Jc + 1e-8)
        bad = jnp.logical_or(penalty < 0.0, penalty > float(algo.penalty_max))
        penalty = jnp.where(bad, float(algo.penalty_max), penalty)
        return penalty, {'Misc/Penalty': penalty}

    def _compute_adv_surrogate(self, extra: Array, adv_r: Array, adv_c: Array) -> Array:
        penalty = extra
        return (adv_r - penalty * adv_c) / (1.0 + penalty)


@registry.register
class P3O(PPO):
    """Penalized PPO: exact-penalty ReLU term on the cost surrogate
    (reference: p3o.py:48-131)."""

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Loss/Loss_pi_cost', delta=True)

    def _update_extra(self, extra: Any, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        # extra carries the current constraint violation for the loss
        del extra
        return Jc, {}

    def _loss_pi_mb(
        self, actor_params: Any, extra: Array, mb: OnPolicyBatch, old_dist_mb: Any
    ) -> Tuple[Array, Dict[str, Array]]:
        algo = self._cfgs.algo_cfgs
        Jc = extra
        loss_reward, aux = super()._loss_pi_mb(actor_params, None, mb, old_dist_mb)
        dist = self._actor_critic.actor.apply(actor_params, mb.obs)
        ratio = jnp.exp(dist.log_prob(mb.act) - mb.logp)
        surr_cadv = jnp.mean(ratio * mb.adv_c)
        loss_cost = float(algo.kappa) * jax.nn.relu(
            surr_cadv + Jc - float(algo.cost_limit)
        )
        aux = dict(aux)
        aux['loss_pi_cost'] = loss_cost
        return loss_reward + loss_cost, aux

    def _compute_adv_surrogate(self, extra: Any, adv_r: Array, adv_c: Array) -> Array:
        del extra, adv_c
        return adv_r


__all__ = ['IPO', 'P3O']
