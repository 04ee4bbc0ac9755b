"""FOCOPS — First-Order Constrained Optimization in Policy Space.

Counterpart of the reference FOCOPS (reference:
omnisafe/algorithms/on_policy/first_order/focops.py:31-230): the actor loss is
the KL-regularized projection ``(KL(new||old) - ratio*adv/λ_focops) * 1[KL <=
η]``, where the behavior distribution is carried per-sample through the
minibatch loop, and the multiplier follows naive Lagrange ascent.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.mixins import LagrangeMixin
from omnisafe_tpu.algorithms.on_policy.policy_gradient import PolicyGradient
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch

Array = jax.Array


@registry.register
class FOCOPS(LagrangeMixin, PolicyGradient):
    """KL-projection first-order constrained update."""

    def _loss_pi_mb(
        self, actor_params: Any, extra: Any, mb: OnPolicyBatch, old_dist_mb: Any
    ) -> Tuple[Array, Dict[str, Array]]:
        """(reference: focops.py:62-120)."""
        algo = self._cfgs.algo_cfgs
        adv = self._compute_adv_surrogate(extra, mb.adv_r, mb.adv_c)
        dist = self._actor_critic.actor.apply(actor_params, mb.obs)
        logp_ = dist.log_prob(mb.act)
        ratio = jnp.exp(logp_ - mb.logp)
        kl = dist.kl(old_dist_mb)  # KL(new || old), per sample
        gate = (jax.lax.stop_gradient(kl) <= float(algo.focops_eta)).astype(jnp.float32)
        per_sample = (kl - (1.0 / float(algo.focops_lam)) * ratio * adv) * gate
        entropy = jnp.mean(dist.entropy())
        loss = jnp.mean(per_sample) - float(algo.entropy_coef) * entropy
        aux = {'entropy': entropy, 'ratio': jnp.mean(ratio), 'std': jnp.mean(dist.scale)}
        return loss, aux

__all__ = ['FOCOPS']
