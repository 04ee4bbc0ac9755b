"""PPO — clipped surrogate objective.

Counterpart of the reference PPO (reference:
omnisafe/algorithms/on_policy/base/ppo.py:26-88): only ``_loss_pi`` changes
relative to the PolicyGradient template.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.policy_gradient import PolicyGradient
from omnisafe_tpu.algorithms.registry import registry

Array = jax.Array


@registry.register
class PPO(PolicyGradient):
    """Proximal Policy Optimization."""

    def _loss_pi(
        self, actor_params: Any, extra: Any, obs: Array, act: Array, logp: Array, adv: Array
    ) -> Tuple[Array, Dict[str, Array]]:
        del extra
        clip = float(self._cfgs.algo_cfgs.clip)
        entropy_coef = float(self._cfgs.algo_cfgs.entropy_coef)
        dist = self._actor_critic.actor.apply(actor_params, obs)
        logp_ = dist.log_prob(act)
        ratio = jnp.exp(logp_ - logp)
        ratio_clipped = jnp.clip(ratio, 1.0 - clip, 1.0 + clip)
        entropy = jnp.mean(dist.entropy())
        loss = -jnp.mean(jnp.minimum(ratio * adv, ratio_clipped * adv)) - entropy_coef * entropy
        aux = {'entropy': entropy, 'ratio': jnp.mean(ratio), 'std': jnp.mean(dist.scale)}
        return loss, aux


__all__ = ['PPO']
