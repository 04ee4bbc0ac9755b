"""TD3 — twin critics + target-policy smoothing.

Counterpart of the reference TD3 (reference:
omnisafe/algorithms/off_policy/td3.py:28-120): only the reward-critic TD
target changes — target actor with clipped Gaussian smoothing noise, minimum
over the twin heads (already the default reduction in the template).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.off_policy.ddpg import DDPG
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.models.actor_critic import ACQParams

Array = jax.Array


@registry.register
class TD3(DDPG):
    """Twin Delayed DDPG."""

    def _next_reward_action(self, params: ACQParams, next_obs: Array, key: Array
                            ) -> Tuple[Array, Array]:
        """(reference: td3.py:75-90)."""
        algo = self._cfgs.algo_cfgs
        act = self._actor_critic.actor.apply(params.target_actor, next_obs)
        noise = jnp.clip(
            jax.random.normal(key, act.shape) * float(algo.policy_noise),
            -float(algo.policy_noise_clip),
            float(algo.policy_noise_clip),
        )
        act = jnp.clip(act + noise, -1.0, 1.0)
        return act, jnp.zeros(next_obs.shape[:-1])


__all__ = ['TD3']
