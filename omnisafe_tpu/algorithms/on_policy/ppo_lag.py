"""PPOLag — PPO with a Lagrangian cost constraint.

Counterpart of the reference PPOLag (reference:
omnisafe/algorithms/on_policy/naive_lagrange/ppo_lag.py:26-103): before every
policy update the multiplier ascends on the mean episode cost, and the
surrogate advantage becomes ``(adv_r - λ adv_c) / (1 + λ)``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.lagrange import Lagrange, LagrangeState

Array = jax.Array


@registry.register
class PPOLag(PPO):
    """PPO with Lagrange multiplier ascent on the episode-cost constraint."""

    def _init(self) -> None:
        self._lagrange = Lagrange(**self._cfgs.lagrange_cfgs.todict())
        self._extra_init = self._lagrange.init()

    def _register_extra_keys(self, log) -> None:
        log.register_key('Metrics/LagrangeMultiplier', min_and_max=True)

    def _update_extra(self, extra: LagrangeState, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        """λ ascent from the windowed mean episode cost
        (reference: ppo_lag.py:52-80)."""
        new_state = self._lagrange.update(extra, Jc)
        return new_state, {'Metrics/LagrangeMultiplier': new_state.multiplier}

    def _compute_adv_surrogate(self, extra: LagrangeState, adv_r: Array, adv_c: Array) -> Array:
        """(reference: ppo_lag.py:83-103)."""
        penalty = extra.multiplier
        return (adv_r - penalty * adv_c) / (1.0 + penalty)


__all__ = ['PPOLag']
