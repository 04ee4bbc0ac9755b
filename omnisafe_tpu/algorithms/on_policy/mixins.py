"""Shared multiplier mixins for the on-policy Lagrangian families.

The reference composes these behaviors by copy-paste across PDO/RCPO/
PPOLag/TRPOLag (reference: omnisafe/algorithms/on_policy/naive_lagrange/*)
and CPPOPID/TRPOPID (pid_lagrange/*); here they are mixins over the
PolicyGradient template's ``_init``/``_update_extra``/
``_compute_adv_surrogate`` hooks.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from omnisafe_tpu.common.lagrange import Lagrange, LagrangeState
from omnisafe_tpu.common.pid_lagrange import PIDLagrangian, PIDLagrangianState

Array = jax.Array


class LagrangeMixin:
    """Naive Lagrange ascent + ``(adv_r - λ adv_c)/(1+λ)`` surrogate
    (reference: naive_lagrange/ppo_lag.py:26-103 et al.)."""

    def _init(self) -> None:
        self._lagrange = Lagrange(**self._cfgs.lagrange_cfgs.todict())
        self._extra_init = self._lagrange.init()

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Metrics/LagrangeMultiplier', min_and_max=True)

    def _update_extra(self, extra: LagrangeState, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        new_state = self._lagrange.update(extra, Jc)
        return new_state, {'Metrics/LagrangeMultiplier': new_state.multiplier}

    def _compute_adv_surrogate(self, extra: LagrangeState, adv_r: Array, adv_c: Array) -> Array:
        penalty = extra.multiplier
        return (adv_r - penalty * adv_c) / (1.0 + penalty)


class PIDLagrangeMixin:
    """PID-controlled multiplier (reference: pid_lagrange/cppo_pid.py:54-110)."""

    def _init(self) -> None:
        self._lagrange = PIDLagrangian(**self._cfgs.lagrange_cfgs.todict())
        self._extra_init = self._lagrange.init()

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Metrics/LagrangeMultiplier')

    def _update_extra(self, extra: PIDLagrangianState, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        new_state = self._lagrange.update(extra, Jc)
        return new_state, {'Metrics/LagrangeMultiplier': new_state.multiplier}

    def _compute_adv_surrogate(
        self, extra: PIDLagrangianState, adv_r: Array, adv_c: Array
    ) -> Array:
        penalty = extra.multiplier
        return (adv_r - penalty * adv_c) / (1.0 + penalty)


__all__ = ['LagrangeMixin', 'PIDLagrangeMixin']
