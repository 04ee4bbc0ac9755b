"""OnCRPO — primal switching between reward and cost objectives.

Counterpart of the reference OnCRPO (reference:
omnisafe/algorithms/on_policy/primal/crpo.py:25-80): when the mean episode
cost is within ``cost_limit + distance`` the update maximizes reward
advantage, otherwise it minimizes cost advantage.  The per-update branch
counters are tracked per-epoch (the reference counts per minibatch call;
the decision is identical within an epoch, so only the scale differs).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry

Array = jax.Array


@struct.dataclass
class CRPOState:
    Jc: Array
    rew_update: Array
    cost_update: Array


@registry.register
class OnCRPO(TRPO):
    """On-policy CRPO on the TRPO step."""

    def _init(self) -> None:
        self._extra_init = CRPOState(
            Jc=jnp.zeros(()), rew_update=jnp.zeros(()), cost_update=jnp.zeros(())
        )

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Misc/RewUpdate')
        log.register_key('Misc/CostUpdate')

    def _update_extra(self, extra: CRPOState, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        algo = self._cfgs.algo_cfgs
        use_reward = Jc <= float(algo.cost_limit) + float(algo.distance)
        new_state = CRPOState(
            Jc=Jc,
            rew_update=extra.rew_update + use_reward.astype(jnp.float32),
            cost_update=extra.cost_update + (1.0 - use_reward.astype(jnp.float32)),
        )
        return new_state, {'Misc/RewUpdate': new_state.rew_update,
                           'Misc/CostUpdate': new_state.cost_update}

    def _compute_adv_surrogate(self, extra: CRPOState, adv_r: Array, adv_c: Array) -> Array:
        algo = self._cfgs.algo_cfgs
        use_reward = extra.Jc <= float(algo.cost_limit) + float(algo.distance)
        return jnp.where(use_reward, adv_r, -adv_c)


__all__ = ['OnCRPO']
