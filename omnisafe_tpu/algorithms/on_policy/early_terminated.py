"""Early-terminated variants: PPOEarlyTerminated, TRPOEarlyTerminated.

Counterparts of the reference (reference:
omnisafe/algorithms/on_policy/early_terminated/ppo_early_terminated.py,
trpo_early_terminated.py + omnisafe/adapter/early_terminated_adapter.py:40-94).
Unlike the reference's single-env restriction, the wrapper-based design
vectorizes for free.
"""

from __future__ import annotations

from omnisafe_tpu.adapter.saute import EarlyTerminatedWrapper
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry


class _EarlyTerminatedEnvMixin:
    def _env_kwargs(self):
        cost_limit = float(self._cfgs.algo_cfgs.cost_limit)
        return {'inner_wrapper': lambda env: EarlyTerminatedWrapper(env, cost_limit)}


@registry.register
class PPOEarlyTerminated(_EarlyTerminatedEnvMixin, PPO):
    """PPO with cost-triggered early termination."""


@registry.register
class TRPOEarlyTerminated(_EarlyTerminatedEnvMixin, TRPO):
    """TRPO with cost-triggered early termination."""


__all__ = ['PPOEarlyTerminated', 'TRPOEarlyTerminated']
