"""Early-terminated variants: PPOEarlyTerminated, TRPOEarlyTerminated.

Counterparts of the reference (reference:
omnisafe/algorithms/on_policy/early_terminated/ppo_early_terminated.py,
trpo_early_terminated.py + omnisafe/adapter/early_terminated_adapter.py:40-94).
Unlike the reference's single-env restriction, the wrapper-based design
vectorizes for free.
"""

from __future__ import annotations

from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry


class _EarlyTerminatedEnvMixin:
    def _env_kwargs(self):
        # declarative so build_env_stack can route it to the right layer
        # (jitted wrapper for pure-JAX envs, host step loop for
        # host-vectorized envs — see adapter/onpolicy.py:build_env_stack)
        return {'early_term_cost_limit': float(self._cfgs.algo_cfgs.cost_limit)}


@registry.register
class PPOEarlyTerminated(_EarlyTerminatedEnvMixin, PPO):
    """PPO with cost-triggered early termination."""


@registry.register
class TRPOEarlyTerminated(_EarlyTerminatedEnvMixin, TRPO):
    """TRPO with cost-triggered early termination."""


__all__ = ['PPOEarlyTerminated', 'TRPOEarlyTerminated']
