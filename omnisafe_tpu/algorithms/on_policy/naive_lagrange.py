"""Naive-Lagrange variants: PDO, RCPO, TRPOLag.

Counterparts of the reference family (reference:
omnisafe/algorithms/on_policy/naive_lagrange/pdo.py:25-106, rcpo.py:25-102,
trpo_lag.py:26-100).  PPOLag lives in ``ppo_lag.py``.
"""

from __future__ import annotations

from omnisafe_tpu.algorithms.on_policy.mixins import LagrangeMixin
from omnisafe_tpu.algorithms.on_policy.natural_pg import NaturalPG
from omnisafe_tpu.algorithms.on_policy.policy_gradient import PolicyGradient
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry


@registry.register
class PDO(LagrangeMixin, PolicyGradient):
    """Primal-Dual Optimization: vanilla PG + Lagrange ascent."""


@registry.register
class RCPO(LagrangeMixin, NaturalPG):
    """Reward-Constrained Policy Optimization: NPG step on the Lagrangian."""


@registry.register
class TRPOLag(LagrangeMixin, TRPO):
    """TRPO + Lagrange multiplier ascent."""


__all__ = ['PDO', 'RCPO', 'TRPOLag']
