"""PID-Lagrangian variants: CPPOPID, TRPOPID.

Counterparts of the reference family (reference:
omnisafe/algorithms/on_policy/pid_lagrange/cppo_pid.py:54-110,
trpo_pid.py:51-101): the multiplier comes from the Stooke et al. PID
controller instead of gradient ascent.
"""

from __future__ import annotations

from omnisafe_tpu.algorithms.on_policy.mixins import PIDLagrangeMixin
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry


@registry.register
class CPPOPID(PIDLagrangeMixin, PPO):
    """PPO with PID-controlled Lagrange multiplier."""


@registry.register
class TRPOPID(PIDLagrangeMixin, TRPO):
    """TRPO with PID-controlled Lagrange multiplier."""


__all__ = ['CPPOPID', 'TRPOPID']
