"""PPOLag — PPO with a Lagrangian cost constraint.

Counterpart of the reference PPOLag (reference:
omnisafe/algorithms/on_policy/naive_lagrange/ppo_lag.py:26-103): before every
policy update the multiplier ascends on the mean episode cost, and the
surrogate advantage becomes ``(adv_r - λ adv_c) / (1 + λ)``.
"""

from __future__ import annotations

from omnisafe_tpu.algorithms.on_policy.mixins import LagrangeMixin
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.registry import registry


@registry.register
class PPOLag(LagrangeMixin, PPO):
    """PPO with Lagrange multiplier ascent on the episode-cost constraint."""


__all__ = ['PPOLag']
