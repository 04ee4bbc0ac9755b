"""On-policy algorithm family (reference layer: omnisafe/algorithms/on_policy/**)."""

from omnisafe_tpu.algorithms.on_policy.policy_gradient import PolicyGradient
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.ppo_lag import PPOLag

__all__ = ['PolicyGradient', 'PPO', 'PPOLag']
