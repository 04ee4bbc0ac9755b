"""Saute RL variants: PPOSaute, TRPOSaute.

Counterparts of the reference (reference:
omnisafe/algorithms/on_policy/saute/ppo_saute.py:37-76, trpo_saute.py): the
only delta is swapping in the saute state-augmentation wrapper and logging
the episode budget.
"""

from __future__ import annotations

from omnisafe_tpu.adapter.saute import SauteWrapper
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry


class _SauteEnvMixin:
    """Install the SauteWrapper as the outer wrapper of the env stack."""

    _simmer = False

    def _env_kwargs(self):
        algo = self._cfgs.algo_cfgs
        num_envs = int(self._cfgs.train_cfgs.vector_env_nums) * int(
            self._cfgs.train_cfgs.get('num_devices', 1)
        )
        assert not algo.reward_normalize, 'Reward normalization is not supported by Saute'
        assert not algo.cost_normalize, 'Cost normalization is not supported by Saute'

        def outer(env):
            return SauteWrapper(
                env,
                num_envs=num_envs,
                safety_budget=float(algo.safety_budget),
                saute_gamma=float(algo.saute_gamma),
                unsafe_reward=float(algo.unsafe_reward),
                max_ep_len=int(algo.max_ep_len),
                upper_budget=float(algo.get('upper_budget', algo.safety_budget)),
                simmer=self._simmer,
            )

        return {'outer_wrapper': outer}

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Metrics/EpBudget')

    def _pre_epoch(self, state, epoch: int):
        state = super()._pre_epoch(state, epoch)
        self._logger.store(
            **{'Metrics/EpBudget': float(state.rollout.env_state.budget)}
        )
        return state


@registry.register
class PPOSaute(_SauteEnvMixin, PPO):
    """PPO on the saute-augmented CMDP."""


@registry.register
class TRPOSaute(_SauteEnvMixin, TRPO):
    """TRPO on the saute-augmented CMDP."""


__all__ = ['PPOSaute', 'TRPOSaute']
