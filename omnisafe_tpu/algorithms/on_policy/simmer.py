"""Simmer variants: PPOSimmerPID, TRPOSimmerPID.

Counterparts of the reference (reference:
omnisafe/algorithms/on_policy/simmer/ppo_simmer_pid.py, trpo_simmer_pid.py +
omnisafe/adapter/simmer_adapter.py:115-131): saute with a PID-controlled
adaptive budget, retuned once per epoch from the observed episode costs.
"""

from __future__ import annotations

import jax.numpy as jnp

from omnisafe_tpu.adapter.saute import discounted_budget
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.saute import _SauteEnvMixin
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.simmer_agent import SimmerPIDAgent


class _SimmerEnvMixin(_SauteEnvMixin):
    _simmer = True

    def _init(self) -> None:
        super()._init()
        algo = self._cfgs.algo_cfgs
        ctrl = self._cfgs.control_cfgs
        self._upper_budget_scaled = discounted_budget(
            float(algo.upper_budget), float(algo.saute_gamma), int(algo.max_ep_len)
        )
        self._controller = SimmerPIDAgent(
            kp=float(ctrl.kp),
            ki=float(ctrl.ki),
            kd=float(ctrl.kd),
            polyak=float(ctrl.polyak),
            budget_bound=self._upper_budget_scaled,
        )

    def _pre_epoch(self, state, epoch: int):
        """Adaptive budget control between epochs
        (reference: simmer_adapter.py:115-131)."""
        algo = self._cfgs.algo_cfgs
        if epoch > 0:
            ep_cost = self._logger.get_stats('Metrics/EpCost')[0]
            scaled_cost = discounted_budget(
                float(ep_cost), float(algo.saute_gamma), int(algo.max_ep_len)
            )
            env_state = state.rollout.env_state
            new_budget = self._controller.act(float(env_state.budget), scaled_cost)
            env_state = env_state.replace(
                budget=jnp.asarray(new_budget),
                rel_budget=jnp.asarray(new_budget / self._upper_budget_scaled),
            )
            state = state.replace(rollout=state.rollout.replace(env_state=env_state))
        return super()._pre_epoch(state, epoch)


@registry.register
class PPOSimmerPID(_SimmerEnvMixin, PPO):
    """PPO-Saute with PID-adaptive safety budget."""


@registry.register
class TRPOSimmerPID(_SimmerEnvMixin, TRPO):
    """TRPO-Saute with PID-adaptive safety budget."""


__all__ = ['PPOSimmerPID', 'TRPOSimmerPID']
