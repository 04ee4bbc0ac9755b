"""Off-policy Lagrangian and PID-Lagrangian variants.

Counterparts of the reference (reference:
omnisafe/algorithms/off_policy/ddpg_lag.py, td3_lag.py, sac_lag.py,
ddpg_pid.py, td3_pid.py, sac_pid.py): actor loss becomes
``(-Q_r + λ Q_c) / (1 + λ)`` (with SAC's entropy term kept), and λ follows
naive ascent (after ``warmup_epochs``) or the PID controller.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from omnisafe_tpu.algorithms.off_policy.ddpg import DDPG
from omnisafe_tpu.algorithms.off_policy.sac import SAC
from omnisafe_tpu.algorithms.off_policy.td3 import TD3
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.lagrange import Lagrange
from omnisafe_tpu.common.pid_lagrange import PIDLagrangian
from omnisafe_tpu.models.actor_critic import ACQParams

Array = jax.Array


class _OffPolicyLagrangeMixin:
    """Naive λ ascent gated by warmup (reference: ddpg_lag.py:56-72)."""

    def _init(self) -> None:
        super()._init()
        self._lagrange = Lagrange(**self._cfgs.lagrange_cfgs.todict())
        self._extra_init = self._lagrange.init()

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Metrics/LagrangeMultiplier')

    def _update_extra(self, extra, Jc: Array, do_lambda: Array) -> Tuple[Any, Dict[str, Array]]:
        new_state = self._lagrange.update(extra, Jc)
        extra = jax.tree.map(
            lambda new, old: jnp.where(do_lambda, new, old), new_state, extra
        )
        return extra, {}

    def _post_epoch_log(self, state) -> None:
        super()._post_epoch_log(state)
        self._logger.store(**{'Metrics/LagrangeMultiplier': float(state.extra.multiplier)})


class _OffPolicyPIDMixin:
    """PID multiplier (reference: ddpg_pid.py:36-96)."""

    def _init(self) -> None:
        super()._init()
        self._lagrange = PIDLagrangian(**self._cfgs.lagrange_cfgs.todict())
        self._extra_init = self._lagrange.init()

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Metrics/LagrangeMultiplier')

    def _update_extra(self, extra, Jc: Array, do_lambda: Array) -> Tuple[Any, Dict[str, Array]]:
        new_state = self._lagrange.update(extra, Jc)
        extra = jax.tree.map(
            lambda new, old: jnp.where(do_lambda, new, old), new_state, extra
        )
        return extra, {}

    def _post_epoch_log(self, state) -> None:
        super()._post_epoch_log(state)
        self._logger.store(**{'Metrics/LagrangeMultiplier': float(state.extra.multiplier)})


class _DeterministicConstrainedPi:
    """(reference: ddpg_lag.py:74-100)."""

    def _loss_pi(self, actor_params, params: ACQParams, obs: Array, key: Array,
                 extra: Any, alpha_state: Any) -> Array:
        del key, alpha_state
        act = self._actor_critic.actor.apply(actor_params, obs)
        q_r = self._actor_critic.reward_critic.apply(params.reward_critic, obs, act)[0]
        q_c = self._actor_critic.cost_critic.apply(params.cost_critic, obs, act)[0]
        penalty = extra.multiplier
        return jnp.mean(-q_r + penalty * q_c) / (1.0 + penalty)


class _StochasticConstrainedPi:
    """(reference: sac_lag.py:72-100)."""

    def _loss_pi(self, actor_params, params: ACQParams, obs: Array, key: Array,
                 extra: Any, alpha_state: Any) -> Array:
        dist = self._actor_critic.actor.apply(actor_params, obs)
        act, logp = dist.sample_with_log_prob(key)
        q_r = self._actor_critic.reward_critic.apply(params.reward_critic, obs, act)
        q_c = self._actor_critic.cost_critic.apply(params.cost_critic, obs, act)[0]
        penalty = extra.multiplier
        loss_r = self._alpha_value(alpha_state) * logp - jnp.min(q_r, axis=0)
        return jnp.mean(loss_r + penalty * q_c) / (1.0 + penalty)


@registry.register
class DDPGLag(_OffPolicyLagrangeMixin, _DeterministicConstrainedPi, DDPG):
    """DDPG with Lagrangian cost constraint."""


@registry.register
class TD3Lag(_OffPolicyLagrangeMixin, _DeterministicConstrainedPi, TD3):
    """TD3 with Lagrangian cost constraint."""


@registry.register
class SACLag(_OffPolicyLagrangeMixin, _StochasticConstrainedPi, SAC):
    """SAC with Lagrangian cost constraint."""


@registry.register
class DDPGPID(_OffPolicyPIDMixin, _DeterministicConstrainedPi, DDPG):
    """DDPG with PID-controlled multiplier."""


@registry.register
class TD3PID(_OffPolicyPIDMixin, _DeterministicConstrainedPi, TD3):
    """TD3 with PID-controlled multiplier."""


@registry.register
class SACPID(_OffPolicyPIDMixin, _StochasticConstrainedPi, SAC):
    """SAC with PID-controlled multiplier."""


__all__ = ['DDPGLag', 'TD3Lag', 'SACLag', 'DDPGPID', 'TD3PID', 'SACPID']
