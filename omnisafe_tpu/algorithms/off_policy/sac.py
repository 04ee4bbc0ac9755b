"""SAC — tanh-Gaussian actor with entropy temperature.

Counterpart of the reference SAC (reference:
omnisafe/algorithms/off_policy/sac.py:28-222): stochastic actor (sampled
bootstrap action from the *current* actor), soft TD target ``min Q - α log
π``, and optional automatic temperature tuning against ``-|A|`` target
entropy.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omnisafe_tpu.algorithms.off_policy.ddpg import DDPG
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.models.actor_critic import ACQParams

Array = jax.Array


@struct.dataclass
class AlphaState:
    log_alpha: Array
    opt_state: Any


@registry.register
class SAC(DDPG):
    """Soft Actor-Critic."""

    def _init(self) -> None:
        super()._init()
        algo = self._cfgs.algo_cfgs
        self._auto_alpha = bool(algo.get('auto_alpha', False))
        self._target_entropy = -float(self._adapter.action_space.shape[0])
        self._alpha_tx = optax.adam(self._critic_lr)
        if self._auto_alpha:
            log_alpha = jnp.zeros(())
            self._alpha_init = AlphaState(
                log_alpha=log_alpha, opt_state=self._alpha_tx.init(log_alpha)
            )
        else:
            self._fixed_log_alpha = math.log(float(algo.alpha))
            self._alpha_init = None

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        log.register_key('Value/alpha')
        if self._auto_alpha:
            log.register_key('Loss/alpha_loss')

    def _post_epoch_log(self, state) -> None:
        super()._post_epoch_log(state)
        self._logger.store(**{'Value/alpha': float(self._alpha_value(state.alpha))})

    def _alpha_value(self, alpha_state: Any) -> Array:
        if self._auto_alpha:
            return jnp.exp(alpha_state.log_alpha)
        return jnp.asarray(math.exp(self._fixed_log_alpha))

    def _predict(self, params: ACQParams, obs: Array, key: Array,
                 deterministic: bool = False) -> Array:
        dist = self._actor_critic.actor.apply(params.actor, obs)
        return dist.mode() if deterministic else dist.sample(key)

    def _next_reward_action(self, params: ACQParams, next_obs: Array, key: Array
                            ) -> Tuple[Array, Array]:
        """(reference: sac.py:116-125) — current actor, sampled, entropy term."""
        dist = self._actor_critic.actor.apply(params.actor, next_obs)
        act, logp = dist.sample_with_log_prob(key)
        return act, logp

    def _next_cost_action(self, params: ACQParams, next_obs: Array, key: Array) -> Array:
        """Inherited DDPG semantics: current actor, deterministic
        (reference: ddpg.py:465-467 with the tanh-Gaussian's mode)."""
        del key
        dist = self._actor_critic.actor.apply(params.actor, next_obs)
        return dist.mode()

    def _loss_pi(self, actor_params, params: ACQParams, obs: Array, key: Array,
                 extra: Any, alpha_state: Any) -> Array:
        """(reference: sac.py:186-210)."""
        del extra
        dist = self._actor_critic.actor.apply(actor_params, obs)
        act, logp = dist.sample_with_log_prob(key)
        q = self._actor_critic.reward_critic.apply(params.reward_critic, obs, act)
        return jnp.mean(self._alpha_value(alpha_state) * logp - jnp.min(q, axis=0))

    def _update_alpha(self, alpha_state: Any, params: ACQParams, obs: Array, key: Array
                      ) -> Tuple[Any, Dict[str, Array]]:
        """(reference: sac.py:156-180)."""
        if not self._auto_alpha:
            return alpha_state, {}
        dist = self._actor_critic.actor.apply(params.actor, obs)
        _, logp = dist.sample_with_log_prob(key)
        logp = jax.lax.stop_gradient(logp)

        def alpha_loss(log_alpha):
            return jnp.mean(-log_alpha * (logp + self._target_entropy))

        loss, grad = jax.value_and_grad(alpha_loss)(alpha_state.log_alpha)
        grad = self._pmean(grad)  # alpha must stay replicated across the dp mesh
        updates, opt_state = self._alpha_tx.update(grad, alpha_state.opt_state,
                                                   alpha_state.log_alpha)
        log_alpha = optax.apply_updates(alpha_state.log_alpha, updates)
        return AlphaState(log_alpha=log_alpha, opt_state=opt_state), {'Loss/alpha_loss': loss}


__all__ = ['SAC', 'AlphaState']
