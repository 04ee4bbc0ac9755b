"""LOOP / SafeLOOP — planning with a learned SAC actor-critic in the loop.

Counterparts of the reference LOOP (reference:
omnisafe/algorithms/model_based/base/loop.py:38-497) and SafeLOOP
(safeloop.py:34-122): PETS plus a SAC-style ConstraintActorQCritic trained on
the real transitions, whose actor proposes candidate trajectories and whose
reward critic bootstraps terminal values inside the ARC/SafeARC planner.

Scheduling deviation: the reference interleaves policy updates every
``update_policy_cycle`` (250) env steps inside the rollout; here the same
total number of SAC updates runs after each dynamics cycle (1200 steps) —
``update_policy_iters x (dynamics_cycle / policy_cycle)`` batched into one
jitted scan.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.algorithms.model_based.pets import PETS, ModelBasedTrainState
from omnisafe_tpu.algorithms.model_based.planners import ARCPlanner, SafeARCPlanner
from omnisafe_tpu.algorithms.on_policy.policy_gradient import _apply_tx, _make_tx
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.logger import Logger
from omnisafe_tpu.models.actor_critic import ACQParams, ConstraintActorQCritic

Array = jax.Array


@struct.dataclass
class PolicyState:
    """SAC machinery carried in ModelBasedTrainState.extra."""

    params: ACQParams
    actor_opt: Any
    reward_critic_opt: Any
    cost_critic_opt: Any
    alpha: Array
    update_count: Array


@registry.register
class LOOP(PETS):
    """Learning Off-Policy with Online Planning."""

    _planner_cls = ARCPlanner

    def _planner_kwargs(self) -> Dict[str, Any]:
        return {'actor_critic': self._actor_critic}

    def _init_model(self) -> None:
        cfgs = self._cfgs
        self._actor_critic = ConstraintActorQCritic(
            self._raw_env.observation_space, self._raw_env.action_space, cfgs.model_cfgs
        )
        algo = cfgs.algo_cfgs
        use_clip = bool(algo.get('max_grad_norm', 0))
        max_norm = float(algo.get('max_grad_norm', 40.0) or 40.0)
        self._actor_tx = _make_tx(use_clip, max_norm)
        self._reward_critic_tx = _make_tx(use_clip, max_norm)
        self._cost_critic_tx = _make_tx(use_clip, max_norm)
        self._actor_lr = float(cfgs.model_cfgs.actor.lr)
        self._critic_lr = float(cfgs.model_cfgs.critic.lr)
        super()._init_model()

    def _init(self) -> None:
        super()._init()
        self._key, ac_key = jax.random.split(self._key)
        params = self._actor_critic.init(ac_key)
        self._extra_init = PolicyState(
            params=params,
            actor_opt=self._actor_tx.init(params.actor),
            reward_critic_opt=self._reward_critic_tx.init(params.reward_critic),
            cost_critic_opt=self._cost_critic_tx.init(params.cost_critic),
            alpha=jnp.asarray(float(self._cfgs.algo_cfgs.alpha)),
            update_count=jnp.zeros((), jnp.int32),
        )
        algo = self._cfgs.algo_cfgs
        per_cycle = max(int(self._dynamics_cycle) // int(algo.update_policy_cycle), 1)
        self._policy_iters_per_cycle = int(algo.update_policy_iters) * per_cycle
        self._policy_update_jit = jax.jit(self._policy_update_program)

    def _register_extra_keys(self, log: Logger) -> None:
        super()._register_extra_keys(log)
        log.register_key('Loss/Loss_pi')
        log.register_key('Loss/Loss_reward_critic')
        log.register_key('Value/alpha')

    def _plan(self, state, plan_state, obs: Array, key: Array, lagrange: Array,
              chunk: int = 1):
        return self._planner.plan(
            state.dynamics, plan_state, obs, key, lagrange,
            ac_params=state.extra.params, chunk=chunk,
        )

    # --------------------------------------------------------- SAC updates
    # pylint: disable-next=too-many-locals
    def _policy_update_program(self, state: ModelBasedTrainState):
        """(reference: loop.py:208-283, 331-497)."""
        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        batch_size = int(algo.policy_batch_size)
        gamma = float(algo.gamma)
        polyak = float(algo.polyak)
        policy_delay = int(algo.policy_delay)
        use_cost = bool(algo.use_cost)
        deterministic_pi = bool(algo.get('loss_pi_deterministic', False))
        alpha_gamma = float(algo.get('alpha_gamma', 1.0))
        alpha_discount = bool(algo.get('alpha_discount', False))
        store_done = bool(algo.get('policy_store_done', True))

        def reward_critic_loss(rc_params, params, batch, alpha, key):
            dist = ac.actor.apply(params.actor, batch['next_obs'])
            next_act, next_logp = dist.sample_with_log_prob(key)
            next_q = ac.reward_critic.apply(
                params.target_reward_critic, batch['next_obs'], next_act
            )
            next_q = jnp.min(next_q, axis=0) - alpha * next_logp
            done = batch['done'] if store_done else jnp.zeros_like(batch['done'])
            target = jax.lax.stop_gradient(batch['reward'] + gamma * (1.0 - done) * next_q)
            q = ac.reward_critic.apply(rc_params, batch['obs'], batch['act'])
            return jnp.sum(jnp.mean(jnp.square(q - target[None]), axis=1))

        def cost_critic_loss(cc_params, params, batch, key):
            dist = ac.actor.apply(params.actor, batch['next_obs'])
            next_act = dist.mode()
            next_q = ac.cost_critic.apply(
                params.target_cost_critic, batch['next_obs'], next_act
            )[0]
            done = batch['done'] if store_done else jnp.zeros_like(batch['done'])
            target = jax.lax.stop_gradient(
                batch['cost'] + float(algo.cost_gamma) * (1.0 - done) * next_q
            )
            q = ac.cost_critic.apply(cc_params, batch['obs'], batch['act'])[0]
            return jnp.mean(jnp.square(q - target))

        def pi_loss(actor_params, params, obs, alpha, key):
            dist = ac.actor.apply(actor_params, obs)
            if deterministic_pi:
                act, logp = dist.mode_with_log_prob()
            else:
                act, logp = dist.sample_with_log_prob(key)
            q = ac.reward_critic.apply(params.reward_critic, obs, act)
            return jnp.mean(alpha * logp - jnp.min(q, axis=0))

        def update_once(carry, key):
            ps = carry
            skey, rkey, ckey, pikey = jax.random.split(key, 4)
            batch = self._buffer.sample(state.buffer, skey, batch_size)
            params = ps.params
            r_loss, r_grads = jax.value_and_grad(reward_critic_loss)(
                params.reward_critic, params, batch, ps.alpha, rkey
            )
            new_rc, r_opt = _apply_tx(
                self._reward_critic_tx, r_grads, ps.reward_critic_opt,
                params.reward_critic, self._critic_lr,
            )
            params = params.replace(reward_critic=new_rc)
            if use_cost:
                c_grads = jax.grad(cost_critic_loss)(params.cost_critic, params, batch, ckey)
                new_cc, c_opt = _apply_tx(
                    self._cost_critic_tx, c_grads, ps.cost_critic_opt,
                    params.cost_critic, self._critic_lr,
                )
                params = params.replace(cost_critic=new_cc)
            else:
                c_opt = ps.cost_critic_opt
            update_count = ps.update_count + 1

            def actor_update(op):
                params, a_opt = op
                loss, grads = jax.value_and_grad(pi_loss)(
                    params.actor, params, batch['obs'], ps.alpha, pikey
                )
                new_actor, a_opt = _apply_tx(
                    self._actor_tx, grads, a_opt, params.actor, self._actor_lr
                )
                params = params.replace(actor=new_actor)
                params = ac.polyak_update(params, polyak)
                return params, a_opt, loss

            def actor_skip(op):
                params, a_opt = op
                return params, a_opt, jnp.zeros(())

            params, a_opt, loss_pi = jax.lax.cond(
                (update_count % policy_delay) == 0, actor_update, actor_skip,
                (params, ps.actor_opt),
            )
            alpha = ps.alpha * alpha_gamma if alpha_discount else ps.alpha
            new_ps = PolicyState(
                params=params, actor_opt=a_opt, reward_critic_opt=r_opt,
                cost_critic_opt=c_opt, alpha=alpha, update_count=update_count,
            )
            return new_ps, {'Loss/Loss_pi': loss_pi, 'Loss/Loss_reward_critic': r_loss}

        keys = jax.random.split(state.key, self._policy_iters_per_cycle + 1)
        ps, metrics = jax.lax.scan(update_once, state.extra, keys[1:])
        return state.replace(extra=ps, key=keys[0]), jax.tree.map(jnp.mean, metrics)

    def _post_collect(self, state: ModelBasedTrainState) -> ModelBasedTrainState:
        if int(state.global_step) <= int(self._cfgs.algo_cfgs.start_learning_steps):
            return state
        state, metrics = self._policy_update_jit(state)
        self._logger.store(**{k: float(v) for k, v in metrics.items()})
        self._logger.store(**{'Value/alpha': float(state.extra.alpha)})
        return state


@registry.register
class SafeLOOP(LOOP):
    """SafeLOOP: LOOP with the cost-constrained SafeARC planner
    (reference: safeloop.py:34-122)."""

    _planner_cls = SafeARCPlanner

    def _planner_kwargs(self) -> Dict[str, Any]:
        return {
            'actor_critic': self._actor_critic,
            'cost_limit': float(self._cfgs.algo_cfgs.cost_limit),
        }


__all__ = ['LOOP', 'SafeLOOP', 'PolicyState']
