"""DDPG — the off-policy training template.

Counterpart of the reference DDPG (reference:
omnisafe/algorithms/off_policy/ddpg.py:36-564), re-designed as one jitted
sample-update program per epoch: a ``lax.scan`` over sample cycles where each
cycle collects ``update_cycle`` transitions into the device-resident replay
ring and, once past the warm-up, runs ``update_iters`` TD updates (reward
critic, cost critic, delayed actor + polyak) on uniformly gathered batches.

Faithful reference quirks preserved: the DDPG TD target bootstraps with the
*current* actor, not the target actor (reference: ddpg.py:425-427); twin
pessimism applies to the reward critic only.

λ cadence: the reference re-reads its logger EpCost window every update call
(reference: ddpg_lag.py:58-66), so λ reacts to an unsafe episode within ~one
episode of experience.  The host-driven epochs reproduce that by maintaining
the same completed-episode cost window host-side and shipping a fresh window
mean to the learner each sample cycle; only the fully-jitted pure-JAX epoch
(used for the analytic test envs) freezes Jc at epoch boundaries.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from omnisafe_tpu.adapter.offpolicy import OffPolicyAdapter
from omnisafe_tpu.adapter.onpolicy import RolloutCarry
from omnisafe_tpu.algorithms.base_algo import BaseAlgo
from omnisafe_tpu.algorithms.on_policy.policy_gradient import _apply_tx, _l2_sum, _make_tx
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.offpolicy import ReplayBuffer, ReplayBufferState
from omnisafe_tpu.common.logger import Logger
from omnisafe_tpu.models.actor_critic import ACQParams, ConstraintActorQCritic
from omnisafe_tpu.utils.config import configured_cost_limit

Array = jax.Array


@struct.dataclass
class OffPolicyTrainState:
    params: ACQParams
    actor_opt: Any
    reward_critic_opt: Any
    cost_critic_opt: Any
    alpha: Any                 # SAC auto-alpha state or None
    buffer: ReplayBufferState
    rollout: RolloutCarry
    extra: Any
    update_count: Array
    global_step: Array
    key: Array


@registry.register
class DDPG(BaseAlgo):
    """Deep Deterministic Policy Gradient."""

    _algo_type = 'off-policy'
    # uniform-random warm-up actions before start_learning_steps (reference:
    # ddpg.py:254-348).  CRABS sets this False: its exploration is ALWAYS
    # barrier-filtered — the reference never passes use_rand_action=True
    # (reference: crabs.py:233-319).
    _rand_warmup = True

    # ------------------------------------------------------------------ init
    def _init_env(self) -> None:
        cfgs = self._cfgs
        num_envs = int(cfgs.train_cfgs.vector_env_nums)
        num_devices = int(cfgs.train_cfgs.get('num_devices', 1))
        self._steps_per_epoch = int(cfgs.algo_cfgs.steps_per_epoch)
        self._update_cycle = int(cfgs.algo_cfgs.update_cycle)
        assert self._steps_per_epoch % self._update_cycle == 0
        self._samples_per_epoch = self._steps_per_epoch // self._update_cycle
        self._epochs = int(cfgs.train_cfgs.total_steps) // self._steps_per_epoch
        # like the on-policy convention, vector_env_nums is per-device; the
        # adapter owns the global env batch, sharded over the dp mesh — the
        # reference cannot parallelize off-policy at all (asserts
        # parallel==1, reference: utils/config.py:288-291)
        self._num_devices = num_devices
        if num_devices > 1:
            self._axis_name = 'dp'
        self._adapter = OffPolicyAdapter(
            self._env_id, num_envs * num_devices, cfgs.algo_cfgs
        )
        self._num_envs = num_envs * num_devices

    def _init_model(self) -> None:
        cfgs = self._cfgs
        self._actor_critic = ConstraintActorQCritic(
            self._adapter.observation_space, self._adapter.action_space, cfgs.model_cfgs
        )
        algo = cfgs.algo_cfgs
        use_clip = bool(algo.get('max_grad_norm', 0))
        max_norm = float(algo.get('max_grad_norm', 40.0) or 40.0)
        self._actor_tx = _make_tx(use_clip, max_norm)
        self._reward_critic_tx = _make_tx(use_clip, max_norm)
        self._cost_critic_tx = _make_tx(use_clip, max_norm)
        self._actor_lr = float(cfgs.model_cfgs.actor.lr)
        self._critic_lr = float(cfgs.model_cfgs.critic.lr)

    def _init(self) -> None:
        algo = self._cfgs.algo_cfgs
        # the in-program buffer sees the PER-DEVICE env shard (the ring's
        # env axis shards over dp); a global-layout handle initializes the
        # full ring outside the mesh
        per_device_envs = self._num_envs // self._num_devices
        kwargs = dict(
            obs_dim=self._adapter.observation_space.shape[0],
            act_dim=self._adapter.action_space.shape[0],
            capacity=int(algo.size),
            penalty_coefficient=float(algo.get('penalty_coef', 0.0)),
        )
        self._buffer = ReplayBuffer(num_envs=per_device_envs, **kwargs)
        self._global_buffer = (
            ReplayBuffer(num_envs=self._num_envs, **kwargs)
            if self._num_devices > 1 else self._buffer
        )
        self._extra_init: Any = None
        self._alpha_init: Any = None

    def _init_log(self) -> None:
        cfgs = self._cfgs
        exp_name = f'{self._env_id}---{type(self).__name__}'
        self._logger = Logger(
            output_dir=cfgs.logger_cfgs.log_dir,
            exp_name=exp_name,
            seed=self._seed,
            use_tensorboard=bool(cfgs.logger_cfgs.use_tensorboard),
            use_wandb=bool(cfgs.logger_cfgs.use_wandb),
            wandb_project=str(cfgs.logger_cfgs.get('wandb_project', 'omnisafe_tpu')),
            verbose=bool(cfgs.logger_cfgs.get('verbose', False)),
            use_profiler=bool(cfgs.logger_cfgs.get('use_profiler', False)),
            config=cfgs,
        )
        window = int(cfgs.logger_cfgs.window_lens)
        log = self._logger
        log.register_key('Metrics/EpRet', window_length=window, min_and_max=True)
        log.register_key('Metrics/EpCost', window_length=window, min_and_max=True)
        log.register_key('Metrics/EpLen', window_length=window, min_and_max=True)
        log.register_key('Metrics/TestEpRet', window_length=window, min_and_max=True)
        log.register_key('Metrics/TestEpCost', window_length=window, min_and_max=True)
        log.register_key('Metrics/TestEpLen', window_length=window, min_and_max=True)
        log.register_key('Train/Epoch')
        log.register_key('Train/LR')
        log.register_key('TotalEnvSteps')
        log.register_key('Loss/Loss_pi', delta=True)
        log.register_key('Loss/Loss_reward_critic', delta=True)
        log.register_key('Value/reward_critic')
        if cfgs.algo_cfgs.use_cost:
            log.register_key('Loss/Loss_cost_critic', delta=True)
            log.register_key('Value/cost_critic')
        log.register_key('Time/Total')
        log.register_key('Time/Rollout')
        log.register_key('Time/Update')
        log.register_key('Time/Evaluate')
        log.register_key('Time/Epoch')
        log.register_key('Time/FPS')
        # BASELINE target: cost-limit hit rate tracked per config — fraction
        # of finished training episodes in the window with EpCost <= limit.
        self._cost_limit_for_metrics = configured_cost_limit(cfgs)
        if self._cost_limit_for_metrics is not None:
            log.register_key('Metrics/CostLimitHitRate', window_length=window)
        # host-side mirror of the logger's EpCost window, advanced per sample
        # cycle so λ sees a fresh Jc every cycle (reference: ddpg_lag.py:58-66
        # re-reads the window every update call)
        from collections import deque  # pylint: disable=import-outside-toplevel

        self._jc_window: Any = deque(maxlen=window)
        self._register_extra_keys(log)

    def _register_extra_keys(self, log: Logger) -> None:
        """Subclass hook."""

    def _post_epoch_log(self, state: 'OffPolicyTrainState') -> None:
        """Subclass hook for per-epoch extra metrics (λ etc.)."""

    def _behavior_policy(self, st: 'OffPolicyTrainState'):
        """Exploration policy used during rollout; CRABS overrides this with
        barrier-filtered action selection."""
        return lambda obs, k: self._predict(st.params, obs, k, deterministic=False)

    def _between_epochs(self, state: 'OffPolicyTrainState') -> 'OffPolicyTrainState':
        """Host-side hook between epochs (CRABS trains its transition model
        and barrier certificate here)."""
        return state

    # ------------------------------------------------------- policy queries
    def _predict(self, params: ACQParams, obs: Array, key: Array,
                 deterministic: bool = False) -> Array:
        """Behavior policy (reference: mlp_actor.py:75-96 — Gaussian
        exploration noise, clamped to [-1, 1])."""
        act = self._actor_critic.actor.apply(params.actor, obs)
        algo = self._cfgs.algo_cfgs
        if not deterministic and bool(algo.get('use_exploration_noise', False)):
            noise = float(algo.exploration_noise) * jax.random.normal(key, act.shape)
            act = jnp.clip(act + noise, -1.0, 1.0)
        return act

    def _alpha_value(self, alpha_state: Any) -> Array:
        del alpha_state
        return jnp.zeros(())

    def _next_reward_action(self, params: ACQParams, next_obs: Array, key: Array
                            ) -> Tuple[Array, Array]:
        """Next action (+entropy term) for the reward-critic TD target.
        DDPG bootstraps with the *current* actor (reference: ddpg.py:425-427)."""
        del key
        act = self._actor_critic.actor.apply(params.actor, next_obs)
        return act, jnp.zeros(next_obs.shape[:-1])

    def _next_cost_action(self, params: ACQParams, next_obs: Array, key: Array) -> Array:
        """(reference: ddpg.py:465-467 — current actor, deterministic)."""
        del key
        return self._actor_critic.actor.apply(params.actor, next_obs)

    # ------------------------------------------------------------- TD losses
    def _reward_critic_loss(self, rc_params, params: ACQParams, batch, key, alpha_state):
        algo = self._cfgs.algo_cfgs
        next_act, next_entropy_term = self._next_reward_action(params, batch['next_obs'], key)
        next_q = self._actor_critic.reward_critic.apply(
            params.target_reward_critic, batch['next_obs'], next_act
        )
        next_q = jnp.min(next_q, axis=0) - self._alpha_value(alpha_state) * next_entropy_term
        target = batch['reward'] + float(algo.gamma) * (1.0 - batch['done']) * next_q
        target = jax.lax.stop_gradient(target)
        q = self._actor_critic.reward_critic.apply(rc_params, batch['obs'], batch['act'])
        loss = jnp.sum(jnp.mean(jnp.square(q - target[None, :]), axis=1))
        if algo.get('use_critic_norm', False):
            loss = loss + float(algo.critic_norm_coeff) * _l2_sum(rc_params)
        return loss, jnp.mean(q[0])

    def _cost_critic_loss(self, cc_params, params: ACQParams, batch, key):
        algo = self._cfgs.algo_cfgs
        next_act = self._next_cost_action(params, batch['next_obs'], key)
        next_q = self._actor_critic.cost_critic.apply(
            params.target_cost_critic, batch['next_obs'], next_act
        )[0]
        target = batch['cost'] + float(algo.gamma) * (1.0 - batch['done']) * next_q
        target = jax.lax.stop_gradient(target)
        q = self._actor_critic.cost_critic.apply(cc_params, batch['obs'], batch['act'])[0]
        loss = jnp.mean(jnp.square(q - target))
        if algo.get('use_critic_norm', False):
            loss = loss + float(algo.critic_norm_coeff) * _l2_sum(cc_params)
        return loss, jnp.mean(q)

    def _loss_pi(self, actor_params, params: ACQParams, obs: Array, key: Array,
                 extra: Any, alpha_state: Any) -> Array:
        """(reference: ddpg.py:520-546)."""
        del key, extra, alpha_state
        act = self._actor_critic.actor.apply(actor_params, obs)
        q = self._actor_critic.reward_critic.apply(params.reward_critic, obs, act)[0]
        return -jnp.mean(q)

    def _update_alpha(self, alpha_state: Any, params: ACQParams, obs: Array, key: Array
                      ) -> Tuple[Any, Dict[str, Array]]:
        del params, obs, key
        return alpha_state, {}

    def _update_extra(self, extra: Any, Jc: Array, do_lambda: Array
                      ) -> Tuple[Any, Dict[str, Array]]:
        del Jc, do_lambda
        return extra, {}

    def _fresh_jc(self, ep_m) -> float:
        """Advance the host-side completed-episode cost window with this
        cycle's completions and return its mean — the quantity the
        reference's per-update λ ascent reads from its logger window
        (reference: ddpg_lag.py:63-66)."""
        done = np.asarray(ep_m.done).reshape(-1)
        if done.any():
            self._jc_window.extend(
                np.asarray(ep_m.ep_cost).reshape(-1)[done].tolist()
            )
        return float(np.mean(self._jc_window)) if self._jc_window else 0.0

    # ------------------------------------------------------------- programs
    def _zero_update_metrics(self) -> Dict[str, Array]:
        keys = ['Loss/Loss_pi', 'Loss/Loss_reward_critic', 'Value/reward_critic',
                'Loss/Loss_cost_critic', 'Value/cost_critic']
        return {k: jnp.zeros(()) for k in keys}

    def _make_update(self, buf_state, lr: Array, Jc: Array, do_lambda: Array):
        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        use_cost = bool(algo.use_cost)
        batch_size = int(algo.batch_size)
        policy_delay = int(algo.get('policy_delay', 1))
        polyak = float(algo.polyak)

        def update_once(carry, key):
            params, a_opt, r_opt, c_opt, alpha_state, extra, update_count = carry
            skey, rkey, ckey, pikey, alkey = jax.random.split(key, 5)
            batch = self._buffer.sample(buf_state, skey, batch_size)
            # reward critic (reference: ddpg.py:402-447)
            (r_loss, q_r), r_grads = jax.value_and_grad(self._reward_critic_loss, has_aux=True)(
                params.reward_critic, params, batch, rkey, alpha_state
            )
            r_grads = self._pmean(r_grads)
            new_rc, r_opt = _apply_tx(
                self._reward_critic_tx, r_grads, r_opt, params.reward_critic, self._critic_lr
            )
            params = params.replace(reward_critic=new_rc)
            # cost critic (reference: ddpg.py:449-496)
            if use_cost:
                (c_loss, q_c), c_grads = jax.value_and_grad(
                    self._cost_critic_loss, has_aux=True
                )(params.cost_critic, params, batch, ckey)
                c_grads = self._pmean(c_grads)
                new_cc, c_opt = _apply_tx(
                    self._cost_critic_tx, c_grads, c_opt, params.cost_critic, self._critic_lr
                )
                params = params.replace(cost_critic=new_cc)
            else:
                c_loss, q_c = jnp.zeros(()), jnp.zeros(())
            update_count = update_count + 1

            def actor_update(operand):
                params, a_opt, alpha_state = operand
                pi_loss, a_grads = jax.value_and_grad(self._loss_pi)(
                    params.actor, params, batch['obs'], pikey, extra, alpha_state
                )
                a_grads = self._pmean(a_grads)
                new_actor, new_a_opt = _apply_tx(
                    self._actor_tx, a_grads, a_opt, params.actor, lr
                )
                params = params.replace(actor=new_actor)
                params = ac.polyak_update(params, polyak)
                alpha_state, _ = self._update_alpha(alpha_state, params, batch['obs'], alkey)
                return params, new_a_opt, alpha_state, pi_loss

            def actor_skip(operand):
                params, a_opt, alpha_state = operand
                return params, a_opt, alpha_state, jnp.zeros(())

            do_actor = (update_count % policy_delay) == 0
            params, a_opt, alpha_state, pi_loss = jax.lax.cond(
                do_actor, actor_update, actor_skip, (params, a_opt, alpha_state)
            )
            # λ (or PID) multiplier step once per update iteration, AFTER the
            # critic/actor updates — the reference ascends λ once per
            # ``_update()`` call, i.e. once per transition at UTD 1
            # (reference: ddpg_lag.py:57-66 after super()._update(); with
            # update_cycle batching this keeps the per-transition Adam
            # cadence — and its β₁/β₂ timescales — exactly the reference's,
            # instead of one big rescaled step per cycle).
            extra, _ = self._update_extra(extra, Jc, do_lambda)
            metrics = {
                'Loss/Loss_pi': pi_loss,
                'Loss/Loss_reward_critic': r_loss,
                'Value/reward_critic': q_r,
                'Loss/Loss_cost_critic': c_loss,
                'Value/cost_critic': q_c,
            }
            return (params, a_opt, r_opt, c_opt, alpha_state, extra, update_count), metrics

        return update_once

    def _update_cycle_program(self, st: OffPolicyTrainState, upd_key: Array,
                              Jc: Array, lr: Array, do_lambda: Array):
        """One cycle's worth of gradient updates (``update_iters`` scanned
        steps on replay samples) — shared by the fully-jitted device epoch
        and the host-driven epoch."""
        update_iters = int(self._cfgs.algo_cfgs.update_iters)
        keys = jax.random.split(upd_key, update_iters)
        init = (st.params, st.actor_opt, st.reward_critic_opt, st.cost_critic_opt,
                st.alpha, st.extra, st.update_count)
        (params, a_opt, r_opt, c_opt, alpha_state, extra, update_count), m = (
            jax.lax.scan(self._make_update(st.buffer, lr, Jc, do_lambda), init, keys)
        )
        new_st = st.replace(
            params=params, actor_opt=a_opt, reward_critic_opt=r_opt,
            cost_critic_opt=c_opt, alpha=alpha_state, extra=extra,
            update_count=update_count,
        )
        metrics = jax.tree.map(jnp.mean, m)
        return new_st, metrics

    # pylint: disable-next=too-many-locals,too-many-statements
    def _epoch_program(self, state: OffPolicyTrainState, Jc: Array, lr: Array, do_lambda: Array):
        start_learning = int(self._cfgs.algo_cfgs.start_learning_steps)

        def cycle(carry, cycle_key):
            st = carry
            roll_key, upd_key = jax.random.split(cycle_key)
            use_rand = jnp.logical_and(
                st.global_step <= start_learning, self._rand_warmup
            )
            rollout_carry, buf_state, ep_metrics = self._adapter.rollout(
                st.rollout,
                self._buffer,
                st.buffer,
                self._behavior_policy(st),
                roll_key,
                self._update_cycle,
                use_rand,
            )
            global_step = st.global_step + self._update_cycle * self._num_envs
            st = st.replace(rollout=rollout_carry, buffer=buf_state, global_step=global_step)

            def do_update(st):
                new_st, metrics = self._update_cycle_program(st, upd_key, Jc, lr, do_lambda)
                return new_st, metrics, jnp.ones(())

            def skip_update(st):
                return st, self._zero_update_metrics(), jnp.zeros(())

            st, upd_metrics, executed = jax.lax.cond(
                global_step > start_learning, do_update, skip_update, st
            )
            out = dict(upd_metrics)
            out['_executed'] = executed
            return st, (ep_metrics, out)

        key, *cycle_keys = jax.random.split(state.key, self._samples_per_epoch + 1)
        cycle_keys = jnp.stack(cycle_keys)
        if self._axis_name is not None:
            # per-device exploration + replay-sampling streams; params stay
            # replicated because gradients are pmean'd before every apply
            cycle_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, jax.lax.axis_index(self._axis_name))
            )(cycle_keys)
        state = state.replace(key=key)
        state, (ep_metrics, upd_metrics) = jax.lax.scan(cycle, state, cycle_keys)
        weights = upd_metrics.pop('_executed')
        total = jnp.maximum(jnp.sum(weights), 1.0)
        metrics = {k: self._pmean(jnp.sum(v * weights) / total) for k, v in upd_metrics.items()}
        return state, ep_metrics, metrics

    def _eval_program(self, state: OffPolicyTrainState, key: Array):
        return self._adapter.eval_episode(
            lambda obs, k: self._predict(state.params, obs, k, deterministic=True),
            key,
            max_steps=1000,
        )

    # ---------------------------------------------------- host-backed envs
    def _make_host_runners(self, external_store: bool = False):
        """Host-driven collection + a SEPARATE eval env for host-backed
        (MuJoCo) envs — evaluation must not reset the training envs' real
        host state (see adapter/host_loop.py)."""
        from omnisafe_tpu.adapter.host_loop import (  # pylint: disable=import-outside-toplevel
            HostEvalRunner,
            HostOffPolicyRunner,
        )
        from omnisafe_tpu.adapter.onpolicy import build_env_stack  # pylint: disable=import-outside-toplevel

        # both host runners sample the RAW actor; an overridden behavior
        # policy (CRABS' barrier-filtered exploration, which needs the full
        # train state) would be silently bypassed — fail loudly instead
        if type(self)._behavior_policy is not DDPG._behavior_policy:
            raise NotImplementedError(
                f'{type(self).__name__} overrides _behavior_policy; the '
                f'host-backed rollout runners sample the raw actor and '
                f'would silently drop the override — use a pure-JAX env'
            )
        self._host_runner = None
        if external_store:
            # numpy fast path: one host MLP forward per step instead of a
            # jitted dispatch (adapter/host_fast.py); falls back below when
            # the actor/wrapper stack is outside its oracle-tested envelope
            from omnisafe_tpu.adapter.host_fast import (  # pylint: disable=import-outside-toplevel
                FastHostOffPolicyRunner,
                Ineligible,
            )

            algo = self._cfgs.algo_cfgs
            try:
                self._host_runner = FastHostOffPolicyRunner(
                    self._adapter.env,
                    self._actor_critic.actor,
                    bool(algo.get('use_exploration_noise', False)),
                    float(algo.get('exploration_noise', 0.0)),
                )
            except Ineligible:
                self._host_runner = None
        if self._host_runner is None:
            self._host_runner = HostOffPolicyRunner(
                self._adapter.env,
                lambda params, obs, k: self._predict(params, obs, k, deterministic=False),
                None if external_store else self._buffer,
            )
        eval_stack = build_env_stack(self._env_id, 1, self._cfgs.algo_cfgs)
        self._host_eval = HostEvalRunner(
            eval_stack,
            lambda params, obs, k: self._predict(params, obs, k, deterministic=True),
        )

    def _update_cycle_host(self, learnable, buf_state, upd_key: Array,
                           Jc: Array, lr: Array, do_lambda: Array):
        """Host-mode update entry: the replay ring is a read-only input that
        is NOT returned (returning it through jit would copy the whole ring
        every cycle); only the mutated learnable state comes back."""
        params, a_opt, r_opt, c_opt, alpha, extra, update_count = learnable
        st = OffPolicyTrainState(
            params=params, actor_opt=a_opt, reward_critic_opt=r_opt,
            cost_critic_opt=c_opt, alpha=alpha, buffer=buf_state, rollout=None,
            extra=extra, update_count=update_count,
            global_step=jnp.zeros((), jnp.int32), key=upd_key,
        )
        new_st, metrics = self._update_cycle_program(st, upd_key, Jc, lr, do_lambda)
        new_learnable = (new_st.params, new_st.actor_opt, new_st.reward_critic_opt,
                         new_st.cost_critic_opt, new_st.alpha, new_st.extra,
                         new_st.update_count)
        return new_learnable, metrics

    def _pick_learner_device(self):
        """Resolve train_cfgs.learner_device ('auto'|'cpu'|'tpu'): the device
        the replay ring + TD updates live on in host mode.  'auto' offloads
        to an accelerator when one is visible; CPU-forced test environments
        resolve to None (everything stays on CPU)."""
        want = str(self._cfgs.train_cfgs.get('learner_device', 'auto'))
        if want == 'cpu':
            return None
        accel = [d for d in jax.devices() if d.platform != 'cpu']
        if not accel:
            if want == 'tpu':
                raise RuntimeError('learner_device=tpu but no accelerator is visible')
            return None
        return accel[0]

    def _epoch_host_accel(self, state: OffPolicyTrainState, Jc: Array, lr: Array,
                          do_lambda: Array):
        """CPU-actor / TPU-learner epoch: the host loop owns physics and the
        per-step policy forward on CPU; each cycle's transitions ship to the
        accelerator in one transfer, where the ring store + the update scan
        run as one jitted call.  Only the actor's weights come back per
        cycle (~tens of KB), so a ~30 ms tunnel round trip is paid once per
        ``update_cycle * vector_env_nums`` transitions, not per step."""
        runner = self._host_runner
        dev = self._learner_device
        cpu = jax.devices('cpu')[0]
        start_learning = int(self._cfgs.algo_cfgs.start_learning_steps)
        ep_list, upd_list = [], []
        key = state.key
        learnable = self._accel_learnable  # lives on the accelerator
        cpu_params = state.params

        # Per-EPOCH device residency: lr/do_lambda are constant across the
        # epoch's cycles and the update PRNG key evolves on-device inside the
        # cycle program, so each is shipped through the (tunneled) host link
        # once per epoch — not once per 80-transition cycle.  The fresh Jc
        # scalar rides the SAME transfer as the transition batch each cycle
        # (reference λ cadence, ddpg_lag.py:58-66), so it costs no extra
        # round trip.  The actor-weight fetch is issued asynchronously and
        # consumed by the NEXT cycle's first policy forward (same freshness
        # as a blocking fetch; the round trip overlaps env stepping).
        key, seed_key = jax.random.split(key)
        dev_key = jax.device_put(seed_key, dev)
        dev_lr, dev_do_lambda = jax.device_put((lr, do_lambda), dev)
        del Jc  # superseded by the per-cycle fresh window mean

        pending_actor = None
        for _ in range(self._samples_per_epoch):
            key, roll_key = jax.random.split(key)
            if pending_actor is not None:
                cpu_params = cpu_params.replace(actor=pending_actor)
                pending_actor = None
            use_rand = self._rand_warmup and int(state.global_step) <= start_learning
            carry, transitions, ep_m = runner.rollout(
                state.rollout, None, cpu_params, roll_key,
                self._update_cycle, use_rand,
            )
            global_step = state.global_step + self._update_cycle * self._num_envs
            state = state.replace(rollout=carry, global_step=global_step)
            ep_list.append(ep_m)

            jc_now = self._fresh_jc(ep_m)
            transitions, dev_jc = jax.device_put(
                (transitions, jnp.float32(jc_now)), dev
            )
            do_update = int(global_step) > start_learning
            learnable, self._accel_buffer, dev_key, m = self._accel_cycle_jit(
                learnable, self._accel_buffer, transitions, dev_key,
                dev_jc, dev_lr, dev_do_lambda, do_update,
            )
            if do_update:
                upd_list.append(m)
                pending_actor = jax.device_put(learnable[0].actor, cpu)

        self._accel_learnable = learnable
        params, a_opt, r_opt, c_opt, alpha, extra, update_count = learnable
        state = state.replace(
            key=key, params=jax.device_put(params, cpu),
            actor_opt=a_opt, reward_critic_opt=r_opt, cost_critic_opt=c_opt,
            alpha=alpha, extra=extra, update_count=update_count,
            buffer=self._accel_buffer,  # the pre-donation handle is stale
        )
        ep_metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *ep_list)
        if upd_list:
            upd_list = jax.device_get(upd_list)
            metrics = {k: jnp.mean(jnp.stack([m[k] for m in upd_list]))
                       for k in upd_list[0]}
        else:
            metrics = self._zero_update_metrics()
        return state, ep_metrics, metrics

    def _make_accel_epoch(self, state: OffPolicyTrainState):
        """Set up accelerator-resident learnable state + ring and the fused
        store+update program."""
        dev = self._learner_device

        learnable = (state.params, state.actor_opt, state.reward_critic_opt,
                     state.cost_critic_opt, state.alpha, state.extra,
                     state.update_count)
        self._accel_learnable = jax.device_put(learnable, dev)
        # allocate the ring ON the accelerator (it starts as zeros; shipping
        # the host-allocated one through the tunnel would move ~size*fields
        # bytes for nothing)
        with jax.default_device(dev):
            self._accel_buffer = self._buffer.init()

        def accel_cycle(learnable, buf_state, transitions, dev_key, Jc, lr,
                        do_lambda, do_update: bool):
            upd_key, next_key = jax.random.split(dev_key)

            def push(bs, tr):
                return self._buffer.store(bs, tr), ()

            buf_state, _ = jax.lax.scan(push, buf_state, transitions)
            if not do_update:
                return learnable, buf_state, next_key, self._zero_update_metrics()
            new_learnable, metrics = self._update_cycle_host(
                learnable, buf_state, upd_key, Jc, lr, do_lambda
            )
            return new_learnable, buf_state, next_key, metrics

        self._accel_cycle_jit = jax.jit(
            accel_cycle, static_argnums=7, donate_argnums=(1, 3)
        )
        return self._epoch_host_accel

    def _epoch_host(self, update_jit, state: OffPolicyTrainState,
                    Jc: Array, lr: Array, do_lambda: Array):
        """Host-mode epoch: Python cycle loop (host physics per step), the
        update scan stays one jitted call per cycle."""
        runner = self._host_runner
        start_learning = int(self._cfgs.algo_cfgs.start_learning_steps)
        ep_list, upd_list = [], []
        key = state.key
        for _ in range(self._samples_per_epoch):
            key, roll_key, upd_key = jax.random.split(key, 3)
            use_rand = self._rand_warmup and int(state.global_step) <= start_learning
            carry, buf_state, ep_m = runner.rollout(
                state.rollout, state.buffer, state.params, roll_key,
                self._update_cycle, use_rand,
            )
            state = state.replace(
                rollout=carry, buffer=buf_state,
                global_step=state.global_step + self._update_cycle * self._num_envs,
            )
            ep_list.append(ep_m)
            jc_now = jnp.asarray(self._fresh_jc(ep_m))
            if int(state.global_step) > start_learning:
                learnable = (state.params, state.actor_opt, state.reward_critic_opt,
                             state.cost_critic_opt, state.alpha, state.extra,
                             state.update_count)
                (params, a_opt, r_opt, c_opt, alpha, extra, update_count), m = update_jit(
                    learnable, state.buffer, upd_key, jc_now, lr, do_lambda
                )
                state = state.replace(
                    params=params, actor_opt=a_opt, reward_critic_opt=r_opt,
                    cost_critic_opt=c_opt, alpha=alpha, extra=extra,
                    update_count=update_count,
                )
                upd_list.append(m)
        state = state.replace(key=key)
        ep_metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *ep_list)
        if upd_list:
            metrics = {k: jnp.mean(jnp.stack([m[k] for m in upd_list]))
                       for k in upd_list[0]}
        else:
            metrics = self._zero_update_metrics()
        return state, ep_metrics, metrics

    # ------------------------------------------------------------- training
    def restore(self, checkpoint_path: str, start_epoch: int = 0) -> None:
        """Arm mid-training resume from a saved checkpoint: model/optimizer/
        multiplier state and step counters are restored; the replay ring and
        the env rollout carry restart fresh (they are transient).  The
        reference's checkpoints are save-only (reference:
        omnisafe/common/logger.py:175-194).  ``start_epoch`` resumes the
        epoch loop at that GLOBAL epoch with ``total_steps`` unchanged."""
        self._restore_path = checkpoint_path
        self._start_epoch = int(start_epoch)

    def _init_train_state(self) -> OffPolicyTrainState:
        self._key, model_key, env_key = jax.random.split(self._key, 3)
        params = self._actor_critic.init(model_key)
        runner = getattr(self, '_host_runner', None)
        rollout = runner.reset(env_key) if runner is not None else self._adapter.reset(env_key)
        state = OffPolicyTrainState(
            params=params,
            actor_opt=self._actor_tx.init(params.actor),
            reward_critic_opt=self._reward_critic_tx.init(params.reward_critic),
            cost_critic_opt=self._cost_critic_tx.init(params.cost_critic),
            alpha=self._alpha_init,
            buffer=self._global_buffer.init(),
            rollout=rollout,
            extra=self._extra_init,
            update_count=jnp.zeros((), jnp.int32),
            global_step=jnp.zeros((), jnp.int32),
            key=self._key,
        )
        restore_path = getattr(self, '_restore_path', None)
        if restore_path:
            from omnisafe_tpu.utils.checkpoint import (  # pylint: disable=import-outside-toplevel
                load_checkpoint,
                restore_into,
                restore_resume,
            )

            payload = load_checkpoint(restore_path)
            if 'resume' in payload:
                state = restore_resume(state, payload['resume'])
            elif 'params' in payload:
                state = state.replace(params=restore_into(state.params, payload['params']))
            else:
                raise KeyError(f'checkpoint {restore_path} has no resume/params payload')
            host = payload.get('host') or {}
            if 'jc_window' in host:
                self._jc_window.extend(
                    np.asarray(host['jc_window'], np.float64).reshape(-1).tolist()
                )
        return state

    def _store_episode_metrics(self, ep_metrics, prefix: str = 'Metrics/Ep') -> None:
        done = np.asarray(ep_metrics.done).reshape(-1)
        if done.any():
            ep_cost = np.asarray(ep_metrics.ep_cost).reshape(-1)[done]
            self._logger.store(
                **{
                    f'{prefix}Ret': np.asarray(ep_metrics.ep_ret).reshape(-1)[done],
                    f'{prefix}Cost': ep_cost,
                    f'{prefix}Len': np.asarray(ep_metrics.ep_len).reshape(-1)[done],
                }
            )
            limit = getattr(self, '_cost_limit_for_metrics', None)
            if limit is not None and prefix == 'Metrics/Ep':
                self._logger.store(
                    **{'Metrics/CostLimitHitRate': (ep_cost <= limit).astype(np.float64)}
                )

    def learn(self) -> Tuple[float, float, float]:
        """(reference: ddpg.py:254-348)."""
        from omnisafe_tpu.adapter.host_loop import (  # pylint: disable=import-outside-toplevel
            find_host_base,
        )

        start = time.time()
        host_mode = find_host_base(self._adapter.env) is not None
        if host_mode:
            assert self._num_devices == 1, 'host-backed envs are single-device'
            self._learner_device = self._pick_learner_device()
            external_store = self._learner_device is not None
            self._make_host_runners(external_store=external_store)
            eval_jit = lambda st, k: self._host_eval.eval_episode(st.params, k)  # noqa: E731
        else:
            epoch_jit = jax.jit(self._epoch_program)
            eval_jit = jax.jit(self._eval_program)
        state = self._init_train_state()
        if self._num_devices > 1:
            # SPMD: env streams + the replay ring shard over the dp mesh
            from omnisafe_tpu.parallel.offpolicy import (  # pylint: disable=import-outside-toplevel
                make_distributed_epoch,
                make_mesh,
            )

            mesh = make_mesh(self._num_devices)
            epoch_jit = make_distributed_epoch(self, mesh, state)
        if host_mode:
            if self._learner_device is not None:
                epoch_jit = self._make_accel_epoch(state)
                state = state.replace(buffer=self._accel_buffer)
            else:
                update_jit = jax.jit(self._update_cycle_host)
                epoch_jit = lambda st, Jc, lr, dl: self._epoch_host(update_jit, st, Jc, lr, dl)  # noqa: E731
        warmup_epochs = int(self._cfgs.algo_cfgs.get('warmup_epochs', -1))
        eval_episodes = int(self._cfgs.train_cfgs.get('eval_episodes', 1))
        # evaluation cadence in epochs: the reference evaluates once per
        # 2000-transition epoch (ddpg.py:268-336); smaller steps_per_epoch
        # settings can keep that cadence instead of paying a full eval
        # episode every epoch
        eval_freq = int(self._cfgs.train_cfgs.get('eval_epoch_freq', 1))
        decay = bool(self._cfgs.model_cfgs.get('linear_lr_decay', False))

        start_epoch = int(getattr(self, '_start_epoch', 0))
        self._logger.set_epoch(start_epoch)
        for epoch in range(start_epoch, self._epochs):
            epoch_start = time.time()
            Jc = self._logger.get_stats('Metrics/EpCost')[0]
            lr = self._actor_lr * max(1.0 - epoch / max(self._epochs, 1), 0.0) if decay else self._actor_lr
            do_lambda = epoch > warmup_epochs

            state, ep_metrics, metrics = epoch_jit(
                state, jnp.asarray(Jc), jnp.asarray(lr), jnp.asarray(do_lambda)
            )
            jax.block_until_ready(metrics['Loss/Loss_pi'])
            state = self._between_epochs(state)
            rollout_update_time = time.time() - epoch_start

            eval_time = 0.0
            if eval_episodes > 0 and (epoch + 1) % eval_freq == 0:
                eval_start = time.time()
                self._key, eval_key = jax.random.split(self._key)
                test_ret, test_cost, test_len = eval_jit(state, eval_key)
                self._logger.store(
                    **{
                        'Metrics/TestEpRet': np.asarray(test_ret),
                        'Metrics/TestEpCost': np.asarray(test_cost),
                        'Metrics/TestEpLen': np.asarray(test_len),
                    }
                )
                eval_time = time.time() - eval_start

            # episode metrics shaped (cycles, steps, B)
            self._store_episode_metrics(ep_metrics)
            host_metrics = {k: float(v) for k, v in metrics.items()}
            if not self._cfgs.algo_cfgs.use_cost:
                host_metrics.pop('Loss/Loss_cost_critic', None)
                host_metrics.pop('Value/cost_critic', None)
            self._logger.store(**host_metrics)
            self._post_epoch_log(state)
            self._logger.store(
                **{
                    'Train/Epoch': epoch,
                    'Train/LR': lr,
                    'TotalEnvSteps': int(state.global_step),
                    'Time/Rollout': rollout_update_time,
                    'Time/Update': 0.0,
                    'Time/Evaluate': eval_time,
                    'Time/Epoch': time.time() - epoch_start,
                    'Time/Total': time.time() - start,
                    'Time/FPS': self._steps_per_epoch / max(time.time() - epoch_start, 1e-9),
                }
            )
            from omnisafe_tpu.utils.checkpoint import resume_state_dict  # pylint: disable=import-outside-toplevel

            # lazy: materialized only when a checkpoint is actually written
            self._logger.setup_saver({
                'params': lambda: state.params,
                'resume': lambda: resume_state_dict(state, exclude=('buffer', 'rollout')),
                # λ's episode-cost window lives host-side; persist it so a
                # mid-run resume does not transiently feed λ a Jc of 0 until
                # fresh episodes refill the window
                'host': lambda: {
                    'jc_window': np.asarray(list(self._jc_window), np.float64),
                },
                'config': self._cfgs.todict(),
            })
            if (epoch + 1) % int(self._cfgs.logger_cfgs.save_model_freq) == 0:
                self._logger.save()
            self._logger.dump_tabular()

        ret = self._logger.get_stats('Metrics/EpRet')[0]
        cost = self._logger.get_stats('Metrics/EpCost')[0]
        length = self._logger.get_stats('Metrics/EpLen')[0]
        self._logger.save(tag='final')
        self._logger.close()
        self._final_state = state
        return ret, cost, length


__all__ = ['DDPG', 'OffPolicyTrainState']
