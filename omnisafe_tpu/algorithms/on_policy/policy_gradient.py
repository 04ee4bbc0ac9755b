"""Policy Gradient — the on-policy training template.

Counterpart of the reference's ``PolicyGradient`` (reference:
omnisafe/algorithms/on_policy/base/policy_gradient.py:39-589), re-designed as
two jitted programs per epoch instead of a Python step loop:

* ``rollout``: one ``lax.scan`` over time of (batched policy forward + vmapped
  env step) followed by the segmented advantage scans — replacing the
  reference's per-step numpy marshaling + per-path ``finish_path``.
* ``update``: the minibatch SGD sweep as a ``lax.scan`` over update iterations
  with an inner minibatch scan; the KL early stop
  (reference: policy_gradient.py:383-397) becomes a carried ``stop`` flag that
  masks the remaining iterations via ``lax.cond``.

The per-minibatch ``distributed.avg_grads`` allreduce
(reference: policy_gradient.py:442,482,523) becomes a ``lax.pmean`` inside the
compiled step when a mesh axis is configured; advantage standardization uses
cross-device moments exactly where the reference does
(reference: onpolicy_buffer.py:231-236).

The mean episode cost ``Jc`` used by Lagrangian subclasses is read from the
host logger's episode window between the two jitted calls, matching the
reference's placement (reference: ppo_lag.py:52-80).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from omnisafe_tpu.adapter.onpolicy import OnPolicyAdapter, RolloutCarry
from omnisafe_tpu.algorithms.base_algo import BaseAlgo
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.advantages import OnPolicyBatch, compute_batch
from omnisafe_tpu.common.logger import Logger
from omnisafe_tpu.models.actor_critic import ACParams, ConstraintActorCritic
from omnisafe_tpu.utils.config import configured_cost_limit
from omnisafe_tpu.utils.math import global_mean_std
from omnisafe_tpu.utils.schedule import PiecewiseSchedule

Array = jax.Array


@struct.dataclass
class OnPolicyTrainState:
    """All device-resident training state for the on-policy family."""

    params: ACParams
    actor_opt: Any
    reward_critic_opt: Any
    cost_critic_opt: Any
    rollout: RolloutCarry
    extra: Any
    key: Array


def _make_tx(use_clip: bool, max_norm: float) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping; the learning rate is applied
    by the caller so it can be annealed without rebuilding the optimizer."""
    steps = [optax.clip_by_global_norm(max_norm)] if use_clip else []
    steps += [optax.scale_by_adam(), optax.scale(-1.0)]
    return optax.chain(*steps)


def _apply_tx(tx, grads, opt_state, params, lr):
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: u * lr, updates)
    return optax.apply_updates(params, updates), opt_state


def _l2_sum(params) -> Array:
    return sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params))


@registry.register
class PolicyGradient(BaseAlgo):
    """REINFORCE-style surrogate with GAE baselines."""

    _algo_type = 'on-policy'

    # ------------------------------------------------------------------ init
    def _init_env(self) -> None:
        cfgs = self._cfgs
        num_envs = int(cfgs.train_cfgs.vector_env_nums)
        num_devices = int(cfgs.train_cfgs.get('num_devices', 1))
        steps_per_epoch = int(cfgs.algo_cfgs.steps_per_epoch)
        assert steps_per_epoch % (num_envs * num_devices) == 0, (
            'steps_per_epoch must divide by vector_env_nums * num_devices '
            '(reference: policy_gradient.py:70-77)'
        )
        # like the reference, vector_env_nums is per-device; the adapter owns
        # the *global* env batch, sharded over the mesh when num_devices > 1
        self._num_devices = num_devices
        if num_devices > 1:
            self._axis_name = 'dp'
        self._steps_per_env = steps_per_epoch // (num_envs * num_devices)
        self._steps_per_epoch = steps_per_epoch
        self._epochs = int(cfgs.train_cfgs.total_steps) // steps_per_epoch
        self._adapter = OnPolicyAdapter(
            self._env_id, num_envs * num_devices, cfgs.algo_cfgs, **self._env_kwargs()
        )

    def _env_kwargs(self) -> Dict[str, Any]:
        """Hook for adapter-variant subclasses (Saute/Simmer/EarlyTerminated)."""
        return {}

    def _init_model(self) -> None:
        cfgs = self._cfgs
        self._actor_critic = ConstraintActorCritic(
            self._adapter.observation_space, self._adapter.action_space, cfgs.model_cfgs
        )
        algo = cfgs.algo_cfgs
        use_clip = bool(algo.get('use_max_grad_norm', False))
        max_norm = float(algo.get('max_grad_norm', 40.0))
        self._actor_tx = _make_tx(use_clip, max_norm)
        self._reward_critic_tx = _make_tx(use_clip, max_norm)
        self._cost_critic_tx = _make_tx(use_clip, max_norm)
        actor_lr = cfgs.model_cfgs.actor.lr
        self._actor_lr = float(actor_lr) if actor_lr is not None else 0.0
        self._critic_lr = float(cfgs.model_cfgs.critic.lr)
        if cfgs.model_cfgs.get('exploration_noise_anneal', False):
            lo, hi = cfgs.model_cfgs.std_range[1], cfgs.model_cfgs.std_range[0]
            self._std_schedule: Optional[PiecewiseSchedule] = PiecewiseSchedule(
                endpoints=[(0, hi), (self._epochs, lo)], outside_value=lo
            )
        else:
            self._std_schedule = None

    def _init(self) -> None:
        """Algorithm-specific state; Lagrangian subclasses override
        (reference: policy_gradient.py:107-131, ppo_lag.py:32-39)."""
        self._extra_init: Any = None

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
        log.register_key('Train/Epoch')
        log.register_key('Train/Entropy')
        log.register_key('Train/KL')
        log.register_key('Train/StopIter')
        log.register_key('Train/PolicyRatio')
        log.register_key('Train/LR')
        log.register_key('Train/PolicyStd')
        log.register_key('TotalEnvSteps')
        log.register_key('Loss/Loss_pi', delta=True)
        log.register_key('Loss/Loss_reward_critic', delta=True)
        log.register_key('Value/reward')
        if self._cfgs.algo_cfgs.use_cost:
            log.register_key('Loss/Loss_cost_critic', delta=True)
            log.register_key('Value/cost')
        log.register_key('Time/Total')
        log.register_key('Time/Rollout')
        log.register_key('Time/Update')
        log.register_key('Time/Epoch')
        log.register_key('Time/FPS')
        # BASELINE target: cost-limit hit rate tracked per config — fraction
        # of finished episodes in the window satisfying EpCost <= limit.
        self._cost_limit_for_metrics = configured_cost_limit(cfgs)
        if self._cost_limit_for_metrics is not None:
            log.register_key('Metrics/CostLimitHitRate', window_length=window)
        self._register_extra_keys(log)

    def _register_extra_keys(self, log: Logger) -> None:
        """Subclass hook for additional logged keys."""

    # -------------------------------------------------------- pure functions
    def _compute_adv_surrogate(self, extra: Any, adv_r: Array, adv_c: Array) -> Array:
        """PolicyGradient uses only the reward advantage
        (reference: policy_gradient.py:526-543)."""
        del extra, adv_c
        return adv_r

    def _loss_pi(
        self, actor_params: Any, extra: Any, obs: Array, act: Array, logp: Array, adv: Array
    ) -> Tuple[Array, Dict[str, Array]]:
        """Importance-sampled PG surrogate (reference: policy_gradient.py:545-589)."""
        del extra
        dist = self._actor_critic.actor.apply(actor_params, obs)
        logp_ = dist.log_prob(act)
        ratio = jnp.exp(logp_ - logp)
        loss = -jnp.mean(ratio * adv)
        aux = {
            'entropy': jnp.mean(dist.entropy()),
            'ratio': jnp.mean(ratio),
            'std': jnp.mean(dist.scale),
        }
        return loss, aux

    def _update_extra(self, extra: Any, Jc: Array) -> Tuple[Any, Dict[str, Array]]:
        """Pre-update multiplier dynamics; Lagrangian subclasses override."""
        del Jc
        return extra, {}

    def _loss_pi_mb(
        self, actor_params: Any, extra: Any, mb: 'OnPolicyBatch', old_dist_mb: Any
    ) -> Tuple[Array, Dict[str, Array]]:
        """Per-minibatch actor loss hook.  The default routes through
        ``_compute_adv_surrogate`` + ``_loss_pi``; algorithms whose loss needs
        the behavior distribution (FOCOPS, CUP's projection phase) override
        this and use ``old_dist_mb``."""
        del old_dist_mb
        adv = self._compute_adv_surrogate(extra, mb.adv_r, mb.adv_c)
        return self._loss_pi(actor_params, extra, mb.obs, mb.act, mb.logp, adv)

    def _pre_epoch(self, state: 'OnPolicyTrainState', epoch: int) -> 'OnPolicyTrainState':
        """Host-side hook before each epoch's rollout (Simmer budget control,
        std annealing live here)."""
        del epoch
        return state

    def _critic_loss(self, cparams: Any, critic, obs: Array, target: Array) -> Array:
        pred = critic.apply(cparams, obs)
        loss = jnp.mean(jnp.square(pred - target))
        if self._cfgs.algo_cfgs.use_critic_norm:
            loss = loss + float(self._cfgs.algo_cfgs.critic_norm_coef) * _l2_sum(cparams)
        return loss

    def _standardize_batch(self, batch: OnPolicyBatch) -> OnPolicyBatch:
        """Cross-device advantage standardization exactly where the reference
        does it (reference: onpolicy_buffer.py:231-236)."""
        algo = self._cfgs.algo_cfgs
        adv_r, adv_c = batch.adv_r, batch.adv_c
        if algo.standardized_rew_adv:
            mean, std = global_mean_std(adv_r, self._axis_name)
            adv_r = (adv_r - mean) / (std + 1e-8)
        if algo.standardized_cost_adv:
            mean, _ = global_mean_std(adv_c, self._axis_name)
            adv_c = adv_c - mean
        return batch.replace(adv_r=adv_r, adv_c=adv_c)

    # ------------------------------------------------------------- programs
    def _assemble(self, traj, last_vr, last_vc):
        """Batch assembly from a collected trajectory (jittable, shared by the
        device rollout and the host-driven rollout)."""
        algo = self._cfgs.algo_cfgs
        batch = compute_batch(
            traj,
            last_vr,
            last_vc,
            gamma=float(algo.gamma),
            cost_gamma=float(algo.cost_gamma),
            lam=float(algo.lam),
            lam_c=float(algo.lam_c),
            estimator=str(algo.adv_estimation_method),
            penalty_coef=float(algo.get('penalty_coef', 0.0)),
        )
        value_stats = {
            'Value/reward': self._pmean(jnp.mean(traj.value_r)),
            'Value/cost': self._pmean(jnp.mean(traj.value_c)),
        }
        return batch, value_stats

    def _rollout_program(self, state: OnPolicyTrainState):
        """One epoch of experience + batch assembly (jitted)."""
        key, rkey = jax.random.split(state.key)
        if self._axis_name is not None:
            # decorrelate per-device randomness while the carried key stays
            # replicated across the mesh
            rkey = jax.random.fold_in(rkey, jax.lax.axis_index(self._axis_name))
        carry, traj, last_vr, last_vc, ep_metrics = self._adapter.rollout(
            state.rollout, state.params, self._actor_critic, rkey, self._steps_per_env
        )
        batch, value_stats = self._assemble(traj, last_vr, last_vc)
        return state.replace(rollout=carry, key=key), batch, ep_metrics, value_stats

    def _make_host_rollout(self):
        """Host-driven collection for host-backed envs (MuJoCo et al.): the
        Python loop owns physics, one small jitted program per step handles
        normalizers + policy, and batch assembly stays jitted (see
        adapter/host_loop.py for why io_callback-in-scan is wrong here)."""
        from omnisafe_tpu.adapter.host_fast import (  # pylint: disable=import-outside-toplevel
            FastHostOnPolicyRunner,
            Ineligible,
        )
        from omnisafe_tpu.adapter.host_loop import (  # pylint: disable=import-outside-toplevel
            HostRolloutRunner,
        )

        assert self._num_devices == 1, 'host-backed envs are single-process'
        try:
            # numpy fast path for the standard stack (physics-bound; see
            # adapter/host_fast.py) — falls back to the generic jitted-step
            # runner for Saute/Simmer stacks and non-gaussian actors
            runner = FastHostOnPolicyRunner(self._adapter.env, self._actor_critic)
        except Ineligible:
            runner = HostRolloutRunner(self._adapter.env, self._actor_critic)
        self._host_runner = runner
        assemble_jit = jax.jit(self._assemble)

        def rollout_fn(state: OnPolicyTrainState):
            key, rkey = jax.random.split(state.key)
            carry, traj, last_vr, last_vc, ep_metrics = runner.rollout(
                state.rollout, state.params, None, rkey, self._steps_per_env
            )
            batch, value_stats = assemble_jit(traj, last_vr, last_vc)
            return state.replace(rollout=carry, key=key), batch, ep_metrics, value_stats

        return rollout_fn

    # pylint: disable-next=too-many-locals,too-many-statements
    def _update_program(self, state: OnPolicyTrainState, batch: OnPolicyBatch, Jc: Array, lr: Array):
        """Minibatch SGD sweep with KL early stop (jitted)."""
        algo = self._cfgs.algo_cfgs
        ac = self._actor_critic
        extra, extra_metrics = self._update_extra(state.extra, Jc)
        batch = self._standardize_batch(batch)

        old_dist = ac.actor.apply(state.params.actor, batch.obs)
        n = batch.obs.shape[0]
        batch_size = min(int(algo.batch_size), n)
        num_minibatches = max(n // batch_size, 1)
        update_iters = int(algo.update_iters)
        use_cost = bool(algo.use_cost)
        kl_early_stop = bool(algo.get('kl_early_stop', False))
        target_kl = float(algo.target_kl)

        key, *iter_keys = jax.random.split(state.key, update_iters + 1)
        iter_keys = jnp.stack(iter_keys)

        def minibatch_step(carry, mb_idx):
            params, a_opt, r_opt, c_opt = carry
            mb = jax.tree.map(lambda x: x[mb_idx], batch)
            # reward critic (reference: policy_gradient.py:407-446)
            r_loss, r_grads = jax.value_and_grad(self._critic_loss)(
                params.reward_critic, ac.reward_critic, mb.obs, mb.target_value_r
            )
            r_grads = self._pmean(r_grads)
            new_rc, r_opt = _apply_tx(
                self._reward_critic_tx, r_grads, r_opt, params.reward_critic, self._critic_lr
            )
            # cost critic (reference: policy_gradient.py:448-489)
            if use_cost:
                c_loss, c_grads = jax.value_and_grad(self._critic_loss)(
                    params.cost_critic, ac.cost_critic, mb.obs, mb.target_value_c
                )
                c_grads = self._pmean(c_grads)
                new_cc, c_opt = _apply_tx(
                    self._cost_critic_tx, c_grads, c_opt, params.cost_critic, self._critic_lr
                )
            else:
                c_loss, new_cc = jnp.zeros(()), params.cost_critic
            # actor (reference: policy_gradient.py:491-543)
            old_dist_mb = jax.tree.map(lambda x: x[mb_idx], old_dist)
            (pi_loss, aux), a_grads = jax.value_and_grad(self._loss_pi_mb, has_aux=True)(
                params.actor, extra, mb, old_dist_mb
            )
            a_grads = self._pmean(a_grads)
            new_actor, a_opt = _apply_tx(self._actor_tx, a_grads, a_opt, params.actor, lr)
            params = ACParams(actor=new_actor, reward_critic=new_rc, cost_critic=new_cc)
            mb_metrics = {
                'Loss/Loss_pi': pi_loss,
                'Loss/Loss_reward_critic': r_loss,
                'Loss/Loss_cost_critic': c_loss,
                'Train/Entropy': aux['entropy'],
                'Train/PolicyRatio': aux['ratio'],
                'Train/PolicyStd': aux['std'],
            }
            return (params, a_opt, r_opt, c_opt), mb_metrics

        def iter_step(carry, iter_key):
            params, a_opt, r_opt, c_opt, stop, count, final_kl = carry

            def run(_):
                perm = jax.random.permutation(iter_key, n)
                idx = perm[: num_minibatches * batch_size].reshape(num_minibatches, batch_size)
                (new_params, na, nr, nc), mb_metrics = jax.lax.scan(
                    minibatch_step, (params, a_opt, r_opt, c_opt), idx
                )
                new_dist = ac.actor.apply(new_params.actor, batch.obs)
                kl = self._pmean(jnp.mean(old_dist.kl(new_dist)))
                return new_params, na, nr, nc, kl, jax.tree.map(jnp.mean, mb_metrics)

            def skip(_):
                zeros = {
                    'Loss/Loss_pi': jnp.zeros(()),
                    'Loss/Loss_reward_critic': jnp.zeros(()),
                    'Loss/Loss_cost_critic': jnp.zeros(()),
                    'Train/Entropy': jnp.zeros(()),
                    'Train/PolicyRatio': jnp.zeros(()),
                    'Train/PolicyStd': jnp.zeros(()),
                }
                return params, a_opt, r_opt, c_opt, final_kl, zeros

            new_params, a_opt, r_opt, c_opt, kl, mb_metrics = jax.lax.cond(stop, skip, run, None)
            executed = jnp.logical_not(stop)
            count = count + executed.astype(jnp.int32)
            new_stop = jnp.logical_or(stop, kl > target_kl) if kl_early_stop else stop
            out = dict(mb_metrics)
            out['_executed'] = executed.astype(jnp.float32)
            return (new_params, a_opt, r_opt, c_opt, new_stop, count, kl), out

        init = (
            state.params,
            state.actor_opt,
            state.reward_critic_opt,
            state.cost_critic_opt,
            jnp.zeros((), bool),
            jnp.zeros((), jnp.int32),
            jnp.zeros(()),
        )
        (params, a_opt, r_opt, c_opt, _, count, final_kl), iter_metrics = jax.lax.scan(
            iter_step, init, iter_keys
        )

        weights = iter_metrics.pop('_executed')
        total = jnp.maximum(jnp.sum(weights), 1.0)
        metrics = {k: jnp.sum(v * weights) / total for k, v in iter_metrics.items()}
        metrics['Train/KL'] = final_kl
        metrics['Train/StopIter'] = count.astype(jnp.float32)
        metrics['Value/Adv'] = jnp.mean(batch.adv_r)
        metrics.update(extra_metrics)
        # shard-local loss means -> cross-device means, so the host logger
        # sees the same statistics the reference's dist_avg would produce
        metrics = jax.tree.map(self._pmean, metrics)

        new_state = state.replace(
            params=params,
            actor_opt=a_opt,
            reward_critic_opt=r_opt,
            cost_critic_opt=c_opt,
            extra=extra,
            key=key,
        )
        return new_state, metrics

    # ------------------------------------------------------------- training
    def restore(self, checkpoint_path: str, start_epoch: int = 0) -> None:
        """Arm mid-training resume from a saved ``train_state`` checkpoint —
        a capability the reference lacks (its checkpoints are save-only,
        reference: omnisafe/common/logger.py:175-194).

        ``start_epoch`` is the GLOBAL epoch to continue from: the epoch loop
        resumes there with ``total_steps`` unchanged, so epoch-indexed
        schedules (linear lr decay, std annealing) continue exactly where the
        interrupted run left off, and Train/Epoch / TotalEnvSteps / checkpoint
        names stay on the global axis."""
        self._restore_path = checkpoint_path
        self._start_epoch = int(start_epoch)

    def _init_train_state(self) -> OnPolicyTrainState:
        self._key, model_key, env_key = jax.random.split(self._key, 3)
        params = self._actor_critic.init(model_key)
        runner = getattr(self, '_host_runner', None)
        rollout = runner.reset(env_key) if runner is not None else self._adapter.reset(env_key)
        state = OnPolicyTrainState(
            params=params,
            actor_opt=self._actor_tx.init(params.actor),
            reward_critic_opt=self._reward_critic_tx.init(params.reward_critic),
            cost_critic_opt=self._cost_critic_tx.init(params.cost_critic),
            rollout=rollout,
            extra=self._extra_init,
            key=self._key,
        )
        restore_path = getattr(self, '_restore_path', None)
        if restore_path:
            from omnisafe_tpu.utils.checkpoint import (  # pylint: disable=import-outside-toplevel
                load_checkpoint,
                restore_into,
            )

            payload = load_checkpoint(restore_path)
            if 'train_state' in payload:
                state = restore_into(state, payload['train_state'])
            elif 'params' in payload:
                state = state.replace(params=restore_into(state.params, payload['params']))
            else:
                raise KeyError(f'checkpoint {restore_path} has no train_state/params')
        return state

    def _actor_lr_at(self, epoch: int) -> float:
        """LinearLR over epochs (reference: actor_critic.py:99-113)."""
        if self._cfgs.model_cfgs.get('linear_lr_decay', False):
            return self._actor_lr * max(1.0 - epoch / max(self._epochs, 1), 0.0)
        return self._actor_lr

    def _set_std(self, state: OnPolicyTrainState, epoch: int) -> OnPolicyTrainState:
        """Std annealing via log_std surgery (reference: actor_critic.py:157-183)."""
        if self._std_schedule is None:
            return state
        std = self._std_schedule.value(epoch)
        actor = jax.tree_util.tree_map(lambda x: x, state.params.actor)  # shallow copy
        actor['params']['log_std'] = jnp.full_like(
            state.params.actor['params']['log_std'], float(np.log(std))
        )
        return state.replace(params=state.params.replace(actor=actor))

    def _store_episode_metrics(self, ep_metrics) -> None:
        if jax.process_count() > 1:
            # all processes see the global episode set, so the logger windows
            # (and the Jc every rank feeds its λ/trust-region update) stay
            # identical — the reference's dist_statistics_scalar placement
            # (reference: onpolicy_buffer.py:231-236, logger.py:344-374)
            from omnisafe_tpu.parallel.launch import gather_pytree  # pylint: disable=import-outside-toplevel

            ep_metrics = gather_pytree(ep_metrics)
        else:
            # one batched transfer instead of a round trip per field
            ep_metrics = jax.device_get(ep_metrics)
        done = np.asarray(ep_metrics.done).reshape(-1)
        if done.any():
            ep_cost = np.asarray(ep_metrics.ep_cost).reshape(-1)[done]
            self._logger.store(
                **{
                    'Metrics/EpRet': np.asarray(ep_metrics.ep_ret).reshape(-1)[done],
                    'Metrics/EpCost': ep_cost,
                    'Metrics/EpLen': np.asarray(ep_metrics.ep_len).reshape(-1)[done],
                }
            )
            limit = getattr(self, '_cost_limit_for_metrics', None)
            if limit is not None:
                self._logger.store(
                    **{'Metrics/CostLimitHitRate': (ep_cost <= limit).astype(np.float64)}
                )

    def learn(self) -> Tuple[float, float, float]:
        """Epoch loop (reference: policy_gradient.py:238-306)."""
        from omnisafe_tpu.adapter.host_loop import (  # pylint: disable=import-outside-toplevel
            find_host_base,
        )

        start = time.time()
        host_rollout = (
            self._make_host_rollout() if find_host_base(self._adapter.env) is not None else None
        )
        state = self._init_train_state()
        multiproc = jax.process_count() > 1
        if self._num_devices > 1:
            # SPMD over the dp mesh axis (reference's torchrun DP, compiled in)
            from omnisafe_tpu.parallel.onpolicy import (  # pylint: disable=import-outside-toplevel
                make_distributed_programs,
                make_mesh,
                make_state_spec,
            )

            mesh = make_mesh(self._num_devices)
            rollout_jit, update_jit = make_distributed_programs(self, mesh, state)
            if multiproc:
                # every process computed the identical full state (the
                # sync_params analog); lift it onto the cross-process mesh
                from omnisafe_tpu.parallel.launch import globalize_state  # pylint: disable=import-outside-toplevel

                state = globalize_state(
                    state, make_state_spec(state, self._adapter.num_envs), mesh
                )
        else:
            rollout_jit = host_rollout or jax.jit(self._rollout_program)
            # the assembled batch is consumed by the update and never reused;
            # donating it lets XLA recycle the epoch's largest buffer in place
            update_jit = jax.jit(self._update_program, donate_argnums=1)
        def ckpt_view(tree):
            """Full-state view for serialization.  On a multi-process mesh
            the dp-sharded rollout leaves are not locally addressable; every
            rank allgathers them (collective — all ranks save together) so
            each serializes the complete state."""
            if not multiproc:
                return tree
            from omnisafe_tpu.parallel.launch import gather_pytree  # pylint: disable=import-outside-toplevel

            raw = jax.tree.map(
                lambda l: jax.random.key_data(l)
                if hasattr(l, 'dtype') and jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key)
                else l,
                tree,
            )
            return gather_pytree(raw)

        # lazy closures: ``state`` is rebound each epoch and only materialized
        # (device_get) when a checkpoint is actually written
        self._logger.setup_saver({
            'params': lambda: state.params,
            'train_state': lambda: ckpt_view(state),
            'config': self._cfgs.todict(),
        })

        start_epoch = int(getattr(self, '_start_epoch', 0))
        self._logger.set_epoch(start_epoch)
        for epoch in range(start_epoch, self._epochs):
            epoch_start = time.time()
            state = self._set_std(state, epoch)
            state = self._pre_epoch(state, epoch)

            state, batch, ep_metrics, value_stats = rollout_jit(state)
            jax.block_until_ready(batch.obs)
            rollout_time = time.time() - epoch_start

            self._store_episode_metrics(ep_metrics)
            Jc = self._logger.get_stats('Metrics/EpCost')[0]
            lr = self._actor_lr_at(epoch)

            update_start = time.time()
            state, metrics = update_jit(state, batch, jnp.asarray(Jc), jnp.asarray(lr))
            # single batched device->host transfer for all scalar metrics
            metrics, value_stats = jax.device_get((metrics, value_stats))
            update_time = time.time() - update_start

            host_metrics = {k: float(v) for k, v in metrics.items()}
            if not self._cfgs.algo_cfgs.use_cost:
                host_metrics.pop('Loss/Loss_cost_critic', None)
            host_metrics.pop('Value/Adv', None)
            self._logger.store(**host_metrics)
            self._logger.store(
                **{
                    'Train/Epoch': epoch,
                    'Train/LR': lr,
                    'TotalEnvSteps': (epoch + 1) * self._steps_per_epoch,
                    'Value/reward': float(value_stats['Value/reward']),
                    'Time/Rollout': rollout_time,
                    'Time/Update': update_time,
                    'Time/Epoch': time.time() - epoch_start,
                    'Time/Total': time.time() - start,
                    'Time/FPS': self._steps_per_epoch / max(time.time() - epoch_start, 1e-9),
                }
            )
            if self._cfgs.algo_cfgs.use_cost:
                self._logger.store(**{'Value/cost': float(value_stats['Value/cost'])})

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


__all__ = ['PolicyGradient', 'OnPolicyTrainState']
