"""PETS — the model-based training template (+ CCE/RCE/CAP variants).

Counterpart of the reference PETS (reference:
omnisafe/algorithms/model_based/base/pets.py:42-542) and its planner-swap
subclasses (cce_pets.py, rce_pets.py, cap_pets.py:34-156).  The reference's
callback-driven host loop (modelbased_adapter.py:227-352) becomes: per
dynamics cycle, one jitted *collect* program (scan of plan -> action-repeat
env step -> transition store, with episode-boundary planner resets), then a
host-controlled dynamics-ensemble fit with holdout early stopping, then a
jitted planner-driven evaluation episode.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from omnisafe_tpu.adapter.onpolicy import RolloutCarry
from omnisafe_tpu.algorithms.base_algo import BaseAlgo
from omnisafe_tpu.algorithms.model_based.planners import CAPPlanner, CCEPlanner, CEMPlanner, PlanState, RCEPlanner
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.buffer.offpolicy import ReplayBuffer, ReplayBufferState
from omnisafe_tpu.common.lagrange import Lagrange
from omnisafe_tpu.common.logger import Logger
from omnisafe_tpu.envs.core import make
from omnisafe_tpu.envs.wrappers import ActionRepeat, ActionScale, AutoReset, TimeLimit, Vectorize
from omnisafe_tpu.models.ensemble import DynamicsEnsemble, DynamicsState
from omnisafe_tpu.utils.config import configured_cost_limit

Array = jax.Array


@struct.dataclass
class ModelBasedTrainState:
    dynamics: DynamicsState
    buffer: ReplayBufferState
    plan_state: PlanState
    rollout: RolloutCarry
    extra: Any
    global_step: Array
    key: Array


@registry.register
class PETS(BaseAlgo):
    """Probabilistic Ensembles with Trajectory Sampling."""

    _algo_type = 'model-based'
    _planner_cls: Type[CEMPlanner] = CEMPlanner

    # ------------------------------------------------------------------ init
    def _init_env(self) -> None:
        cfgs = self._cfgs
        self._action_repeat = int(cfgs.algo_cfgs.action_repeat)
        from omnisafe_tpu.envs.core import _ENV_REGISTRY  # pylint: disable=import-outside-toplevel

        cls = _ENV_REGISTRY.get(self._env_id)
        if cls is not None and getattr(cls, 'is_vectorized', False):
            # host-backed env: owns its batch dim, auto-reset, time limit,
            # and action repeat (an ordered io_callback cannot sit under
            # vmapped/jitted ActionRepeat control flow)
            env = make(self._env_id, num_envs=1,
                       action_repeat=self._action_repeat)
            self._raw_env = env
            limit = env.max_episode_steps // self._action_repeat
            self._plan_steps_per_episode = limit
            stack = ActionScale(env, -1.0, 1.0)
        else:
            env = make(self._env_id)
            self._raw_env = env
            limit = env.max_episode_steps // self._action_repeat
            self._plan_steps_per_episode = limit
            stack = ActionRepeat(env, self._action_repeat)
            stack = TimeLimit(stack, limit)
            stack = AutoReset(stack)
            stack = Vectorize(stack, 1)
            stack = ActionScale(stack, -1.0, 1.0)
        self._env = stack
        self._steps_per_epoch = int(cfgs.algo_cfgs.steps_per_epoch)
        self._epochs = int(cfgs.train_cfgs.total_steps) // self._steps_per_epoch
        self._dynamics_cycle = int(cfgs.algo_cfgs.update_dynamics_cycle)
        self._plan_steps_per_cycle = max(self._dynamics_cycle // self._action_repeat, 1)
        self._plan_chunk = int(cfgs.planner_cfgs.get('plan_chunk', 1))
        assert self._plan_steps_per_cycle % self._plan_chunk == 0, (
            'plan_chunk must divide update_dynamics_cycle // action_repeat'
        )
        assert self._plan_chunk <= int(cfgs.planner_cfgs.plan_horizon), (
            'plan_chunk cannot exceed plan_horizon (the executed prefix is '
            'part of the optimized sequence)'
        )
        self._cycles_per_epoch = max(self._steps_per_epoch // self._dynamics_cycle, 1)

    def _init_model(self) -> None:
        cfgs = self._cfgs
        dyn = cfgs.dynamics_cfgs
        obs_dim = self._raw_env.observation_space.shape[0]
        act_dim = self._raw_env.action_space.shape[0]
        cost_func = getattr(self._raw_env, 'cost_from_obs', None)
        self._dynamics = DynamicsEnsemble(
            state_dim=obs_dim,
            action_dim=act_dim,
            num_ensemble=int(dyn.num_ensemble),
            elite_size=int(dyn.elite_size),
            hidden_size=int(dyn.hidden_size),
            reward_size=int(dyn.reward_size),
            predict_reward=bool(dyn.predict_reward),
            use_cost=bool(dyn.use_cost),
            cost_func=cost_func,
            use_decay=bool(dyn.use_decay),
            batch_size=int(dyn.batch_size),
            max_epoch=int(dyn.max_epoch),
        )
        self._planner = self._planner_cls(
            self._dynamics,
            cfgs.planner_cfgs,
            gamma=float(cfgs.algo_cfgs.gamma),
            cost_gamma=float(cfgs.algo_cfgs.cost_gamma),
            action_dim=act_dim,
            **self._planner_kwargs(),
        )

    def _planner_kwargs(self) -> Dict[str, Any]:
        return {}

    def _init(self) -> None:
        capacity = int(self._cfgs.train_cfgs.total_steps) // self._action_repeat + 1
        self._buffer = ReplayBuffer(
            obs_dim=self._raw_env.observation_space.shape[0],
            act_dim=self._raw_env.action_space.shape[0],
            capacity=capacity,
            num_envs=1,
        )
        self._extra_init: Any = None

    def _init_log(self) -> None:
        cfgs = self._cfgs
        self._logger = Logger(
            output_dir=cfgs.logger_cfgs.log_dir,
            exp_name=f'{self._env_id}---{type(self).__name__}',
            seed=self._seed,
            use_tensorboard=bool(cfgs.logger_cfgs.use_tensorboard),
            use_wandb=bool(cfgs.logger_cfgs.use_wandb),
            wandb_project=str(cfgs.logger_cfgs.get('wandb_project', 'omnisafe_tpu')),
            verbose=bool(cfgs.logger_cfgs.get('verbose', False)),
            use_profiler=bool(cfgs.logger_cfgs.get('use_profiler', False)),
            config=cfgs,
        )
        log = self._logger
        window = int(cfgs.logger_cfgs.window_lens)
        log.register_key('Metrics/EpRet', window_length=window, min_and_max=True)
        log.register_key('Metrics/EpCost', window_length=window, min_and_max=True)
        log.register_key('Metrics/EpLen', window_length=window, min_and_max=True)
        # BASELINE target: cost-limit hit rate tracked per config
        self._cost_limit_for_metrics = configured_cost_limit(cfgs)
        if self._cost_limit_for_metrics is not None:
            log.register_key('Metrics/CostLimitHitRate', window_length=window)
        log.register_key('Train/Epoch')
        log.register_key('TotalEnvSteps')
        log.register_key('Loss/DynamicsTrainMseLoss')
        log.register_key('Loss/DynamicsValMseLoss')
        for key in self._planner.info_keys:
            log.register_key(key)
        if cfgs.evaluation_cfgs.use_eval:
            log.register_key('EvalMetrics/EpRet', window_length=5)
            log.register_key('EvalMetrics/EpCost', window_length=5)
            log.register_key('EvalMetrics/EpLen', window_length=5)
            log.register_key('Time/Eval')
        log.register_key('Time/Total')
        log.register_key('Time/Rollout')
        log.register_key('Time/UpdateDynamics')
        log.register_key('Time/Epoch')
        log.register_key('Time/FPS')
        self._register_extra_keys(log)

    def _register_extra_keys(self, log: Logger) -> None:
        """Subclass hook."""

    # ------------------------------------------------------------- programs
    def _zero_plan_info(self) -> Dict[str, Array]:
        return {k: jnp.zeros(()) for k in self._planner.info_keys}

    def _plan(self, state, plan_state, obs: Array, key: Array, lagrange: Array,
              chunk: int = 1):
        """Planner dispatch hook; LOOP passes actor-critic params through."""
        return self._planner.plan(state.dynamics, plan_state, obs, key, lagrange,
                                  chunk=chunk)

    # pylint: disable-next=too-many-locals
    def _collect_program(self, state: ModelBasedTrainState, use_planner: Array, lagrange: Array):
        """One dynamics cycle of environment interaction (jitted).

        Each outer step plans ONCE and executes the first ``plan_chunk``
        actions of the optimized receding-horizon sequence open-loop
        (``planner_cfgs.plan_chunk``, default 1 = the reference's
        replan-every-step, planner/cem.py:227-271).  Chunking divides both
        planner compute and — through a remote tunnel — dispatch round
        trips per env step by the chunk size."""
        chunk = self._plan_chunk
        act_dim = self._raw_env.action_space.shape[0]

        def body(st: ModelBasedTrainState, step_key):
            plan_key, rand_key, scan_key = jax.random.split(step_key, 3)

            def planned(_):
                acts, ps, info = self._plan(
                    st, st.plan_state, st.rollout.obs[0], plan_key, lagrange,
                    chunk=chunk,
                )
                return acts, ps, info

            def random(_):
                acts = jax.random.uniform(
                    rand_key, (chunk, act_dim), minval=-1.0, maxval=1.0
                )
                return acts, st.plan_state, self._zero_plan_info()

            acts, plan_state, plan_info = jax.lax.cond(use_planner, planned, random, None)

            def exec_step(carry, inp):
                rollout, buffer = carry
                act, env_key = inp
                act = act[None, :]
                env_state, ts = self._env.step(rollout.env_state, act, env_key)
                done = ts.done
                real_next = jnp.where(done[:, None], ts.final_obs, ts.obs)
                buffer = self._buffer.store(buffer, {
                    'obs': rollout.obs,
                    'act': act,
                    'reward': ts.reward,
                    'cost': ts.cost,
                    'done': ts.terminated.astype(jnp.float32),
                    'next_obs': real_next,
                })
                ep_ret = rollout.ep_ret + ts.reward
                ep_cost = rollout.ep_cost + ts.cost
                ep_len = rollout.ep_len + float(self._action_repeat)
                record = (done, ep_ret, ep_cost, ep_len)
                not_done = 1.0 - done.astype(jnp.float32)
                rollout = RolloutCarry(
                    env_state=env_state, obs=ts.obs, ep_ret=ep_ret * not_done,
                    ep_cost=ep_cost * not_done, ep_len=ep_len * not_done,
                )
                return (rollout, buffer), record

            env_keys = jax.random.split(scan_key, chunk)
            # Boundary behavior with plan_chunk > 1: an episode ending
            # mid-chunk still executes the remaining open-loop actions
            # (optimized for the terminated episode's state) on the freshly
            # reset episode — only the warm start resets, below, after the
            # whole chunk.  Up to chunk-1 post-reset steps therefore act on a
            # stale plan; acceptable for small chunks (the throughput win is
            # 26-82x, benchmarks/mb_throughput.py) and exact for the shipped
            # plan_chunk: 1 defaults.
            (rollout, buffer), records = jax.lax.scan(
                exec_step, (st.rollout, st.buffer), (acts, env_keys)
            )
            # planner warm start resets at episode boundaries (any within the
            # executed chunk)
            any_done = jnp.any(records[0])
            plan_state = jax.tree.map(
                lambda fresh, cur: jnp.where(any_done, fresh, cur),
                self._planner.init(), plan_state,
            )
            new_st = st.replace(
                rollout=rollout, buffer=buffer, plan_state=plan_state,
                global_step=st.global_step + self._action_repeat * chunk,
            )
            return new_st, (records, plan_info)

        key, scan_key = jax.random.split(state.key)
        n_plans = self._plan_steps_per_cycle // chunk
        keys = jax.random.split(scan_key, n_plans)
        state, ((done, ep_ret, ep_cost, ep_len), plan_infos) = jax.lax.scan(
            body, state.replace(key=key), keys
        )
        # (n_plans, chunk, ...) -> (steps, ...) in execution order
        done, ep_ret, ep_cost, ep_len = (
            x.reshape(-1, *x.shape[2:]) for x in (done, ep_ret, ep_cost, ep_len)
        )
        plan_info = jax.tree.map(lambda x: x[-1], plan_infos)
        return state, (done, ep_ret, ep_cost, ep_len), plan_info

    def _eval_program(self, state: ModelBasedTrainState, key: Array, lagrange: Array):
        """Planner-driven evaluation episode (reference: pets.py:400-495)."""
        reset_key, roll_key = jax.random.split(key)
        env_state, obs = self._env.reset(reset_key)

        def body(carry, step_key):
            env_state, obs, plan_state, ep_ret, ep_cost, ep_len, alive = carry
            plan_key, env_key = jax.random.split(step_key)
            act, plan_state, _ = self._plan(state, plan_state, obs[0], plan_key, lagrange)
            env_state, ts = self._env.step(env_state, act, env_key)  # act: (1, A)
            live = alive.astype(jnp.float32)
            ep_ret = ep_ret + ts.reward[0] * live
            ep_cost = ep_cost + ts.cost[0] * live
            ep_len = ep_len + float(self._action_repeat) * live
            alive = jnp.logical_and(alive, jnp.logical_not(ts.done[0]))
            return (env_state, ts.obs, plan_state, ep_ret, ep_cost, ep_len, alive), None

        keys = jax.random.split(roll_key, self._plan_steps_per_episode)
        (_, _, _, ep_ret, ep_cost, ep_len, _), _ = jax.lax.scan(
            body,
            (env_state, obs, self._planner.init(), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
             jnp.ones((), bool)),
            keys,
        )
        return ep_ret, ep_cost, ep_len

    # ------------------------------------------------------------- dynamics
    def _train_dynamics(self, state: ModelBasedTrainState) -> Tuple[ModelBasedTrainState, float, float]:
        """(reference: pets.py:302-335)."""
        size = int(state.buffer.size)
        data = jax.device_get(state.buffer.data)
        obs = data['obs'][:size, 0]
        act = data['act'][:size, 0]
        reward = data['reward'][:size, 0]
        next_obs = data['next_obs'][:size, 0]
        inputs = np.concatenate([obs, act], axis=-1)
        targets = np.concatenate([reward[:, None], next_obs - obs], axis=-1)
        rng = np.random.default_rng(int(state.global_step))
        dyn_state, train_mse, val_mse = self._dynamics.train(
            state.dynamics, inputs, targets, holdout_ratio=0.2, rng=rng
        )
        return state.replace(dynamics=dyn_state), train_mse, val_mse

    def _post_collect(self, state: 'ModelBasedTrainState') -> 'ModelBasedTrainState':
        """Hook after each collect+dynamics cycle (LOOP's policy updates)."""
        return state

    def _lagrange_value(self) -> float:
        return 0.0

    def _update_epoch(self) -> None:
        """Per-epoch hook (CAP's λ ascent lives here, reference: cap_pets.py:149-156)."""

    # ------------------------------------------------------------- training
    def restore(self, checkpoint_path: str) -> None:
        """Arm mid-training resume: dynamics-ensemble/planner/policy state and
        step counters restore; the transition buffer and env carry restart
        fresh (the reference can only save, omnisafe/common/logger.py:175-194)."""
        self._restore_path = checkpoint_path

    def _init_train_state(self) -> ModelBasedTrainState:
        self._key, dyn_key, env_key = jax.random.split(self._key, 3)
        env_state, obs = self._env.reset(env_key)
        zeros = jnp.zeros((1,))
        state = ModelBasedTrainState(
            dynamics=self._dynamics.init(dyn_key),
            buffer=self._buffer.init(),
            plan_state=self._planner.init(),
            rollout=RolloutCarry(env_state=env_state, obs=obs, ep_ret=zeros,
                                 ep_cost=zeros, ep_len=zeros),
            extra=self._extra_init,
            global_step=jnp.zeros((), jnp.int32),
            key=self._key,
        )
        restore_path = getattr(self, '_restore_path', None)
        if restore_path:
            from omnisafe_tpu.utils.checkpoint import (  # pylint: disable=import-outside-toplevel
                load_checkpoint,
                restore_resume,
            )

            payload = load_checkpoint(restore_path)
            if 'resume' not in payload:
                raise KeyError(f'checkpoint {restore_path} has no resume payload')
            state = restore_resume(state, payload['resume'])
        return state

    def learn(self) -> Tuple[float, float, float]:
        """(reference: pets.py:236-290)."""
        start = time.time()
        state = self._init_train_state()
        collect_jit = jax.jit(self._collect_program)
        eval_jit = jax.jit(self._eval_program)
        start_learning = int(self._cfgs.algo_cfgs.start_learning_steps)
        use_eval = bool(self._cfgs.evaluation_cfgs.use_eval)

        for epoch in range(self._epochs):
            epoch_start = time.time()
            rollout_time = 0.0
            dynamics_time = 0.0
            for _ in range(self._cycles_per_epoch):
                t0 = time.time()
                use_planner = int(state.global_step) > start_learning
                state, (done, ep_ret, ep_cost, ep_len), plan_info = collect_jit(
                    state, jnp.asarray(use_planner), jnp.asarray(self._lagrange_value())
                )
                jax.block_until_ready(state.global_step)
                rollout_time += time.time() - t0
                done_np = np.asarray(done).reshape(-1)
                if done_np.any():
                    finished_costs = np.asarray(ep_cost).reshape(-1)[done_np]
                    self._logger.store(
                        **{
                            'Metrics/EpRet': np.asarray(ep_ret).reshape(-1)[done_np],
                            'Metrics/EpCost': finished_costs,
                            'Metrics/EpLen': np.asarray(ep_len).reshape(-1)[done_np],
                        }
                    )
                    limit = getattr(self, '_cost_limit_for_metrics', None)
                    if limit is not None:
                        self._logger.store(
                            **{'Metrics/CostLimitHitRate':
                               (finished_costs <= limit).astype(np.float64)}
                        )
                if use_planner:
                    self._logger.store(**{k: float(v) for k, v in plan_info.items()})
                t0 = time.time()
                state, train_mse, val_mse = self._train_dynamics(state)
                dynamics_time += time.time() - t0
                self._logger.store(
                    **{'Loss/DynamicsTrainMseLoss': train_mse,
                       'Loss/DynamicsValMseLoss': val_mse}
                )
                state = self._post_collect(state)

            if int(state.global_step) > start_learning:
                self._update_epoch()

            if use_eval:
                t0 = time.time()
                self._key, eval_key = jax.random.split(self._key)
                ret, cost, length = eval_jit(state, eval_key,
                                             jnp.asarray(self._lagrange_value()))
                self._logger.store(
                    **{'EvalMetrics/EpRet': float(ret), 'EvalMetrics/EpCost': float(cost),
                       'EvalMetrics/EpLen': float(length), 'Time/Eval': time.time() - t0}
                )

            self._logger.store(
                **{
                    'Train/Epoch': epoch,
                    'TotalEnvSteps': int(state.global_step),
                    'Time/Rollout': rollout_time,
                    'Time/UpdateDynamics': dynamics_time,
                    'Time/Epoch': time.time() - epoch_start,
                    'Time/Total': time.time() - start,
                    'Time/FPS': self._steps_per_epoch / max(time.time() - epoch_start, 1e-9),
                }
            )
            from omnisafe_tpu.utils.checkpoint import resume_state_dict  # pylint: disable=import-outside-toplevel

            self._logger.setup_saver({
                'dynamics': jax.device_get(state.dynamics.params),
                'resume': resume_state_dict(state, exclude=('buffer', 'rollout')),
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


@registry.register
class CCEPETS(PETS):
    """PETS with constrained cross-entropy planning (reference: cce_pets.py)."""

    _planner_cls = CCEPlanner

    def _planner_kwargs(self) -> Dict[str, Any]:
        return {'cost_limit': float(self._cfgs.algo_cfgs.cost_limit)}


@registry.register
class RCEPETS(PETS):
    """PETS with robust cross-entropy planning (reference: rce_pets.py)."""

    _planner_cls = RCEPlanner

    def _planner_kwargs(self) -> Dict[str, Any]:
        return {'cost_limit': float(self._cfgs.algo_cfgs.cost_limit)}


@registry.register
class CAPPETS(PETS):
    """PETS with conservative-adaptive-penalty planning + λ ascent
    (reference: cap_pets.py:34-156)."""

    _planner_cls = CAPPlanner

    def _planner_kwargs(self) -> Dict[str, Any]:
        return {'cost_limit': float(self._cfgs.lagrange_cfgs.cost_limit)}

    def _init(self) -> None:
        super()._init()
        self._lagrange = Lagrange(**self._cfgs.lagrange_cfgs.todict())
        self._lagrange_state = self._lagrange.init()

    def _register_extra_keys(self, log: Logger) -> None:
        log.register_key('Metrics/LagrangeMultiplier')

    def _lagrange_value(self) -> float:
        return float(self._lagrange_state.multiplier)

    def _update_epoch(self) -> None:
        Jc = self._logger.get_stats('Metrics/EpCost')[0]
        self._lagrange_state = self._lagrange.update(self._lagrange_state, jnp.asarray(Jc))
        self._logger.store(**{'Metrics/LagrangeMultiplier': self._lagrange_value()})


__all__ = ['PETS', 'CCEPETS', 'RCEPETS', 'CAPPETS', 'ModelBasedTrainState']
