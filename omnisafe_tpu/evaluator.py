"""Evaluator: reconstruct a trained policy stack from a run dir and evaluate it.

Counterpart of the reference Evaluator (reference:
omnisafe/evaluator.py:58-629).  ``load_saved(run_dir)`` reads ``config.json``
+ a checkpoint and rebuilds the *full* policy stack the run trained with:

* the actor (on-/off-policy) — reference: evaluator.py:290-307;
* the obs normalizer, restored from the checkpointed running statistics and
  applied (and updated, like the reference's ``Normalizer.normalize``) during
  evaluation — reference: evaluator.py:172-178;
* Saute/Simmer observation augmentation via the same ``SauteWrapper`` used in
  training — reference: evaluator.py:160-171;
* offline actors, by rebuilding the algorithm's model stack and restoring its
  saved state (``BaseAlgo.for_evaluation``) — reference: evaluator.py:290-303;
* model-based planners, by restoring the dynamics ensemble + planner state
  and running the trainer's own planner-driven eval program — reference:
  evaluator.py:225-289.

``render`` draws trajectory plots for the pure-JAX navigation envs (there is
no MuJoCo pixel stream to record here).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.common.normalizer import RunningStats
from omnisafe_tpu.envs.wrappers import NormalizeState, ObsNormalize
from omnisafe_tpu.models.actor_critic import ConstraintActorCritic, ConstraintActorQCritic
from omnisafe_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
from omnisafe_tpu.utils.config import Config

Array = jax.Array


def _extract_obs_stats(payload: Any, cfgs: Config, algo: str) -> Optional[RunningStats]:
    """Pull the obs normalizer's running stats out of a checkpoint.

    The stats live in the wrapper-state pytree carried by the rollout
    (``train_state.rollout.env_state``); the nesting order mirrors the
    wrapper build order (adapter/onpolicy.py:40-76): outer wrapper (Saute),
    then Cost/Reward/ObsNormalize inward.
    """
    train_state = payload.get('train_state')
    if train_state is None:
        return None
    node = train_state.get('rollout', {}).get('env_state')
    if node is None:
        return None
    algo_cfgs = cfgs.algo_cfgs
    if not algo_cfgs.get('obs_normalize', False):
        return None
    if 'Saute' in algo or 'Simmer' in algo:
        node = node['env']
    if algo_cfgs.get('cost_normalize', False):
        node = node['env']
    if algo_cfgs.get('reward_normalize', False):
        node = node['env']
    stats = node['stats']
    return RunningStats(
        mean=jnp.asarray(stats['mean']),
        var=jnp.asarray(stats['var']),
        count=jnp.asarray(stats['count']),
    )


def _graft_stats(state: Any, stats: RunningStats) -> Any:
    """Install restored running stats into a freshly reset eval-env state
    (the eval stack has exactly one NormalizeState — the obs normalizer)."""
    if isinstance(state, NormalizeState):
        return state.replace(stats=stats)
    if hasattr(state, 'env'):
        return state.replace(env=_graft_stats(state.env, stats))
    return state


def _find_stats(state: Any) -> Optional[RunningStats]:
    """Read the obs normalizer's stats out of a wrapper-state pytree."""
    if isinstance(state, NormalizeState):
        return state.stats
    if hasattr(state, 'env'):
        return _find_stats(state.env)
    return None


class Evaluator:
    """Load + evaluate saved policies (reference: evaluator.py:58-629)."""

    def __init__(self) -> None:
        self._cfgs: Optional[Config] = None
        self._env_id: Optional[str] = None
        self._algo: Optional[str] = None
        self._predict = None
        self._env = None
        self._raw_env = None
        self._obs_stats: Optional[RunningStats] = None
        self._obs_clip: float = 5.0
        self._mb_eval = None  # model-based planner eval closure

    # ------------------------------------------------------------- loading
    def load_saved(self, save_dir: str, checkpoint: Optional[str] = None) -> None:
        """(reference: evaluator.py:355-397)."""
        config_path = os.path.join(save_dir, 'config.json')
        if not os.path.exists(config_path):
            raise FileNotFoundError(f'no config.json under {save_dir}')
        with open(config_path, encoding='utf-8') as f:
            cfgs = Config(**json.load(f))
        self._cfgs = cfgs
        ckpt_path = checkpoint or latest_checkpoint(save_dir)
        if ckpt_path is None:
            raise FileNotFoundError(f'no checkpoint under {save_dir}/save')
        payload = load_checkpoint(ckpt_path)

        # prefer the self-describing config; fall back to the
        # '<env_id>---<Algo>' run-dir convention for older runs
        if 'algo' in cfgs and 'env_id' in cfgs:
            algo, env_id = str(cfgs['algo']), str(cfgs['env_id'])
        else:
            exp = os.path.basename(os.path.dirname(os.path.normpath(save_dir)))
            env_id, algo = exp.split('---')
        self._env_id = env_id
        self._algo = algo

        from omnisafe_tpu.algorithms import ALGORITHM2TYPE  # pylint: disable=import-outside-toplevel

        family = ALGORITHM2TYPE.get(algo, 'on-policy')
        self._family = family
        if family == 'offline':
            self._load_offline(payload)
        elif family == 'model-based':
            self._load_model_based(payload)
        else:
            self._load_online(payload, family)

    # --------------------------------------------------- family-specific
    def _build_eval_stack(self) -> None:
        """Eval env = training wrapper stack minus reward/cost normalization
        (evaluation reports raw rewards/costs, reference: evaluator.py:150-178),
        with the obs normalizer's statistics restored from the checkpoint."""
        from omnisafe_tpu.adapter.onpolicy import build_env_stack  # pylint: disable=import-outside-toplevel

        cfgs, algo = self._cfgs, self._algo
        eval_algo_cfgs = Config(**cfgs.algo_cfgs.todict())
        eval_algo_cfgs['reward_normalize'] = False
        eval_algo_cfgs['cost_normalize'] = False

        outer = None
        if 'Saute' in algo or 'Simmer' in algo:
            from omnisafe_tpu.adapter.saute import SauteWrapper  # pylint: disable=import-outside-toplevel

            a = cfgs.algo_cfgs

            def outer(env):  # noqa: F811
                return SauteWrapper(
                    env,
                    num_envs=1,
                    safety_budget=float(a.safety_budget),
                    saute_gamma=float(a.saute_gamma),
                    unsafe_reward=float(a.unsafe_reward),
                    max_ep_len=int(a.max_ep_len),
                    upper_budget=float(a.get('upper_budget', a.safety_budget)),
                    simmer='Simmer' in algo,
                )

        self._env = build_env_stack(self._env_id, 1, eval_algo_cfgs, outer_wrapper=outer)
        raw = self._env
        while hasattr(raw, '_env'):
            # evaluate under the SAME obs clamp the stack trained with, not a
            # hardcoded default (the wrapper's clip is configurable)
            if isinstance(raw, ObsNormalize):
                self._obs_clip = raw._clip  # pylint: disable=protected-access
            raw = raw._env  # pylint: disable=protected-access
        self._raw_env = raw

    def _load_online(self, payload: Any, family: str) -> None:
        self._build_eval_stack()
        self._obs_stats = _extract_obs_stats(payload, self._cfgs, self._algo)
        if self._cfgs.algo_cfgs.get('obs_normalize', False) and self._obs_stats is None:
            raise ValueError(
                'run trained with obs_normalize but the checkpoint carries no '
                'normalizer statistics — refusing to evaluate on raw observations'
            )
        params = payload.get('params')
        if params is None or 'actor' not in params:
            raise NotImplementedError('checkpoint does not contain an actor')
        actor_state = jax.tree.map(jnp.asarray, params['actor'])
        model_cfgs = self._cfgs.model_cfgs
        model_cls = ConstraintActorQCritic if family == 'off-policy' else ConstraintActorCritic
        model = model_cls(self._env.observation_space, self._env.action_space, model_cfgs)
        actor = model.actor

        def predict(obs: Array, key: Array) -> Array:
            del key
            dist_or_act = actor.apply(actor_state, obs)
            if hasattr(dist_or_act, 'mode'):
                return dist_or_act.mode()
            return dist_or_act

        self._predict = predict

    def _load_offline(self, payload: Any) -> None:
        """Rebuild the offline algorithm's model stack and restore its state
        (reference: evaluator.py:290-303)."""
        from omnisafe_tpu.algorithms.registry import registry  # pylint: disable=import-outside-toplevel
        from omnisafe_tpu.utils.checkpoint import restore_into  # pylint: disable=import-outside-toplevel

        if 'state' not in payload:
            raise NotImplementedError('offline checkpoint has no state payload')
        algo_obj = registry.get(self._algo).for_evaluation(self._env_id, self._cfgs)
        template = algo_obj._init_state()  # pylint: disable=protected-access
        state = restore_into(template, payload['state'])
        self._build_eval_stack()

        def predict(obs: Array, key: Array) -> Array:
            return algo_obj._predict(state, obs, key)  # pylint: disable=protected-access

        self._predict = predict

    def _load_model_based(self, payload: Any) -> None:
        """Restore dynamics ensemble + planner and evaluate through the
        trainer's own planner-driven eval program
        (reference: evaluator.py:225-289 rebuilds the planner by algo name)."""
        from omnisafe_tpu.algorithms.registry import registry  # pylint: disable=import-outside-toplevel
        from omnisafe_tpu.utils.checkpoint import restore_resume  # pylint: disable=import-outside-toplevel

        if 'resume' not in payload:
            raise NotImplementedError('model-based checkpoint has no resume payload')
        algo_obj = registry.get(self._algo).for_evaluation(self._env_id, self._cfgs)
        state = algo_obj._init_train_state()  # pylint: disable=protected-access
        state = restore_resume(state, payload['resume'])
        self._raw_env = algo_obj._env  # pylint: disable=protected-access
        self._env = self._raw_env
        lagrange = jnp.asarray(algo_obj._lagrange_value())  # pylint: disable=protected-access
        eval_jit = jax.jit(algo_obj._eval_program)  # pylint: disable=protected-access

        def mb_eval(key: Array):
            return eval_jit(state, key, lagrange)

        self._mb_eval = mb_eval

    # ---------------------------------------------------------- evaluation
    def evaluate(self, num_episodes: int = 10, seed: int = 0) -> Tuple[float, float, float]:
        """Deterministic episodes (reference: evaluator.py:399-492)."""
        assert self._env is not None or self._mb_eval is not None, 'call load_saved first'

        if self._mb_eval is not None:
            rets, costs, lens = [], [], []
            for i in range(num_episodes):
                ret, cost, length = self._mb_eval(jax.random.key(seed + i))
                rets.append(float(ret))
                costs.append(float(cost))
                lens.append(float(length))
                print(f'Episode {i}: reward={rets[-1]:.3f} cost={costs[-1]:.3f} '
                      f'len={lens[-1]:.0f}')
            print(f'Average: reward={np.mean(rets):.3f} cost={np.mean(costs):.3f}')
            return float(np.mean(rets)), float(np.mean(costs)), float(np.mean(lens))

        env = self._env
        max_steps = self._raw_env.max_episode_steps
        obs_stats = self._obs_stats
        obs_clip = self._obs_clip

        @jax.jit
        def one_episode(key: Array):
            reset_key, roll_key = jax.random.split(key)
            env_state, obs = env.reset(reset_key)
            if obs_stats is not None:
                # the freshly reset stack normalized the first obs with blank
                # statistics; invert that (normalize is affine, no clipping)
                # and redo it under the restored statistics
                fresh = _find_stats(env_state)
                d = obs_stats.mean.shape[-1]
                raw0 = fresh.unnormalize(obs[..., :d])
                obs = jnp.concatenate(
                    [obs_stats.normalize(raw0, clip=obs_clip), obs[..., d:]], axis=-1
                )
                env_state = _graft_stats(env_state, obs_stats)

            def body(carry, _):
                env_state, obs, rng, ep_ret, ep_cost, ep_len, alive = carry
                rng, a_key, s_key = jax.random.split(rng, 3)
                act = self._predict(obs, a_key)
                env_state, ts = env.step(env_state, act, s_key)
                # report raw rewards/costs (Saute replaces the reward but
                # keeps the original in info, adapter/saute.py:92-106)
                reward = ts.info.get('original_reward', ts.reward)
                cost = ts.info.get('original_cost', ts.cost)
                live = alive.astype(jnp.float32)
                ep_ret = ep_ret + reward[0] * live
                ep_cost = ep_cost + cost[0] * live
                ep_len = ep_len + live
                alive = jnp.logical_and(alive, jnp.logical_not(ts.done[0]))
                return (env_state, ts.obs, rng, ep_ret, ep_cost, ep_len, alive), None

            init = (env_state, obs, roll_key, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
                    jnp.ones((), bool))
            (_, _, _, ep_ret, ep_cost, ep_len, _), _ = jax.lax.scan(
                body, init, None, length=max_steps
            )
            return ep_ret, ep_cost, ep_len

        rets, costs, lens = [], [], []
        for i in range(num_episodes):
            ret, cost, length = one_episode(jax.random.key(seed + i))
            rets.append(float(ret))
            costs.append(float(cost))
            lens.append(float(length))
            print(f'Episode {i}: reward={rets[-1]:.3f} cost={costs[-1]:.3f} len={lens[-1]:.0f}')
        print(f'Average: reward={np.mean(rets):.3f} cost={np.mean(costs):.3f}')
        return float(np.mean(rets)), float(np.mean(costs)), float(np.mean(lens))

    # ------------------------------------------------------------- render
    def render(self, num_episodes: int = 1, save_replay_path: Optional[str] = None,
               seed: int = 0, video: bool = True, fps: int = 25,
               stride: int = 4) -> None:
        """Episode replays for navigation envs: a trajectory PNG plus an
        animated GIF per episode (the counterpart of the reference's moviepy
        pixel recording, reference: evaluator.py:511-629 — these analytic
        envs have no camera, so the replay is the world-frame scene: agent
        trail, goal, hazards, with the frame border flashing on cost).

        ``video=False`` skips the GIF (PNG only); ``stride`` subsamples env
        steps per animation frame to keep files small."""
        assert self._env is not None, 'call load_saved first'
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt  # pylint: disable=import-outside-toplevel
        from matplotlib import animation  # pylint: disable=import-outside-toplevel

        raw = self._raw_env
        if not hasattr(raw, '_dynamics'):
            raise NotImplementedError(f'render is only supported for navigation envs, got {self._env_id}')

        for ep in range(num_episodes):
            key = jax.random.key(seed + ep)
            key, reset_key = jax.random.split(key)
            state, obs = raw.reset(reset_key)
            positions = [np.asarray(state.pos)]
            costs = [0.0]
            for _ in range(raw.max_episode_steps):
                key, a_key, s_key = jax.random.split(key, 3)
                act = self._predict(obs[None, :], a_key)[0]
                state, ts = raw.step(state, act, s_key)
                obs = ts.obs
                positions.append(np.asarray(state.pos))
                costs.append(float(ts.cost))
            positions_arr = np.stack(positions)
            costs_arr = np.asarray(costs)
            goal = np.asarray(state.goal)
            hazards = np.asarray(state.hazards)
            out_dir = save_replay_path or '.'
            os.makedirs(out_dir, exist_ok=True)

            def scene(ax):
                ax.plot(goal[0], goal[1], 'g*', markersize=15, label='goal')
                for hz in hazards:
                    ax.add_patch(plt.Circle(hz, 0.2, color='red', alpha=0.3))
                ax.set_xlim(-2.2, 2.2)
                ax.set_ylim(-2.2, 2.2)
                ax.set_title(f'{self._env_id} episode {ep}')

            # static trajectory plot
            fig, ax = plt.subplots(figsize=(6, 6))
            ax.plot(positions_arr[:, 0], positions_arr[:, 1], '-', lw=1)
            scene(ax)
            fig.savefig(os.path.join(out_dir, f'episode-{ep}.png'), dpi=120)
            plt.close(fig)

            if not video:
                continue
            fig, ax = plt.subplots(figsize=(4, 4), dpi=80)
            scene(ax)
            trail, = ax.plot([], [], '-', lw=1, color='C0')
            dot, = ax.plot([], [], 'o', color='C0', markersize=6)
            frames = range(0, len(positions_arr), max(int(stride), 1))

            def draw(t):
                trail.set_data(positions_arr[:t + 1, 0], positions_arr[:t + 1, 1])
                dot.set_data(positions_arr[t:t + 1, 0], positions_arr[t:t + 1, 1])
                unsafe = costs_arr[t] > 0
                for spine in ax.spines.values():
                    spine.set_color('red' if unsafe else 'black')
                    spine.set_linewidth(3 if unsafe else 1)
                return trail, dot

            anim = animation.FuncAnimation(fig, draw, frames=frames, blit=False)
            anim.save(os.path.join(out_dir, f'episode-{ep}.gif'),
                      writer=animation.PillowWriter(fps=fps))
            plt.close(fig)


__all__ = ['Evaluator']
