"""Evaluator: reconstruct a trained policy from a run directory and evaluate it.

Counterpart of the reference Evaluator (reference:
omnisafe/evaluator.py:58-629): ``load_saved(run_dir)`` reads ``config.json``
+ the newest checkpoint, rebuilds the env stack and model, and ``evaluate``
rolls deterministic episodes.  ``render`` draws trajectory plots for the
pure-JAX navigation envs (there is no MuJoCo pixel stream to record here).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.envs.core import make
from omnisafe_tpu.envs.wrappers import ActionScale, AutoReset, TimeLimit, Vectorize
from omnisafe_tpu.models.actor_critic import ConstraintActorCritic, ConstraintActorQCritic
from omnisafe_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
from omnisafe_tpu.utils.config import Config

Array = jax.Array


class Evaluator:
    """Load + evaluate saved policies."""

    def __init__(self) -> None:
        self._cfgs: Optional[Config] = None
        self._env_id: Optional[str] = None
        self._predict = None
        self._env = None
        self._raw_env = None

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

        # run dirs are named '<env_id>---<Algo>'
        exp = os.path.basename(os.path.dirname(os.path.normpath(save_dir)))
        env_id, algo = exp.split('---')
        self._env_id = env_id
        self._algo = algo

        env = make(env_id)
        self._raw_env = env
        stack = env
        if env.need_time_limit_wrapper:
            stack = TimeLimit(stack, env.max_episode_steps)
        if env.need_auto_reset_wrapper:
            stack = AutoReset(stack)
        stack = Vectorize(stack, 1)
        stack = ActionScale(stack, -1.0, 1.0)
        self._env = stack

        self._build_predict(payload)

    def _build_predict(self, payload: Any) -> None:
        cfgs = self._cfgs
        env = self._raw_env
        if 'params' in payload and 'actor' in payload['params']:
            params = payload['params']
            actor_state = params['actor']
            model_cfgs = cfgs.model_cfgs
            if 'target_actor' in params:  # off-policy checkpoint
                model = ConstraintActorQCritic(
                    env.observation_space, env.action_space, model_cfgs
                )
            else:
                model = ConstraintActorCritic(
                    env.observation_space, env.action_space, model_cfgs
                )
            actor = model.actor

            def predict(obs: Array, key: Array) -> Array:
                dist_or_act = actor.apply(
                    jax.tree.map(jnp.asarray, actor_state), obs
                )
                if hasattr(dist_or_act, 'mode'):
                    return dist_or_act.mode()
                return dist_or_act

            self._predict = predict
        else:
            raise NotImplementedError(
                'checkpoint does not contain an actor; offline/model-based runs are '
                'evaluated through their own trainers'
            )

    # ---------------------------------------------------------- evaluation
    def evaluate(self, num_episodes: int = 10, seed: int = 0) -> Tuple[float, float, float]:
        """Deterministic episodes (reference: evaluator.py:399-492)."""
        assert self._env is not None, 'call load_saved first'
        env = self._env
        max_steps = self._raw_env.max_episode_steps

        @jax.jit
        def one_episode(key: Array):
            reset_key, roll_key = jax.random.split(key)
            env_state, obs = env.reset(reset_key)

            def body(carry, _):
                env_state, obs, rng, ep_ret, ep_cost, ep_len, alive = carry
                rng, a_key, s_key = jax.random.split(rng, 3)
                act = self._predict(obs, a_key)
                env_state, ts = env.step(env_state, act, s_key)
                live = alive.astype(jnp.float32)
                ep_ret = ep_ret + ts.reward[0] * live
                ep_cost = ep_cost + ts.cost[0] * live
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
               seed: int = 0) -> None:
        """Trajectory plots for navigation envs (reference's moviepy pixel
        rendering has no counterpart for analytic envs — reference:
        evaluator.py:511-629)."""
        assert self._env is not None, 'call load_saved first'
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt  # pylint: disable=import-outside-toplevel

        raw = self._raw_env
        if not hasattr(raw, '_dynamics'):
            raise NotImplementedError(f'render is only supported for navigation envs, got {self._env_id}')

        for ep in range(num_episodes):
            key = jax.random.key(seed + ep)
            key, reset_key = jax.random.split(key)
            state, obs = raw.reset(reset_key)
            positions = [np.asarray(state.pos)]
            for _ in range(raw.max_episode_steps):
                key, a_key, s_key = jax.random.split(key, 3)
                act = self._predict(obs[None, :], a_key)[0]
                state, ts = raw.step(state, act, s_key)
                obs = ts.obs
                positions.append(np.asarray(state.pos))
            positions_arr = np.stack(positions)
            fig, ax = plt.subplots(figsize=(6, 6))
            ax.plot(positions_arr[:, 0], positions_arr[:, 1], '-', lw=1)
            goal = np.asarray(state.goal)
            ax.plot(goal[0], goal[1], 'g*', markersize=15, label='goal')
            hazards = np.asarray(state.hazards)
            for hz in hazards:
                ax.add_patch(plt.Circle(hz, 0.2, color='red', alpha=0.3))
            ax.set_xlim(-2.2, 2.2)
            ax.set_ylim(-2.2, 2.2)
            ax.set_title(f'{self._env_id} episode {ep}')
            out_dir = save_replay_path or '.'
            os.makedirs(out_dir, exist_ok=True)
            fig.savefig(os.path.join(out_dir, f'episode-{ep}.png'), dpi=120)
            plt.close(fig)


__all__ = ['Evaluator']
