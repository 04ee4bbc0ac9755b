"""Host-side MuJoCo velocity environments (the non-jittable escape hatch).

The reference marshals numpy<->torch around host MuJoCo every step
(reference: omnisafe/envs/safety_gymnasium_env.py:160-210, mujoco_env.py:
42-186); the TPU-native equivalent is ``jax.experimental.io_callback``: the
device program calls out to a host-side *batch* of real Gymnasium MuJoCo envs
once per step, inside the same jitted rollout scan.  This provides
real-physics ``Safety*Velocity`` tasks (cost = 1[|x_velocity| > threshold],
thresholds from Safety-Gymnasium) at host-bound throughput — the
correctness-parity backend next to the fast pure-JAX surrogates in
``envs/velocity.py``.

Limitations: host state lives in this process (single-host only; not
compatible with the shard_map dp mesh), and episodes auto-reset host-side.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

# Safety-Gymnasium velocity-constraint thresholds (50% of the unconstrained
# agent's top speed, as published by safety_gymnasium's velocity tasks).
# v4 Gymnasium MuJoCo envs match the dynamics vintage the reference's
# benchmark tables were produced on (safety_gymnasium subclasses the v4
# envs); Ant's constraint is on planar speed, the others on x-velocity.
_SPECS = {
    'Ant': ('Ant-v4', 2.6222),
    'HalfCheetah': ('HalfCheetah-v4', 3.2096),
    'Hopper': ('Hopper-v4', 0.7402),
    'Walker2d': ('Walker2d-v4', 2.3415),
    'Swimmer': ('Swimmer-v4', 0.24455),
    'Humanoid': ('Humanoid-v4', 1.4149),
}


@env_register
class HostMujocoVelocityEnv(CMDP):
    """Real-MuJoCo velocity-limited locomotion via host callbacks."""

    _support_envs = [f'Safety{r}Velocity-v1-mujoco' for r in _SPECS]
    need_time_limit_wrapper = False   # gymnasium's TimeLimit handles this
    need_auto_reset_wrapper = False   # auto-reset happens host-side
    is_vectorized = True
    host_backed = True                # eligible for the host-driven rollout
    supports_host_early_term = True   # EarlyTerminated inside the host loop

    def __init__(self, env_id: str, num_envs: int = 1, **kwargs: Any) -> None:
        super().__init__(env_id, **kwargs)
        import gymnasium  # pylint: disable=import-outside-toplevel

        robot = env_id[len('Safety'):-len('Velocity-v1-mujoco')]
        gym_id, self._velocity_limit = _SPECS[robot]
        self._planar_speed = robot == 'Ant'
        self._num_envs = num_envs
        # the passive env checker costs ~25 us per step (30%+ of mj_step
        # itself for HalfCheetah); these are the stock Gymnasium envs, so
        # nothing is lost by disabling it
        self._envs = [
            gymnasium.make(gym_id, disable_env_checker=True) for _ in range(num_envs)
        ]
        self._obs_dim = int(self._envs[0].observation_space.shape[0])
        self._act_space = self._envs[0].action_space
        # host-side action repeat (for model-based stacks; the jitted
        # ActionRepeat wrapper cannot sit above an ordered io_callback):
        # each step() call repeats the action up to `action_repeat` raw
        # steps, summing reward/cost and stopping early at episode end —
        # the reference ActionRepeat semantics (omnisafe/envs/wrapper.py:
        # 517-574)
        self._action_repeat = int(kwargs.get('action_repeat', 1))
        # host-side early termination (EarlyTerminated family): once an
        # episode's accumulated cost exceeds the limit the step reports
        # reward 0 / terminated and the episode resets — the reference
        # EarlyTerminatedAdapter semantics (early_terminated_adapter.py:
        # 77-88), implemented inside the host loop because this env owns
        # its own auto-reset (the jitted EarlyTerminatedWrapper cannot sit
        # under a host-side reset).
        limit = kwargs.get('early_term_cost_limit')
        self._early_term_limit = None if limit is None else float(limit)
        self._acc_cost = np.zeros(num_envs, np.float64)

    @property
    def num_envs(self) -> int:
        return self._num_envs

    @property
    def observation_space(self) -> Box:
        return Box.create(-jnp.inf, jnp.inf, (self._obs_dim,))

    @property
    def action_space(self) -> Box:
        return Box.create(
            np.asarray(self._act_space.low, np.float32),
            np.asarray(self._act_space.high, np.float32),
        )

    @property
    def max_episode_steps(self) -> int:
        return 1000

    # ------------------------------------------------------ host callbacks
    def _host_reset(self, seeds: np.ndarray) -> np.ndarray:
        obs = [env.reset(seed=int(s))[0] for env, s in zip(self._envs, seeds)]
        self._acc_cost[:] = 0.0
        return np.stack(obs).astype(np.float32)

    def _host_step(self, actions: np.ndarray):
        b = self._num_envs
        obs = np.empty((b, self._obs_dim), np.float32)
        final_obs = np.empty((b, self._obs_dim), np.float32)
        reward = np.empty(b, np.float32)
        cost = np.empty(b, np.float32)
        term = np.empty(b, np.bool_)
        trunc = np.empty(b, np.bool_)
        for i, env in enumerate(self._envs):
            r_sum = c_sum = 0.0
            for _rep in range(self._action_repeat):
                o, r, te, tr, info = env.step(np.asarray(actions[i], np.float64))
                # safety_gymnasium velocity tasks: cost = 1[velocity >
                # threshold], velocity = hypot(vx, vy) for Ant, raw
                # x_velocity otherwise.
                if self._planar_speed:
                    vel = float(np.hypot(info.get('x_velocity', 0.0),
                                         info.get('y_velocity', 0.0)))
                else:
                    vel = float(info.get('x_velocity', 0.0))
                r_sum += float(r)
                c_sum += float(vel > self._velocity_limit)
                if te or tr:  # stop early within the repeat window
                    break
            if self._early_term_limit is not None:
                self._acc_cost[i] += c_sum
                if self._acc_cost[i] > self._early_term_limit:
                    # accumulate-then-check, zero reward on the triggering
                    # step (reference: early_terminated_adapter.py:80-87)
                    r_sum = 0.0
                    te = True
            reward[i] = r_sum
            cost[i] = c_sum
            term[i] = te
            trunc[i] = tr
            final_obs[i] = o
            if te or tr:
                o, _ = env.reset()
                self._acc_cost[i] = 0.0
            obs[i] = o
        return obs, reward, cost, term, trunc, final_obs

    # index of the forward-velocity component(s) inside the v4 observation
    # (qvel follows the trimmed qpos block): used by model-based planners to
    # score imagined states.  Humanoid's published x_velocity is a
    # center-of-mass quantity not recoverable from a qvel slot, so it is
    # deliberately absent.
    _VEL_OBS_INDEX = {
        'HalfCheetah': 8, 'Walker2d': 8, 'Hopper': 5, 'Swimmer': 3,
        'Ant': (13, 14),
    }

    def cost_from_obs(self, obs: Array) -> Array:
        """Velocity cost evaluated on (imagined) observations — the
        model-based planners' cost oracle (reference analogue:
        safety_gymnasium_modelbased.py ``get_cost_from_obs_tensor``).
        Matches ``_host_step``: cost = 1[velocity > threshold], velocity =
        hypot(vx, vy) for Ant, raw x-velocity otherwise; the qvel slot of
        the observation stands in for the finite-difference ``x_velocity``
        the host env reads from step info."""
        robot = self.env_id[len('Safety'):-len('Velocity-v1-mujoco')]
        idx = self._VEL_OBS_INDEX.get(robot)
        if idx is None:
            raise NotImplementedError(
                f'cost_from_obs undefined for {robot}: its x_velocity is not '
                f'an observation component'
            )
        if self._planar_speed:
            vel = jnp.hypot(obs[..., idx[0]], obs[..., idx[1]])
        else:
            vel = obs[..., idx]
        return (vel > self._velocity_limit).astype(jnp.float32)

    # direct entry points for the host-driven rollout (adapter/host_loop.py),
    # which owns physics outside the XLA run loop
    host_reset_direct = _host_reset
    host_step_direct = _host_step

    # ------------------------------------------------------- CMDP interface
    def reset(self, key: Array):
        seeds = jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1)
        obs = io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self._num_envs, self._obs_dim), jnp.float32),
            seeds,
            ordered=True,
        )
        # device-side state is a pure ordering token; the host owns the sim
        return jnp.zeros(()), obs

    def step(self, state: Array, action: Array, key: Array) -> Tuple[Array, TimeStep]:
        del key
        b, d = self._num_envs, self._obs_dim
        out_shapes = (
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.bool_),
            jax.ShapeDtypeStruct((b,), jnp.bool_),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        )
        obs, reward, cost, term, trunc, final_obs = io_callback(
            self._host_step, out_shapes, action, ordered=True
        )
        ts = TimeStep(
            obs=obs, reward=reward, cost=cost, terminated=term, truncated=trunc,
            final_obs=final_obs,
        )
        return state + 1.0, ts


__all__ = ['HostMujocoVelocityEnv']
