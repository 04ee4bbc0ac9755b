"""Pure-JAX Safety-Gymnasium-style navigation tasks.

A TPU-native re-implementation of the *task specification* of the
Safety-Gymnasium Goal/Button/Circle suites supported by the reference
(reference: omnisafe/envs/safety_gymnasium_env.py:55-125): a planar robot
navigates an arena with a pseudo-lidar observation; hazards produce a cost
channel; goals respawn on contact.  The MuJoCo rigid-body physics of the
original is replaced with analytic planar dynamics (Point: force+turn, Car:
differential drive, Doggo/Racecar: parameter variants) so the whole task is a
pure function — vmappable to thousands of arenas and scannable inside one
jitted rollout.  Reward shaping (distance delta + goal bonus), pseudo-lidar
binning, hazard cost semantics, and episode structure (no termination, 1000
step time limit) follow the Safety-Gymnasium task definitions.

This is a physics *approximation*: returns are not numerically comparable to
MuJoCo-backed Safety-Gymnasium, but the constrained-optimization structure
(reward/cost trade-off geometry) is preserved, which is what the algorithm
layer exercises.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box

Array = jax.Array

_LIDAR_BINS = 16
_LIDAR_MAX_DIST = 3.0
_ARENA = 2.0          # half-extent of the square arena
_GOAL_SIZE = 0.3
_HAZARD_SIZE = 0.2
_VASE_SIZE = 0.1
_BUTTON_SIZE = 0.1
_DT = 0.05

_ROBOTS = {
    # accel gain, turn gain, drag — Point steers fast, Car is heavier,
    # Ant/Doggo sluggish quadrupeds, Racecar fast but wide turns.
    'Point': (2.0, 4.0, 1.5),
    'Car': (1.2, 2.5, 1.0),
    'Ant': (1.0, 2.2, 1.8),
    'Doggo': (0.8, 2.0, 2.0),
    'Racecar': (3.0, 1.5, 0.8),
}

_LEVELS = {0: (0, 0), 1: (8, 1), 2: (10, 10)}  # (num hazards, num vases)


def _lidar(rel: Array, valid: Array) -> Array:
    """Pseudo-lidar over relative positions ``rel`` (N, 2) -> (bins,).

    Follows Safety-Gymnasium's natural-lidar semantics: each object lights the
    bin containing its bearing with intensity ``max(0, 1 - dist/max_dist)``;
    bins take the max over objects.
    """
    dist = jnp.linalg.norm(rel, axis=-1)
    angle = jnp.arctan2(rel[:, 1], rel[:, 0]) % (2.0 * jnp.pi)
    bins = (angle / (2.0 * jnp.pi) * _LIDAR_BINS).astype(jnp.int32) % _LIDAR_BINS
    intensity = jnp.maximum(0.0, 1.0 - dist / _LIDAR_MAX_DIST) * valid
    return jnp.zeros(_LIDAR_BINS).at[bins].max(intensity)


def _rotate(vec: Array, theta: Array) -> Array:
    """World -> robot frame."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([c * vec[..., 0] + s * vec[..., 1], -s * vec[..., 0] + c * vec[..., 1]], -1)


@struct.dataclass
class NavState:
    pos: Array        # (2,)
    vel: Array        # (2,)
    theta: Array      # ()
    goal: Array       # (2,) goal / target-button position
    hazards: Array    # (H, 2) padded
    vases: Array      # (V, 2) padded
    buttons: Array    # (B, 2)
    target_button: Array  # () int32
    box_pos: Array    # (2,) push-task box (unused elsewhere)
    box_vel: Array    # (2,)
    last_dist: Array  # () previous goal distance for delta reward
    key: Array


class _NavigationEnv(CMDP):
    """Shared machinery for the Goal/Button/Circle task families."""

    need_time_limit_wrapper = True
    need_auto_reset_wrapper = True

    _NUM_BUTTONS = 4

    def __init__(self, env_id: str, **kwargs) -> None:
        super().__init__(env_id, **kwargs)
        name = env_id[len('Safety'):]
        if name.endswith('-modelbased'):
            name = name[: -len('-modelbased')]
        for robot in _ROBOTS:
            if name.startswith(robot):
                self._robot = robot
                rest = name[len(robot):]
                break
        else:
            raise NotImplementedError(env_id)
        self._task = rest.rstrip('-v0123456789')
        self._level = int(rest[len(self._task)])
        self._num_hazards, self._num_vases = _LEVELS[self._level]
        self._accel, self._turn, self._drag = _ROBOTS[self._robot]

    # -- spaces ----------------------------------------------------------
    @property
    def observation_space(self) -> Box:
        dim = 7 + _LIDAR_BINS  # ego features + goal lidar
        if self._task == 'Goal':
            dim += 2 * _LIDAR_BINS        # hazards + vases lidar
        elif self._task == 'Button':
            dim += 3 * _LIDAR_BINS        # hazards + vases + buttons lidar
        elif self._task == 'Push':
            dim += 3 * _LIDAR_BINS        # hazards + vases + box lidar
        elif self._task == 'Circle':
            dim += 0                       # only ego + "goal" (circle center) lidar
        return Box.create(-jnp.inf, jnp.inf, (dim,))

    @property
    def action_space(self) -> Box:
        return Box.create(-1.0, 1.0, (2,))

    @property
    def max_episode_steps(self) -> int:
        return 500 if self._task == 'Circle' else 1000

    # -- helpers ---------------------------------------------------------
    def _sample_layout(self, key: Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        span = _ARENA - 0.3
        goal = jax.random.uniform(k1, (2,), minval=-span, maxval=span)
        hazards = jax.random.uniform(k2, (max(self._num_hazards, 1), 2), minval=-span, maxval=span)
        vases = jax.random.uniform(k3, (max(self._num_vases, 1), 2), minval=-span, maxval=span)
        buttons = jax.random.uniform(k4, (self._NUM_BUTTONS, 2), minval=-span, maxval=span)
        return goal, hazards, vases, buttons

    def _obs(self, state: NavState) -> Array:
        ego_vel = _rotate(state.vel, state.theta)
        to_goal = state.goal - state.pos
        compass = _rotate(to_goal, state.theta)
        dist = jnp.linalg.norm(to_goal)
        compass = compass / (dist + 1e-6)
        ego = jnp.concatenate([
            ego_vel,
            jnp.stack([jnp.sin(state.theta), jnp.cos(state.theta)]),
            compass,
            dist[None] / _LIDAR_MAX_DIST,
        ])
        goal_lidar = _lidar(_rotate(to_goal[None, :], state.theta), jnp.ones(1))
        parts = [ego, goal_lidar]
        if self._task in ('Goal', 'Button', 'Push'):
            hvalid = (jnp.arange(state.hazards.shape[0]) < self._num_hazards).astype(jnp.float32)
            parts.append(_lidar(_rotate(state.hazards - state.pos, state.theta), hvalid))
            vvalid = (jnp.arange(state.vases.shape[0]) < self._num_vases).astype(jnp.float32)
            parts.append(_lidar(_rotate(state.vases - state.pos, state.theta), vvalid))
        if self._task == 'Button':
            parts.append(
                _lidar(_rotate(state.buttons - state.pos, state.theta), jnp.ones(self._NUM_BUTTONS))
            )
        if self._task == 'Push':
            parts.append(
                _lidar(_rotate(state.box_pos[None, :] - state.pos, state.theta), jnp.ones(1))
            )
        return jnp.concatenate(parts)

    def _dynamics(self, state: NavState, action: Array) -> Tuple[Array, Array, Array]:
        action = jnp.clip(action, -1.0, 1.0)
        theta = state.theta + _DT * self._turn * action[1]
        heading = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        vel = state.vel + _DT * (self._accel * action[0] * heading - self._drag * state.vel)
        pos = state.pos + _DT * vel
        # arena walls: clamp and kill the normal velocity component
        hit = jnp.abs(pos) > _ARENA
        pos = jnp.clip(pos, -_ARENA, _ARENA)
        vel = jnp.where(hit, 0.0, vel)
        return pos, vel, theta

    # -- CMDP interface --------------------------------------------------
    def reset(self, key: Array):
        layout_key, pos_key, theta_key, box_key, state_key = jax.random.split(key, 5)
        goal, hazards, vases, buttons = self._sample_layout(layout_key)
        pos = jax.random.uniform(pos_key, (2,), minval=-_ARENA + 0.3, maxval=_ARENA - 0.3)
        theta = jax.random.uniform(theta_key, (), minval=0.0, maxval=2.0 * jnp.pi)
        if self._task == 'Button':
            target = jax.random.randint(state_key, (), 0, self._NUM_BUTTONS)
            goal = buttons[target]
        else:
            target = jnp.zeros((), jnp.int32)
        if self._task == 'Circle':
            goal = jnp.zeros(2)  # circle center
        box_pos = jax.random.uniform(box_key, (2,), minval=-_ARENA + 0.5, maxval=_ARENA - 0.5)
        last_dist = (
            jnp.linalg.norm(goal - box_pos)
            if self._task == 'Push'
            else jnp.linalg.norm(goal - pos)
        )
        state = NavState(
            pos=pos,
            vel=jnp.zeros(2),
            theta=theta,
            goal=goal,
            hazards=hazards,
            vases=vases,
            buttons=buttons,
            target_button=target,
            box_pos=box_pos,
            box_vel=jnp.zeros(2),
            last_dist=last_dist,
            key=state_key,
        )
        return state, self._obs(state)

    def step(self, state: NavState, action: Array, key: Array) -> Tuple[NavState, TimeStep]:
        pos, vel, theta = self._dynamics(state, action)
        dist = jnp.linalg.norm(state.goal - pos)
        box_pos, box_vel = state.box_pos, state.box_vel
        if self._task == 'Push':
            # contact pushing: inside the contact radius the box accelerates
            # away from the robot proportionally to the overlap
            to_box = box_pos - pos
            box_dist = jnp.linalg.norm(to_box)
            contact = box_dist < 0.25
            push_dir = to_box / (box_dist + 1e-6)
            box_vel = box_vel + _DT * jnp.where(
                contact, 8.0 * (0.25 - box_dist) * push_dir, 0.0
            )
            box_vel = box_vel * (1.0 - 3.0 * _DT)  # ground friction
            box_pos = jnp.clip(box_pos + _DT * box_vel, -_ARENA, _ARENA)
            dist = jnp.linalg.norm(state.goal - box_pos)

        if self._task == 'Circle':
            # Safety-Gymnasium circle geometry: the reward circle (radius 1.5)
            # lies OUTSIDE the sigwalls (|x| > 1.125 at level 1, 0.875 at
            # level 2), so fast circulation necessarily crosses the costed
            # region — the tension the reference's Circle tables measure
            # (unconstrained agents saturate cost; constrained ones flatten
            # the orbit inside the walls at reduced reward).
            radius = jnp.linalg.norm(pos)
            tangent = jnp.stack([-pos[1], pos[0]]) / (radius + 1e-6)
            reward = jnp.dot(vel, tangent) * jnp.maximum(
                1.0 - jnp.abs(radius - 1.5), 0.0
            )
            wall = {0: jnp.inf, 1: 1.125, 2: 0.875}[self._level]
            cost = (jnp.abs(pos[0]) > wall).astype(jnp.float32)
            new_goal = state.goal
            target = state.target_button
            goal_key = key
        else:
            reached = dist < (_BUTTON_SIZE if self._task == 'Button' else _GOAL_SIZE)
            reward = (state.last_dist - dist) + reached.astype(jnp.float32)
            hvalid = jnp.arange(state.hazards.shape[0]) < self._num_hazards
            in_hazard = jnp.logical_and(
                jnp.linalg.norm(state.hazards - pos, axis=-1) < _HAZARD_SIZE, hvalid
            )
            vvalid = jnp.arange(state.vases.shape[0]) < self._num_vases
            on_vase = jnp.logical_and(
                jnp.linalg.norm(state.vases - pos, axis=-1) < _VASE_SIZE, vvalid
            )
            cost = jnp.any(in_hazard).astype(jnp.float32) + jnp.any(on_vase).astype(jnp.float32)
            if self._task == 'Button':
                # pressing a wrong button is a costed contact
                pressed = jnp.linalg.norm(state.buttons - pos, axis=-1) < _BUTTON_SIZE
                wrong = pressed.at[state.target_button].set(False)
                cost = cost + jnp.any(wrong).astype(jnp.float32)
            cost = jnp.minimum(cost, 1.0)
            # goal respawn on contact (goal keeps the episode going)
            goal_key, button_key = jax.random.split(key)
            span = _ARENA - 0.3
            fresh_goal = jax.random.uniform(goal_key, (2,), minval=-span, maxval=span)
            if self._task == 'Button':
                fresh_target = jax.random.randint(button_key, (), 0, self._NUM_BUTTONS)
                target = jnp.where(reached, fresh_target, state.target_button)
                new_goal = state.buttons[target]
            else:
                target = state.target_button
                new_goal = jnp.where(reached, fresh_goal, state.goal)
            anchor = box_pos if self._task == 'Push' else pos
            dist = jnp.where(reached, jnp.linalg.norm(new_goal - anchor), dist)

        new_state = state.replace(
            pos=pos, vel=vel, theta=theta, goal=new_goal, target_button=target,
            box_pos=box_pos, box_vel=box_vel, last_dist=dist,
        )
        obs = self._obs(new_state)
        ts = TimeStep(
            obs=obs,
            reward=reward,
            cost=cost,
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
            final_obs=obs,
        )
        return new_state, ts


def _nav_ids():
    ids = []
    for robot in _ROBOTS:
        for task in ('Goal', 'Button', 'Push', 'Circle'):
            for level in (0, 1, 2):
                ids.append(f'Safety{robot}{task}{level}-v0')
    return ids


@env_register
class SafetyNavigationEnv(_NavigationEnv):
    """Goal/Button/Push/Circle × Point/Car/Ant/Doggo/Racecar × levels 0-2
    (id surface mirrors reference: omnisafe/envs/safety_gymnasium_env.py:55-125)."""

    _support_envs = _nav_ids()


@env_register
class SafetyNavigationModelBasedEnv(_NavigationEnv):
    """``*-modelbased`` Goal tasks with *coordinate* observations.

    Counterpart of the reference's ``SafetyGymnasiumModelBased`` env
    (reference: omnisafe/envs/safety_gymnasium_modelbased.py:36-528): the
    model-based stack plans through a learned dynamics model over a
    coordinate state — ``[pos, vel, sin/cos heading, goal, hazards...]`` —
    and computes costs analytically from *predicted* states via
    :meth:`cost_from_obs` (the reference's ``get_cost_from_obs_tensor``).
    """

    _support_envs = [
        f'Safety{robot}Goal{level}-v0-modelbased'
        for robot in _ROBOTS
        for level in (0, 1, 2)
    ]

    @property
    def observation_space(self) -> Box:
        num_h = max(self._num_hazards, 1)
        return Box.create(-jnp.inf, jnp.inf, (8 + 2 * num_h,))

    def _obs(self, state: NavState) -> Array:
        return jnp.concatenate([
            state.pos,
            state.vel,
            jnp.stack([jnp.sin(state.theta), jnp.cos(state.theta)]),
            state.goal,
            state.hazards.reshape(-1),
        ])

    def cost_from_obs(self, obs: Array) -> Array:
        """Analytic cost from a (batched) coordinate observation: 1 inside any
        hazard (reference: safety_gymnasium_modelbased.py
        ``get_cost_from_obs_tensor``).  Accepts (..., obs_dim)."""
        pos = obs[..., 0:2]
        hazards = obs[..., 8:].reshape(obs.shape[:-1] + (-1, 2))
        dist = jnp.linalg.norm(hazards - pos[..., None, :], axis=-1)
        in_hazard = jnp.any(dist < _HAZARD_SIZE, axis=-1)
        valid = jnp.asarray(self._num_hazards > 0, jnp.float32)
        return in_hazard.astype(jnp.float32) * valid


__all__ = ['SafetyNavigationEnv', 'SafetyNavigationModelBasedEnv']
