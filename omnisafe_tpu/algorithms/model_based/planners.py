"""Sampling-based planners: CEM, CCE, RCE, CAP.

Counterparts of the reference planner family (reference:
omnisafe/algorithms/model_based/planner/cem.py:28-271, cce.py:29-144,
rce.py:25-113, cap.py:29-160).  The whole optimization — candidate sampling,
ensemble imagination, elite selection, distribution refit — is one jitted
``lax.scan`` over iterations; the imagination inner loop batches
``num_models x (particles/models x samples)`` trajectories through the MXU in
a single pass per step.

Feasibility-constrained elite selection is branch-free: when at least
``num_elites`` candidates satisfy the cost limit, infeasible candidates score
``-inf`` on returns; otherwise all candidates are ranked by ``-cost``
(identical to the reference's two-branch logic, cce.py:120-133).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.models.ensemble import DynamicsEnsemble, DynamicsState

Array = jax.Array


@struct.dataclass
class PlanState:
    """Warm-started action-sequence mean (the variance resets every call,
    reference: cem.py:237-241)."""

    mean: Array  # (H, A)


class CEMPlanner:
    """Cross-Entropy Method planner."""

    # pylint: disable-next=too-many-arguments
    def __init__(
        self,
        dynamics: DynamicsEnsemble,
        planner_cfgs: Any,
        gamma: float,
        cost_gamma: float,
        action_dim: int,
        **kwargs: Any,
    ) -> None:
        self._dynamics = dynamics
        self._horizon = int(planner_cfgs.plan_horizon)
        self._num_iterations = int(planner_cfgs.num_iterations)
        self._num_particles = int(planner_cfgs.num_particles)
        self._num_samples = int(planner_cfgs.num_samples)
        self._num_elites = int(planner_cfgs.num_elites)
        self._momentum = float(planner_cfgs.momentum)
        self._epsilon = float(planner_cfgs.epsilon)
        self._init_var = float(planner_cfgs.init_var)
        self._action_dim = action_dim
        self._gamma = gamma
        self._cost_gamma = cost_gamma
        self._cost_limit = float(kwargs.get('cost_limit', 0.0))
        self._setup_particles()

    def _setup_particles(self) -> None:
        E = self._dynamics.num_ensemble
        assert self._num_particles % E == 0, 'num_particles must divide num_models'
        self._pp = self._num_particles // E  # particles per model

    def init(self) -> PlanState:
        return PlanState(mean=jnp.zeros((self._horizon, self._action_dim)))

    _SCORE_KEYS = (
        'Plan/episode_returns_max', 'Plan/episode_returns_mean', 'Plan/episode_returns_min',
    )

    @property
    def info_keys(self) -> Tuple[str, ...]:
        """Static key set of the info dict returned by :meth:`plan` (used to
        build matching zero-structures for non-planning branches)."""
        return self._SCORE_KEYS + (
            'Plan/iter', 'Plan/last_var_mean', 'Plan/last_var_max', 'Plan/last_var_min',
        )

    # ------------------------------------------------------------- scoring
    def _episode_stats(self, traj) -> Tuple[Array, Array, Array]:
        """Reshape (H, E, pp*S, ...) rollouts into per-sample episode
        return/cost estimates scaled to a 1000-step episode
        (reference: cem.py:148-196)."""
        H, S = self._horizon, self._num_samples
        returns = traj['rewards'].reshape(H, self._num_particles, S)
        ep_returns = jnp.sum(returns, axis=0).mean(axis=0) * (1000.0 / H)
        if 'costs' in traj:
            costs = traj['costs'].reshape(H, self._num_particles, S)
        else:
            costs = jnp.zeros((H, self._num_particles, S))
        ep_costs = jnp.sum(costs, axis=0).mean(axis=0) * (1000.0 / H)
        return ep_returns, ep_costs, costs

    def _scores(self, ep_returns: Array, ep_costs: Array, costs: Array,
                traj, lagrange: Array) -> Tuple[Array, Dict[str, Array]]:
        """Plain CEM ranks by return."""
        del ep_costs, costs, traj, lagrange
        info = {
            'Plan/episode_returns_max': jnp.max(ep_returns),
            'Plan/episode_returns_mean': jnp.mean(ep_returns),
            'Plan/episode_returns_min': jnp.min(ep_returns),
        }
        return ep_returns, info

    def _feasible_scores(self, ep_returns: Array, ep_costs: Array
                         ) -> Tuple[Array, Dict[str, Array]]:
        """Shared constrained selection (reference: cce.py:120-133)."""
        feasible = ep_costs <= self._cost_limit
        enough = jnp.sum(feasible) >= self._num_elites
        scores = jnp.where(
            enough, jnp.where(feasible, ep_returns, -jnp.inf), -ep_costs
        )
        info = {
            'Plan/feasible_num': jnp.sum(feasible).astype(jnp.float32),
            'Plan/episode_returns_max': jnp.max(ep_returns),
            'Plan/episode_returns_mean': jnp.mean(ep_returns),
            'Plan/episode_returns_min': jnp.min(ep_returns),
            'Plan/episode_costs_max': jnp.max(ep_costs),
            'Plan/episode_costs_mean': jnp.mean(ep_costs),
            'Plan/episode_costs_min': jnp.min(ep_costs),
        }
        return scores, info

    # -------------------------------------------------------------- update
    def _refit(self, elite_actions: Array, elite_scores: Array) -> Tuple[Array, Array]:
        """Mean/var refit over elites (reference: cem.py:198-225)."""
        del elite_scores
        return jnp.mean(elite_actions, axis=1), jnp.var(elite_actions, axis=1, ddof=1)

    # ---------------------------------------------------------------- plan
    def plan(
        self,
        dyn_state: DynamicsState,
        plan_state: PlanState,
        obs: Array,
        key: Array,
        lagrange: Array = 0.0,
        chunk: int = 1,
    ) -> Tuple[Array, PlanState, Dict[str, Array]]:
        """One planning call returning the first ``chunk`` actions of the
        optimized sequence, shape ``(chunk, A)`` (reference: cem.py:227-271
        replans every step, i.e. chunk=1; executing a k-step prefix of the
        receding-horizon plan amortizes planner compute and — on a
        remote-dispatched accelerator — dispatch round trips k-fold)."""
        H, S, A = self._horizon, self._num_samples, self._action_dim
        E, pp = self._dynamics.num_ensemble, self._pp
        # shift the warm start forward by the prefix consumed last call
        last_mean = jnp.concatenate(
            [plan_state.mean[chunk:],
             jnp.broadcast_to(plan_state.mean[-1:], (chunk, A))], axis=0)
        last_var = jnp.full((H, A), self._init_var)

        init_states = jnp.broadcast_to(obs, (E, pp * S, obs.shape[-1]))

        def iteration(carry, it_key):
            mean, var = carry
            a_key, i_key = jax.random.split(it_key)
            actions = jnp.clip(
                mean[:, None, :] + jnp.sqrt(var)[:, None, :]
                * jax.random.normal(a_key, (H, S, A)),
                -1.0,
                1.0,
            )
            tiled = jnp.broadcast_to(actions[:, None], (H, pp, S, A)).reshape(H, pp * S, A)
            traj = self._dynamics.imagine(dyn_state, init_states, tiled, i_key)
            ep_returns, ep_costs, costs = self._episode_stats(traj)
            scores, info = self._scores(ep_returns, ep_costs, costs, traj, lagrange)
            _, elite_idx = jax.lax.top_k(scores, self._num_elites)
            elite_actions = actions[:, elite_idx]
            new_mean, new_var = self._refit(elite_actions, scores[elite_idx])
            mean = self._momentum * mean + (1.0 - self._momentum) * new_mean
            var = self._momentum * var + (1.0 - self._momentum) * new_var
            return (mean, var), info

        keys = jax.random.split(key, self._num_iterations)
        (mean, var), infos = jax.lax.scan(iteration, (last_mean, last_var), keys)
        info = jax.tree.map(lambda x: x[-1], infos)
        info['Plan/iter'] = jnp.asarray(float(self._num_iterations))
        info['Plan/last_var_mean'] = jnp.mean(var)
        info['Plan/last_var_max'] = jnp.max(var)
        info['Plan/last_var_min'] = jnp.min(var)
        return mean[:chunk], PlanState(mean=mean), info


_FEASIBLE_KEYS = (
    'Plan/feasible_num',
    'Plan/episode_returns_max', 'Plan/episode_returns_mean', 'Plan/episode_returns_min',
    'Plan/episode_costs_max', 'Plan/episode_costs_mean', 'Plan/episode_costs_min',
)


class CCEPlanner(CEMPlanner):
    """Constrained CEM: feasible elites by cost limit (reference: cce.py:29-144)."""

    _SCORE_KEYS = _FEASIBLE_KEYS

    def _scores(self, ep_returns, ep_costs, costs, traj, lagrange):
        del costs, traj, lagrange
        return self._feasible_scores(ep_returns, ep_costs)


class RCEPlanner(CEMPlanner):
    """Robust CEM: worst-case (max over particles) episode cost
    (reference: rce.py:25-113)."""

    _SCORE_KEYS = _FEASIBLE_KEYS

    def _scores(self, ep_returns, ep_costs, costs, traj, lagrange):
        del ep_costs, traj, lagrange
        worst = jnp.sum(jnp.max(costs, axis=1), axis=0) * (1000.0 / self._horizon)
        return self._feasible_scores(ep_returns, worst)


class CAPPlanner(CCEPlanner):
    """Conservative and Adaptive Penalty: cost inflated by a λ-scaled
    ensemble-variance penalty (reference: cap.py:29-160)."""

    _SCORE_KEYS = _FEASIBLE_KEYS + (
        'Plan/var_penalty_mean', 'Plan/var_penalty_max', 'Plan/var_penalty_min',
    )

    def _scores(self, ep_returns, ep_costs, costs, traj, lagrange):
        del ep_costs
        H = self._horizon
        state_vars = traj['vars'][..., self._dynamics.reward_size:]
        # (H, E, B) -> per-step penalty: max over models of ||sqrt(var)||
        penalty = jnp.max(jnp.linalg.norm(jnp.sqrt(state_vars), axis=-1), axis=1)
        E, pp, S = self._dynamics.num_ensemble, self._pp, self._num_samples
        pen = penalty.reshape(H, pp, S)
        pen = jnp.broadcast_to(pen[:, None], (H, E, pp, S)).reshape(H, self._num_particles, S)
        penalized = costs + lagrange * pen
        ep_costs = jnp.sum(penalized, axis=0).mean(axis=0) * (1000.0 / H)
        scores, info = self._feasible_scores(ep_returns, ep_costs)
        info['Plan/var_penalty_mean'] = jnp.mean(penalty)
        info['Plan/var_penalty_max'] = jnp.max(penalty)
        info['Plan/var_penalty_min'] = jnp.min(penalty)
        return scores, info


class ARCPlanner(CEMPlanner):
    """Actor Regularized Control: actor proposals mixed into the candidate
    pool, exponentially-weighted refit, critic terminal bootstrap
    (reference: arc.py:30-314).

    Per-model particle layout differs from CEM: every model rolls *all*
    ``num_particles`` particles (reference: arc.py:139-175).
    """

    # pylint: disable-next=too-many-arguments
    def __init__(self, dynamics, planner_cfgs, gamma, cost_gamma, action_dim,
                 actor_critic=None, **kwargs):
        super().__init__(dynamics, planner_cfgs, gamma, cost_gamma, action_dim, **kwargs)
        self._actor_critic = actor_critic
        self._mixture_coefficient = float(planner_cfgs.mixture_coefficient)
        self._temperature = float(planner_cfgs.temperature)
        self._cost_temperature = float(getattr(planner_cfgs, 'cost_temperature', 10.0))
        self._actor_traj = int(self._mixture_coefficient * self._num_samples)
        self._num_action = self._num_samples + self._actor_traj

    def _setup_particles(self) -> None:
        # ARC rolls every particle on every model (reference: arc.py:139-175)
        self._pp = self._num_particles

    @property
    def info_keys(self):
        return self._SCORE_KEYS + (
            'Plan/iter', 'Plan/last_var_mean', 'Plan/last_var_max', 'Plan/last_var_min',
        )

    def _actor_proposal(self, dyn_state, obs: Array, ac_params, key: Array) -> Array:
        """Roll the actor through model 0 to get a proposal trajectory
        (reference: arc.py:102-130)."""
        E = self._dynamics.num_ensemble

        def body(carry, k):
            s, rng = carry
            rng, a_key, d_key = jax.random.split(rng, 3)
            dist = self._actor_critic.actor.apply(ac_params.actor, s)
            act = dist.sample(a_key)
            states = jnp.broadcast_to(s[None, None], (E, 1, s.shape[-1]))
            acts = jnp.broadcast_to(act[None, None], (E, 1, act.shape[-1]))
            next_states, _, _ = self._dynamics.sample(dyn_state, states, acts, d_key)
            return (next_states[0, 0], rng), act

        (_, _), actions = jax.lax.scan(body, (obs, key), None, length=self._horizon)
        return actions  # (H, A)

    def _arc_stats(self, traj):
        """Episode return with critic terminal bootstrap + worst-case cost."""
        H = self._horizon
        EP = self._dynamics.num_ensemble * self._pp
        rewards = traj['rewards'].reshape(H, EP, self._num_action)
        values = traj['values'].reshape(H, EP, self._num_action)
        returns = jnp.sum(rewards, axis=0) + values[-1]
        ep_returns = returns.mean(axis=0) * (1000.0 / H)
        if 'costs' in traj:
            costs = traj['costs'].reshape(H, EP, self._num_action)
            worst = jnp.sum(jnp.max(costs, axis=1), axis=0) * (1000.0 / H)
        else:
            worst = jnp.zeros(self._num_action)
        return ep_returns, worst

    def _arc_scores(self, ep_returns: Array, ep_costs: Array):
        """ARC: every candidate participates, weighted by return."""
        del ep_costs
        info = {
            'Plan/episode_returns_max': jnp.max(ep_returns),
            'Plan/episode_returns_mean': jnp.mean(ep_returns),
            'Plan/episode_returns_min': jnp.min(ep_returns),
        }
        return ep_returns, self._temperature, info

    # pylint: disable-next=too-many-locals
    def plan(self, dyn_state, plan_state, obs, key, lagrange=0.0, ac_params=None,
             chunk: int = 1):
        """(reference: arc.py:249-314); returns the first ``chunk`` actions,
        shape ``(chunk, A)`` — see :meth:`CEMPlanner.plan`."""
        H, S, A = self._horizon, self._num_samples, self._action_dim
        E, pp = self._dynamics.num_ensemble, self._pp
        NA = self._num_action
        last_mean = jnp.concatenate(
            [plan_state.mean[chunk:],
             jnp.broadcast_to(plan_state.mean[-1:], (chunk, A))], axis=0)
        last_var = jnp.full((H, A), self._init_var)
        init_states = jnp.broadcast_to(obs, (E, pp * NA, obs.shape[-1]))

        def value_fn(states, acts):
            # QCritic returns (num_heads, E, B); bootstrap with the first head
            q = self._actor_critic.reward_critic.apply(
                ac_params.reward_critic, states, acts
            )
            return q[0]

        key, prop_key = jax.random.split(key)
        actor_actions = self._actor_proposal(dyn_state, obs, ac_params, prop_key)
        actor_tiled = jnp.broadcast_to(
            actor_actions[:, None], (H, self._actor_traj, A)
        )

        def iteration(carry, it_key):
            mean, var = carry
            a_key, i_key = jax.random.split(it_key)
            gauss = jnp.clip(
                mean[:, None, :] + jnp.sqrt(var)[:, None, :]
                * jax.random.normal(a_key, (H, S, A)),
                -1.0,
                1.0,
            )
            actions = jnp.concatenate([gauss, actor_tiled], axis=1)  # (H, NA, A)
            tiled = jnp.broadcast_to(actions[:, None], (H, pp, NA, A)).reshape(H, pp * NA, A)
            traj = self._dynamics.imagine(dyn_state, init_states, tiled, i_key, value_fn)
            ep_returns, ep_costs = self._arc_stats(traj)
            scores, temp, info = self._arc_scores(ep_returns, ep_costs)
            # exponential weighting over candidates (reference: arc.py:284-307)
            w = jnp.exp(temp * (scores - jnp.max(scores)))
            w = w / (jnp.sum(w) + 1e-9)
            new_mean = jnp.sum(w[None, :, None] * actions, axis=1)
            new_var = jnp.sum(
                w[None, :, None] * jnp.square(actions - new_mean[:, None, :]), axis=1
            )
            new_var = jnp.clip(new_var, 0.0, 2.0)
            mean = self._momentum * mean + (1.0 - self._momentum) * new_mean
            var = self._momentum * var + (1.0 - self._momentum) * new_var
            return (mean, var), info

        keys = jax.random.split(key, self._num_iterations)
        (mean, var), infos = jax.lax.scan(iteration, (last_mean, last_var), keys)
        info = jax.tree.map(lambda x: x[-1], infos)
        info['Plan/iter'] = jnp.asarray(float(self._num_iterations))
        info['Plan/last_var_mean'] = jnp.mean(var)
        info['Plan/last_var_max'] = jnp.max(var)
        info['Plan/last_var_min'] = jnp.min(var)
        return mean[:chunk], PlanState(mean=mean), info


class SafeARCPlanner(ARCPlanner):
    """Safe ARC: feasibility-filtered exponential refit with worst-case costs
    (reference: safe_arc.py:29-251)."""

    _SCORE_KEYS = _FEASIBLE_KEYS

    def _arc_scores(self, ep_returns: Array, ep_costs: Array):
        feasible = ep_costs <= self._cost_limit
        feasible_num = jnp.sum(feasible)
        enough = feasible_num >= self._num_elites
        scores = jnp.where(
            enough, jnp.where(feasible, ep_returns, -jnp.inf), -ep_costs
        )
        temp = jnp.where(enough, self._temperature, self._cost_temperature)
        info = {
            'Plan/feasible_num': feasible_num.astype(jnp.float32),
            'Plan/episode_returns_max': jnp.max(ep_returns),
            'Plan/episode_returns_mean': jnp.mean(ep_returns),
            'Plan/episode_returns_min': jnp.min(ep_returns),
            'Plan/episode_costs_max': jnp.max(ep_costs),
            'Plan/episode_costs_mean': jnp.mean(ep_costs),
            'Plan/episode_costs_min': jnp.min(ep_costs),
        }
        return scores, temp, info


__all__ = [
    'PlanState', 'CEMPlanner', 'CCEPlanner', 'RCEPlanner', 'CAPPlanner',
    'ARCPlanner', 'SafeARCPlanner',
]
