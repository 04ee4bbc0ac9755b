"""Pure-numpy host rollout for the standard on-policy stack.

The generic host-driven runner (``adapter/host_loop.py``) pays one jitted
XLA call per env step for work that is numerically trivial at host batch
sizes — a 64x64 MLP forward, running-normalizer updates, episode
accounting.  Measured on this image that dispatch + the end-of-epoch
stacking of per-step records costs ~2-3x the MuJoCo physics itself.  This
runner keeps the byte-identical *semantics* of the jitted per-step program
(reference behavior: omnisafe/adapter/onpolicy_adapter.py:58-136 with the
ObsNormalize/RewardNormalize/CostNormalize/ActionScale wrapper stack,
omnisafe/envs/wrapper.py:179-514) but computes it in numpy with
preallocated ``(T, B, ...)`` record arrays, converting to JAX arrays once
per epoch.  Physics becomes the bottleneck again.

Scope: ``GaussianLearningActor`` + ``VCritic`` models over a wrapper chain
of at most {ObsNormalize, RewardNormalize, CostNormalize, ActionScale} on a
host-backed base env.  Anything else (Saute/Simmer wrappers, other actor
types, dp meshes) falls back to :class:`HostRolloutRunner`.

Semantics notes (mirrored exactly from the functional wrappers):

* normalizer stats update with the CURRENT batch before normalizing it
  (``RunningStats.update`` then ``normalize`` — common/normalizer.py:38-77);
  obs stats update on the post-auto-reset obs; final_obs is normalized with
  the already-updated stats.
* episode returns/costs accumulate RAW rewards/costs
  (``info['original_*']`` in the wrapper stack).
* the rollout carry stays the same ``RolloutCarry`` pytree the JAX runner
  produces (nested ``NormalizeState``s), so train-state checkpoints and
  mid-run resume are format-compatible with the generic path.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.adapter.onpolicy import EpisodeMetrics, RolloutCarry
from omnisafe_tpu.common.buffer.advantages import Trajectory
from omnisafe_tpu.common.normalizer import RunningStats
from omnisafe_tpu.envs.core import CMDP, Wrapper
from omnisafe_tpu.envs.wrappers import (
    ActionScale,
    CostNormalize,
    NormalizeState,
    ObsNormalize,
    RewardNormalize,
)
from omnisafe_tpu.models.actor import GaussianLearningActor
from omnisafe_tpu.models.critic import VCritic

Array = jax.Array


class Ineligible(Exception):
    """Raised when the fast path cannot reproduce the configured stack."""


# --------------------------------------------------------------- numpy blocks
_ACT = {
    'tanh': np.tanh,
    'relu': lambda x: np.maximum(x, 0.0),
    'identity': lambda x: x,
    'sigmoid': lambda x: 1.0 / (1.0 + np.exp(-x)),
}

_LOG_SQRT_2PI = 0.5 * float(np.log(2.0 * np.pi))


def _mlp_weights(params: Any, *path: str) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Ordered (kernel, bias) pairs of an ``MLP`` submodule's dense layers."""
    node = params['params']
    for part in path:
        node = node[part]
    layers = []
    for i in range(len(node)):
        name = f'dense_{i}'
        if name not in node:
            break
        layers.append((
            np.asarray(node[name]['kernel'], np.float32),
            np.asarray(node[name]['bias'], np.float32),
        ))
    assert layers, f'no dense layers under {path}'
    return layers


def _forward(layers, x: np.ndarray, act) -> np.ndarray:
    for kernel, bias in layers[:-1]:
        x = act(x @ kernel + bias)
    kernel, bias = layers[-1]
    return x @ kernel + bias


class _NpStats:
    """numpy mirror of :class:`RunningStats` (same Chan-et-al merge)."""

    __slots__ = ('mean', 'var', 'count')

    def __init__(self, mean: np.ndarray, var: np.ndarray, count: float) -> None:
        self.mean = np.asarray(mean, np.float32)
        self.var = np.asarray(var, np.float32)
        self.count = np.float32(count)

    @staticmethod
    def from_jax(stats: RunningStats) -> '_NpStats':
        return _NpStats(np.asarray(stats.mean), np.asarray(stats.var),
                        float(stats.count))

    def to_jax(self) -> RunningStats:
        return RunningStats(mean=jnp.asarray(self.mean), var=jnp.asarray(self.var),
                            count=jnp.asarray(self.count))

    def update(self, batch: np.ndarray) -> None:
        feat_ndim = self.mean.ndim
        batch_axes = tuple(range(batch.ndim - feat_ndim))
        batch_count = np.float32(np.prod([batch.shape[a] for a in batch_axes]))
        batch_mean = np.mean(batch, axis=batch_axes, dtype=np.float32)
        batch_sq = np.mean(np.square(batch), axis=batch_axes, dtype=np.float32)
        batch_var = np.maximum(batch_sq - np.square(batch_mean), np.float32(0.0))
        delta = batch_mean - self.mean
        total = self.count + batch_count
        self.mean = self.mean + delta * batch_count / total
        m2 = self.var * self.count + batch_var * batch_count \
            + np.square(delta) * self.count * batch_count / total
        self.var = m2 / total
        self.count = total

    def normalize(self, x: np.ndarray, eps: float = 1e-8,
                  clip: float = 5.0) -> np.ndarray:
        del eps
        # Bessel-corrected std floored at 1e-2, mirroring RunningStats.norm_std
        # (reference: omnisafe/common/normalizer.py:136-139)
        bessel = self.var * self.count / np.maximum(self.count - np.float32(1.0),
                                                    np.float32(1e-4))
        std = np.maximum(np.sqrt(bessel), np.float32(1e-2))
        out = (x - self.mean) / std
        return np.clip(out, -clip, clip)


class _FastStackBase:
    """Shared wrapper-chain parsing + running-stats pack/unpack for the numpy
    fast runners."""

    def __init__(self, env_stack: CMDP) -> None:
        chain: List[Wrapper] = []
        node: Any = env_stack
        while isinstance(node, Wrapper):
            chain.append(node)
            node = node._env  # pylint: disable=protected-access
        base = node
        if not getattr(base, 'host_backed', False):
            raise Ineligible('base env is not host-backed')
        allowed = (ActionScale, ObsNormalize, RewardNormalize, CostNormalize)
        if not all(isinstance(w, allowed) for w in chain):
            raise Ineligible(f'unsupported wrapper in {[type(w).__name__ for w in chain]}')

        self._base = base
        self._num_envs = int(base.num_envs)
        self._obs_dim = int(base.observation_space.shape[0])
        self._act_dim = int(base.action_space.shape[0])
        self._obs_norm = any(isinstance(w, ObsNormalize) for w in chain)
        self._rew_norm = any(isinstance(w, RewardNormalize) for w in chain)
        self._cost_norm = any(isinstance(w, CostNormalize) for w in chain)
        scale_w = next((w for w in chain if isinstance(w, ActionScale)), None)
        if scale_w is not None:
            self._scale = np.asarray(scale_w._scale, np.float32)  # pylint: disable=protected-access
            self._offset = np.asarray(scale_w._offset, np.float32)  # pylint: disable=protected-access
        else:
            self._scale = np.ones(self._act_dim, np.float32)
            self._offset = np.zeros(self._act_dim, np.float32)

    # ------------------------------------------------------------- carry I/O
    def _stats_order(self) -> List[str]:
        """Outer->inner names of stats-carrying wrappers in the state pytree
        (build order is Obs -> Rew -> Cost -> ActionScale, so the state nests
        Cost outermost — envs/wrappers.py + adapter/onpolicy.py:67-73)."""
        order = []
        if self._cost_norm:
            order.append('cost')
        if self._rew_norm:
            order.append('reward')
        if self._obs_norm:
            order.append('obs')
        return order

    def _unpack(self, env_state: Any) -> dict:
        stats = {}
        node = env_state
        for name in self._stats_order():
            assert isinstance(node, NormalizeState), type(node)
            stats[name] = _NpStats.from_jax(node.stats)
            node = node.env
        return stats

    def _pack(self, stats: dict) -> Any:
        node: Any = jnp.zeros(())  # relay token, matches host_loop._RelayEnv
        for name in reversed(self._stats_order()):
            node = NormalizeState(env=node, stats=stats[name].to_jax())
        return node

    # ----------------------------------------------------------------- reset
    def reset(self, key: Array) -> RolloutCarry:
        seeds = np.asarray(jax.random.randint(key, (self._num_envs,), 0, 2**31 - 1))
        raw = self._base.host_reset_direct(seeds)
        stats = {}
        if self._cost_norm:
            stats['cost'] = _NpStats(np.zeros(()), np.ones(()), 1e-4)
        if self._rew_norm:
            stats['reward'] = _NpStats(np.zeros(()), np.ones(()), 1e-4)
        obs = raw
        if self._obs_norm:
            st = _NpStats(np.zeros(self._obs_dim), np.ones(self._obs_dim), 1e-4)
            st.update(raw)
            obs = st.normalize(raw)
            stats['obs'] = st
        zeros = jnp.zeros((self._num_envs,))
        return RolloutCarry(env_state=self._pack(stats), obs=jnp.asarray(obs),
                            ep_ret=zeros, ep_cost=zeros, ep_len=zeros)


class FastHostOnPolicyRunner(_FastStackBase):
    """Drop-in replacement for ``HostRolloutRunner`` on the standard stack."""

    def __init__(self, env_stack: CMDP, actor_critic: Any) -> None:
        super().__init__(env_stack)
        if not isinstance(actor_critic.actor, GaussianLearningActor):
            raise Ineligible(f'actor {type(actor_critic.actor).__name__} not supported')
        if not isinstance(actor_critic.reward_critic, VCritic):
            raise Ineligible('non-VCritic reward critic')
        self._ac = actor_critic
        try:  # actor and critics may configure different activations
            self._actor_act = _ACT[actor_critic.actor.activation]
            self._critic_act = _ACT[actor_critic.reward_critic.activation]
        except KeyError as exc:  # softplus/gelu etc: fall back, don't crash
            raise Ineligible(f'activation {exc} not in the numpy fast path') from exc
        if actor_critic.cost_critic.activation != actor_critic.reward_critic.activation:
            raise Ineligible('mismatched reward/cost critic activations')

    # --------------------------------------------------------------- rollout
    # test hook: when set, called as noise(T, B, A) -> array instead of the RNG
    _noise_hook: Optional[Any] = None

    def rollout(
        self,
        carry: RolloutCarry,
        params: Any,
        actor_critic: Any,
        key: Array,
        steps_per_env: int,
    ) -> Tuple[RolloutCarry, Trajectory, Array, Array, EpisodeMetrics]:
        del actor_critic  # bound at construction
        T, B, O, A = steps_per_env, self._num_envs, self._obs_dim, self._act_dim
        actor_act, critic_act = self._actor_act, self._critic_act
        mean_net = _mlp_weights(params.actor, 'mean')
        log_std = np.asarray(params.actor['params']['log_std'], np.float32)
        std = np.exp(log_std)
        rc_net = _mlp_weights(params.reward_critic, 'net')
        cc_net = _mlp_weights(params.cost_critic, 'net')
        stats = self._unpack(carry.env_state)
        host_step = self._base.host_step_direct

        obs = np.asarray(carry.obs, np.float32)
        ep_ret = np.asarray(carry.ep_ret, np.float32).copy()
        ep_cost = np.asarray(carry.ep_cost, np.float32).copy()
        ep_len = np.asarray(carry.ep_len, np.float32).copy()

        if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):  # typed key
            key_arr = np.asarray(jax.random.key_data(key))
        else:  # raw uint32 key array
            key_arr = np.asarray(key)
        rng = np.random.default_rng([int(x) for x in key_arr.reshape(-1)])
        if self._noise_hook is not None:
            noise_all = np.asarray(self._noise_hook(T, B, A), np.float32)
        else:
            noise_all = rng.standard_normal((T, B, A), dtype=np.float32)

        r_obs = np.empty((T, B, O), np.float32)
        r_act = np.empty((T, B, A), np.float32)
        r_logp = np.empty((T, B), np.float32)
        r_reward = np.empty((T, B), np.float32)
        r_cost = np.empty((T, B), np.float32)
        r_vr = np.empty((T, B), np.float32)
        r_vc = np.empty((T, B), np.float32)
        r_term = np.empty((T, B), bool)
        r_trunc = np.empty((T, B), bool)
        r_fobs = np.empty((T, B, O), np.float32)
        r_done = np.empty((T, B), bool)
        r_ep_ret = np.empty((T, B), np.float32)
        r_ep_cost = np.empty((T, B), np.float32)
        r_ep_len = np.empty((T, B), np.float32)

        for t in range(T):
            mean = _forward(mean_net, obs, actor_act)
            act = mean + std * noise_all[t]
            z = (act - mean) / std
            r_logp[t] = -np.sum(0.5 * np.square(z) + log_std + _LOG_SQRT_2PI, axis=-1)
            r_vr[t] = _forward(rc_net, obs, critic_act)[:, 0]
            r_vc[t] = _forward(cc_net, obs, critic_act)[:, 0]
            r_obs[t] = obs
            r_act[t] = act

            native = (self._offset + self._scale * act).astype(np.float64)
            raw_obs, reward, cost, term, trunc, final_obs = host_step(native)

            if self._obs_norm:
                st = stats['obs']
                st.update(raw_obs)
                next_obs = st.normalize(raw_obs)
                final_obs_n = st.normalize(final_obs)
            else:
                next_obs, final_obs_n = raw_obs, final_obs
            if self._rew_norm:
                st = stats['reward']
                st.update(reward)
                reward_n = st.normalize(reward)
            else:
                reward_n = reward
            if self._cost_norm:
                st = stats['cost']
                st.update(cost)
                cost_n = st.normalize(cost)
            else:
                cost_n = cost

            ep_ret += reward
            ep_cost += cost
            ep_len += 1.0
            done = np.logical_or(term, trunc)
            r_reward[t] = reward_n
            r_cost[t] = cost_n
            r_term[t] = term
            r_trunc[t] = trunc
            r_fobs[t] = final_obs_n
            r_done[t] = done
            r_ep_ret[t] = ep_ret
            r_ep_cost[t] = ep_cost
            r_ep_len[t] = ep_len
            not_done = 1.0 - done.astype(np.float32)
            ep_ret *= not_done
            ep_cost *= not_done
            ep_len *= not_done
            obs = next_obs.astype(np.float32)

        flat_fobs = r_fobs.reshape(T * B, O)
        fv_r = _forward(rc_net, flat_fobs, critic_act)[:, 0].reshape(T, B)
        fv_c = _forward(cc_net, flat_fobs, critic_act)[:, 0].reshape(T, B)
        last_vr = _forward(rc_net, obs, critic_act)[:, 0]
        last_vc = _forward(cc_net, obs, critic_act)[:, 0]

        new_carry = RolloutCarry(
            env_state=self._pack(stats), obs=jnp.asarray(obs),
            ep_ret=jnp.asarray(ep_ret), ep_cost=jnp.asarray(ep_cost),
            ep_len=jnp.asarray(ep_len),
        )
        traj = Trajectory(
            obs=jnp.asarray(r_obs), act=jnp.asarray(r_act), logp=jnp.asarray(r_logp),
            reward=jnp.asarray(r_reward), cost=jnp.asarray(r_cost),
            value_r=jnp.asarray(r_vr), value_c=jnp.asarray(r_vc),
            terminated=jnp.asarray(r_term), truncated=jnp.asarray(r_trunc),
            final_value_r=jnp.asarray(fv_r), final_value_c=jnp.asarray(fv_c),
        )
        metrics = EpisodeMetrics(
            done=jnp.asarray(r_done), ep_ret=jnp.asarray(r_ep_ret),
            ep_cost=jnp.asarray(r_ep_cost), ep_len=jnp.asarray(r_ep_len),
        )
        return new_carry, traj, jnp.asarray(last_vr), jnp.asarray(last_vc), metrics


class FastHostOffPolicyRunner(_FastStackBase):
    """numpy fast collector for off-policy learners on host-backed envs —
    external-store mode only (the accelerator-learner epoch,
    algorithms/off_policy/ddpg.py ``_epoch_host_accel``).

    Drop-in for :class:`adapter.host_loop.HostOffPolicyRunner` with
    ``buffer=None``: the per-step jitted policy/store calls (~1-3 ms each)
    become one numpy MLP forward per step, so a 50-transition cycle costs
    physics + microseconds instead of 100 jit dispatches.  Supports the
    off-policy actors: GaussianSACActor (tanh-squashed sample / tanh(mean)
    deterministic, models/actor.py:56-75) and MLPActor (+ optional clipped
    Gaussian exploration noise, reference: mlp_actor.py:75-96).
    """

    def __init__(self, env_stack: CMDP, actor: Any, use_exploration_noise: bool,
                 exploration_noise: float) -> None:
        super().__init__(env_stack)
        from omnisafe_tpu.models.actor import (  # pylint: disable=import-outside-toplevel
            GaussianSACActor,
            MLPActor,
        )

        if isinstance(actor, GaussianSACActor):
            self._sac_actor = True
        elif isinstance(actor, MLPActor):
            self._sac_actor = False
        else:
            raise Ineligible(f'actor {type(actor).__name__} not supported')
        try:
            self._actor_act = _ACT[actor.activation]
        except KeyError as exc:
            raise Ineligible(f'activation {exc} not in the numpy fast path') from exc
        self._use_noise = bool(use_exploration_noise)
        self._noise_scale = float(exploration_noise)

    def _policy(self, net, obs: np.ndarray, rng, deterministic: bool) -> np.ndarray:
        out = _forward(net, obs, self._actor_act)
        if self._sac_actor:
            mean, log_std = np.split(out, 2, axis=-1)
            if deterministic:
                return np.tanh(mean)
            log_std = np.clip(log_std, -20.0, 2.0)
            z = mean + np.exp(log_std) * rng.standard_normal(
                mean.shape, dtype=np.float32)
            return np.tanh(z)
        act = np.tanh(out)
        if self._use_noise and not deterministic:
            act = np.clip(
                act + self._noise_scale * rng.standard_normal(
                    act.shape, dtype=np.float32),
                -1.0, 1.0,
            )
        return act

    # --------------------------------------------------------------- rollout
    # pylint: disable-next=too-many-locals,too-many-statements
    def rollout(self, carry: RolloutCarry, buf_state: Any, policy_state: Any,
                key: Array, steps: int, use_rand) -> Tuple[RolloutCarry, Any, Any]:
        """Collect ``steps`` host steps; returns the stacked transition
        pytree (external-store contract of HostOffPolicyRunner.rollout,
        adapter/host_loop.py)."""
        assert buf_state is None, 'fast off-policy runner is external-store only'
        T, B, O, A = steps, self._num_envs, self._obs_dim, self._act_dim
        net = _mlp_weights(policy_state.actor, 'net')
        stats = self._unpack(carry.env_state)
        host_step = self._base.host_step_direct
        rand = bool(use_rand)

        obs = np.asarray(carry.obs, np.float32)
        ep_ret = np.asarray(carry.ep_ret, np.float32).copy()
        ep_cost = np.asarray(carry.ep_cost, np.float32).copy()
        ep_len = np.asarray(carry.ep_len, np.float32).copy()

        if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
            key_arr = np.asarray(jax.random.key_data(key))
        else:
            key_arr = np.asarray(key)
        rng = np.random.default_rng([int(x) for x in key_arr.reshape(-1)])

        r_obs = np.empty((T, B, O), np.float32)
        r_act = np.empty((T, B, A), np.float32)
        r_reward = np.empty((T, B), np.float32)
        r_cost = np.empty((T, B), np.float32)
        r_tddone = np.empty((T, B), np.float32)
        r_next = np.empty((T, B, O), np.float32)
        r_done = np.empty((T, B), bool)
        r_ep_ret = np.empty((T, B), np.float32)
        r_ep_cost = np.empty((T, B), np.float32)
        r_ep_len = np.empty((T, B), np.float32)

        for t in range(T):
            if rand:
                act = rng.uniform(-1.0, 1.0, (B, A)).astype(np.float32)
            else:
                act = self._policy(net, obs, rng, deterministic=False)
            r_obs[t] = obs
            r_act[t] = act

            native = (self._offset + self._scale * act).astype(np.float64)
            raw_obs, reward, cost, term, trunc, final_obs = host_step(native)

            if self._obs_norm:
                st = stats['obs']
                st.update(raw_obs)
                next_obs = st.normalize(raw_obs)
                final_obs_n = st.normalize(final_obs)
            else:
                next_obs, final_obs_n = raw_obs, final_obs
            reward_n = reward
            if self._rew_norm:
                st = stats['reward']
                st.update(reward)
                reward_n = st.normalize(reward)
            cost_n = cost
            if self._cost_norm:
                st = stats['cost']
                st.update(cost)
                cost_n = st.normalize(cost)

            done = np.logical_or(term, trunc)
            # TD bootstrap convention: done = terminated AND NOT truncated;
            # real next obs = pre-reset final obs at episode end
            # (reference: offpolicy_adapter.py:136-149)
            r_reward[t] = reward_n
            r_cost[t] = cost_n
            r_tddone[t] = np.logical_and(term, np.logical_not(trunc))
            r_next[t] = np.where(done[:, None], final_obs_n, next_obs)
            ep_ret += reward
            ep_cost += cost
            ep_len += 1.0
            r_done[t] = done
            r_ep_ret[t] = ep_ret
            r_ep_cost[t] = ep_cost
            r_ep_len[t] = ep_len
            not_done = 1.0 - done.astype(np.float32)
            ep_ret *= not_done
            ep_cost *= not_done
            ep_len *= not_done
            obs = next_obs.astype(np.float32)

        new_carry = RolloutCarry(
            env_state=self._pack(stats), obs=jnp.asarray(obs),
            ep_ret=jnp.asarray(ep_ret), ep_cost=jnp.asarray(ep_cost),
            ep_len=jnp.asarray(ep_len),
        )
        transitions = {
            'obs': r_obs, 'act': r_act, 'reward': r_reward, 'cost': r_cost,
            'done': r_tddone, 'next_obs': r_next,
        }
        metrics = EpisodeMetrics(done=r_done, ep_ret=r_ep_ret,
                                 ep_cost=r_ep_cost, ep_len=r_ep_len)
        return new_carry, transitions, metrics

    def eval_episode(self, policy_state: Any, key: Array,
                     eval_stack_runner=None):  # pragma: no cover - thin
        raise NotImplementedError('use HostEvalRunner for evaluation')


__all__ = ['FastHostOnPolicyRunner', 'FastHostOffPolicyRunner', 'Ineligible']
