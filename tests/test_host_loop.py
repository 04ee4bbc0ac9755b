"""Host-driven rollout machinery tests on a fake (numpy) host env.

Covers the relay-state grafting, wrapper-stack reuse, episode accounting,
replay-ring stores, and the external-store (TPU-learner) mode — all on CPU
with a deterministic scripted env, no MuJoCo needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.adapter.host_loop import (
    HostEvalRunner,
    HostOffPolicyRunner,
    HostRolloutRunner,
    find_host_base,
)
from omnisafe_tpu.adapter.onpolicy import build_env_stack
from omnisafe_tpu.common.buffer.offpolicy import ReplayBuffer
from omnisafe_tpu.envs.core import CMDP, env_register
from omnisafe_tpu.envs.spaces import Box
from omnisafe_tpu.utils.config import Config

B = 3          # envs
EP_LEN = 5     # scripted episode length


@env_register
class _FakeHostEnv(CMDP):
    """Deterministic numpy-backed env: obs = [t, env_idx], reward = 1,
    cost = t%2, truncates every EP_LEN steps (host-side auto-reset)."""

    _support_envs = ['FakeHost-v0']
    need_time_limit_wrapper = False
    need_auto_reset_wrapper = False
    is_vectorized = True
    host_backed = True

    def __init__(self, env_id: str, num_envs: int = B, **kwargs):
        super().__init__(env_id, **kwargs)
        self._num_envs = num_envs
        self._t = np.zeros(num_envs, np.int64)

    @property
    def num_envs(self):
        return self._num_envs

    @property
    def observation_space(self):
        return Box.create(-jnp.inf, jnp.inf, (2,))

    @property
    def action_space(self):
        return Box.create(-2.0 * jnp.ones(1), 2.0 * jnp.ones(1))

    @property
    def max_episode_steps(self):
        return EP_LEN

    def host_reset_direct(self, seeds):
        self._t[:] = 0
        return self._obs()

    def _obs(self):
        return np.stack([self._t, np.arange(self._num_envs)], -1).astype(np.float32)

    def host_step_direct(self, actions):
        self.last_actions = np.array(actions)
        self._t += 1
        trunc = self._t >= EP_LEN
        final_obs = self._obs()
        reward = np.ones(self._num_envs, np.float32)
        cost = (self._t % 2).astype(np.float32)
        self._t[trunc] = 0
        return (self._obs(), reward, cost, np.zeros(self._num_envs, bool),
                trunc, final_obs)

    def reset(self, key):  # device path unused in these tests
        raise NotImplementedError

    def step(self, state, action, key):
        raise NotImplementedError


class _ConstPolicy:
    """ConstraintActorCritic-shaped stub returning a constant action."""

    def step(self, params, obs, key, deterministic=False):
        act = jnp.full((obs.shape[0], 1), 0.5)
        zeros = jnp.zeros((obs.shape[0],))
        return act, zeros, zeros, zeros

    def value(self, params, obs):
        return jnp.zeros(obs.shape[:1]), jnp.zeros(obs.shape[:1])


def _algo_cfgs(**over):
    base = {'obs_normalize': False, 'reward_normalize': False, 'cost_normalize': False}
    base.update(over)
    return Config(**base)


def test_find_host_base():
    stack = build_env_stack('FakeHost-v0', B, _algo_cfgs(obs_normalize=True))
    assert find_host_base(stack) is not None
    from omnisafe_tpu.envs.core import make
    assert find_host_base(make('Test-v0')) is None


def test_onpolicy_runner_accounting_and_grafting():
    stack = build_env_stack('FakeHost-v0', B, _algo_cfgs(obs_normalize=True))
    runner = HostRolloutRunner(stack, _ConstPolicy())
    carry = runner.reset(jax.random.key(0))
    steps = 12
    carry, traj, last_vr, last_vc, ep = runner.rollout(
        carry, None, None, jax.random.key(1), steps)

    assert traj.obs.shape == (steps, B, 2)
    assert traj.act.shape == (steps, B, 1)
    # episodes truncate every EP_LEN steps: dones at t = 4 and 9 (0-based)
    done = np.asarray(ep.done)
    assert done[EP_LEN - 1].all() and done[2 * EP_LEN - 1].all()
    assert done.sum() == 2 * B
    # episode metrics at the dones: ret = 5, len = 5, cost = 1+0+1+0+1 = 3
    np.testing.assert_allclose(np.asarray(ep.ep_ret)[EP_LEN - 1], 5.0)
    np.testing.assert_allclose(np.asarray(ep.ep_len)[EP_LEN - 1], 5.0)
    np.testing.assert_allclose(np.asarray(ep.ep_cost)[EP_LEN - 1], 3.0)
    # the carry resets accumulators on done and keeps counting after
    np.testing.assert_allclose(np.asarray(carry.ep_len), steps - 2 * EP_LEN)

    # ActionScale grafting: policy action 0.5 in [-1,1] -> native 1.0 in [-2,2]
    np.testing.assert_allclose(runner._base.last_actions, 1.0)

    # obs normalization really ran: traj obs differ from raw ramp and the
    # stats saw (reset + steps) * B samples
    from omnisafe_tpu.evaluator import _find_stats
    stats = _find_stats(carry.env_state)
    np.testing.assert_allclose(float(stats.count), (steps + 1) * B, rtol=1e-4)


def test_offpolicy_runner_ring_matches_external_mode():
    predict = lambda params, obs, k: jnp.full((obs.shape[0], 1), 0.25)
    buffer = ReplayBuffer(obs_dim=2, act_dim=1, capacity=64, num_envs=B)

    def collect(buf):
        stack = build_env_stack('FakeHost-v0', B, _algo_cfgs())
        runner = HostOffPolicyRunner(stack, predict, buf)
        carry = runner.reset(jax.random.key(0))
        return runner.rollout(
            carry, buffer.init() if buf is not None else None,
            None, jax.random.key(1), 7, use_rand=False)

    _, ring, ep1 = collect(buffer)
    _, transitions, ep2 = collect(None)

    # the ring's first 7 rows equal the externally collected transitions
    for field in ('obs', 'act', 'reward', 'cost', 'done', 'next_obs'):
        ring_rows = np.asarray(ring.data[field][:7])
        np.testing.assert_allclose(ring_rows, np.asarray(transitions[field]),
                                   err_msg=field)
    np.testing.assert_allclose(np.asarray(ep1.ep_ret), np.asarray(ep2.ep_ret))

    # TD done: truncation is NOT a TD terminal (adapter/offpolicy.py:82)
    assert float(jnp.sum(transitions['done'])) == 0.0
    # ...but real_next_obs at the truncation row is the pre-reset obs
    tr_next = np.asarray(transitions['next_obs'][EP_LEN - 1])
    assert (tr_next[:, 0] == EP_LEN).all()


def test_host_eval_runner_masks_first_episode():
    stack = build_env_stack('FakeHost-v0', B, _algo_cfgs())
    runner = HostEvalRunner(stack, lambda params, obs, k: jnp.zeros((obs.shape[0], 1)))
    ret, cost, length = runner.eval_episode(None, jax.random.key(3), max_steps=20)
    np.testing.assert_allclose(np.asarray(length), EP_LEN)
    np.testing.assert_allclose(np.asarray(ret), EP_LEN)
    np.testing.assert_allclose(np.asarray(cost), 3.0)


def test_accel_epoch_end_to_end(monkeypatch, tmp_path):
    """The CPU-actor / device-learner epoch path trains end-to-end with the
    replay ring + TD updates on a SECOND device (virtual CPU device stands in
    for the TPU): per-epoch device residency of Jc/lr/key, per-cycle
    transition ship + async actor fetch."""
    import omnisafe_tpu
    from omnisafe_tpu.algorithms.off_policy.ddpg import DDPG

    assert len(jax.devices()) >= 2, 'conftest forces an 8-device CPU mesh'
    monkeypatch.setattr(DDPG, '_pick_learner_device', lambda self: jax.devices()[1])

    agent = omnisafe_tpu.Agent('SACLag', 'FakeHost-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 120, 'vector_env_nums': B,
                       'eval_episodes': 0},
        'algo_cfgs': {'steps_per_epoch': 20, 'update_cycle': 5,
                      'update_iters': 2, 'batch_size': 16, 'size': 64,
                      'start_learning_steps': 30},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': str(tmp_path)},
        'model_cfgs': {'actor': {'hidden_sizes': [8, 8]},
                       'critic': {'hidden_sizes': [8, 8]}},
    })
    algo = agent.agent
    ret, cost, length = agent.learn()
    assert algo._learner_device is jax.devices()[1]
    assert np.isfinite(ret) and np.isfinite(cost) and np.isfinite(length)
    # the ring really lives on the learner device
    assert algo._accel_buffer.data['obs'].devices() == {jax.devices()[1]}
