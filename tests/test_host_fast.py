"""Numpy fast-path host rollout: semantic parity with the jitted runner.

The fast runner (adapter/host_fast.py) must be a drop-in for the generic
HostRolloutRunner on the standard on-policy stack: same wrapper semantics
(normalizer update order, ActionScale mapping, episode accounting), same
record layout, and carry pytrees that remain checkpoint-compatible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.adapter.host_fast import FastHostOnPolicyRunner, Ineligible, _NpStats
from omnisafe_tpu.adapter.host_loop import HostRolloutRunner
from omnisafe_tpu.adapter.onpolicy import build_env_stack
from omnisafe_tpu.common.normalizer import RunningStats
from omnisafe_tpu.models.actor_critic import ConstraintActorCritic
from omnisafe_tpu.utils.config import Config

from test_host_loop import _FakeHostEnv, B  # noqa: F401  (registers FakeHost-v0)


def _algo_cfgs(**over):
    base = {'obs_normalize': True, 'reward_normalize': False, 'cost_normalize': False}
    base.update(over)
    return Config(**base)


def _model_cfgs():
    return Config(
        actor_type='gaussian_learning',
        weight_initialization_mode='kaiming_uniform',
        actor=Config(hidden_sizes=[8, 8], activation='tanh', lr=3e-4),
        critic=Config(hidden_sizes=[8, 8], activation='tanh', lr=3e-4),
    )


def _make(cfg_over=None, log_std=None):
    stack = build_env_stack('FakeHost-v0', B, _algo_cfgs(**(cfg_over or {})))
    ac = ConstraintActorCritic(stack.observation_space, stack.action_space, _model_cfgs())
    params = ac.init(jax.random.key(7))
    if log_std is not None:
        actor = jax.tree_util.tree_map(lambda x: x, params.actor)
        actor['params']['log_std'] = jnp.full_like(
            actor['params']['log_std'], log_std)
        params = params.replace(actor=actor)
    return stack, ac, params


def test_np_stats_matches_running_stats():
    rng = np.random.default_rng(0)
    js = RunningStats.create((4,))
    ns = _NpStats(np.zeros(4), np.ones(4), 1e-4)
    for _ in range(5):
        batch = rng.normal(size=(6, 4)).astype(np.float32) * 3 + 1
        js = js.update(jnp.asarray(batch))
        ns.update(batch)
    np.testing.assert_allclose(np.asarray(js.mean), ns.mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(js.var), ns.var, atol=1e-4)
    np.testing.assert_allclose(float(js.count), float(ns.count), rtol=1e-6)
    # scalar shape too
    js0, ns0 = RunningStats.create(()), _NpStats(np.zeros(()), np.ones(()), 1e-4)
    for _ in range(3):
        batch = rng.normal(size=(5,)).astype(np.float32)
        js0 = js0.update(jnp.asarray(batch))
        ns0.update(batch)
    np.testing.assert_allclose(np.asarray(js0.var), ns0.var, atol=1e-5)


def test_fast_runner_matches_jax_runner_deterministic():
    """With a near-zero policy std both runners follow the same trajectory;
    every recorded field must agree (logp excluded: it is dominated by the
    noise realization at tiny std)."""
    steps = 12
    stack_a, ac, params = _make(log_std=-20.0)
    stack_b = build_env_stack('FakeHost-v0', B, _algo_cfgs())

    jr = HostRolloutRunner(stack_a, ac)
    fr = FastHostOnPolicyRunner(stack_b, ac)

    carry_j = jr.reset(jax.random.key(0))
    carry_f = fr.reset(jax.random.key(0))
    np.testing.assert_allclose(np.asarray(carry_j.obs), np.asarray(carry_f.obs),
                               atol=1e-6)

    carry_j, tj, lvr_j, lvc_j, ep_j = jr.rollout(carry_j, params, None,
                                                 jax.random.key(1), steps)
    carry_f, tf, lvr_f, lvc_f, ep_f = fr.rollout(carry_f, params, None,
                                                 jax.random.key(1), steps)

    for name in ('obs', 'act', 'reward', 'cost', 'value_r', 'value_c',
                 'terminated', 'truncated', 'final_value_r', 'final_value_c'):
        np.testing.assert_allclose(
            np.asarray(getattr(tj, name), np.float32),
            np.asarray(getattr(tf, name), np.float32),
            atol=2e-4, err_msg=name,
        )
    for name in ('done', 'ep_ret', 'ep_cost', 'ep_len'):
        np.testing.assert_allclose(
            np.asarray(getattr(ep_j, name), np.float32),
            np.asarray(getattr(ep_f, name), np.float32),
            atol=1e-4, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(lvr_j), np.asarray(lvr_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lvc_j), np.asarray(lvc_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry_j.obs), np.asarray(carry_f.obs),
                               atol=2e-4)
    # normalizer statistics carried identically (checkpoint compatibility)
    from omnisafe_tpu.evaluator import _find_stats
    sj, sf = _find_stats(carry_j.env_state), _find_stats(carry_f.env_state)
    np.testing.assert_allclose(np.asarray(sj.mean), np.asarray(sf.mean), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sj.var), np.asarray(sf.var), atol=1e-3)
    np.testing.assert_allclose(float(sj.count), float(sf.count), rtol=1e-6)


def test_fast_runner_logp_and_values_consistent_with_flax():
    """At a real std the recorded logp/values must equal the flax modules'
    recomputation on the recorded (obs, act) — the exact quantities the
    jitted update program later consumes as ratio denominators."""
    steps = 10
    stack, ac, params = _make(
        cfg_over={'reward_normalize': True, 'cost_normalize': True})
    fr = FastHostOnPolicyRunner(stack, ac)
    carry = fr.reset(jax.random.key(2))
    carry, traj, _lvr, _lvc, _ep = fr.rollout(carry, params, None,
                                              jax.random.key(3), steps)
    obs = np.asarray(traj.obs).reshape(steps * B, -1)
    act = np.asarray(traj.act).reshape(steps * B, -1)
    dist = ac.actor.apply(params.actor, jnp.asarray(obs))
    np.testing.assert_allclose(
        np.asarray(dist.log_prob(jnp.asarray(act))).reshape(steps, B),
        np.asarray(traj.logp), atol=1e-4)
    vr, vc = ac.value(params, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(vr).reshape(steps, B),
                               np.asarray(traj.value_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vc).reshape(steps, B),
                               np.asarray(traj.value_c), atol=1e-4)


def test_fast_runner_rejects_unsupported_stacks():
    stack, ac, _params = _make()

    class _NotGaussian:
        actor = object()
        reward_critic = object()

    with pytest.raises(Ineligible):
        FastHostOnPolicyRunner(stack, _NotGaussian())

    from omnisafe_tpu.envs.core import make
    with pytest.raises(Ineligible):
        FastHostOnPolicyRunner(make('Test-v0'), ac)  # not host-backed


def _q_model_cfgs(actor_type):
    return Config(
        actor_type=actor_type,
        weight_initialization_mode='kaiming_uniform',
        actor=Config(hidden_sizes=[8, 8], activation='relu', lr=3e-4),
        critic=Config(num_critics=2, hidden_sizes=[8, 8], activation='relu', lr=3e-4),
    )


@pytest.mark.parametrize('obs_normalize', [False, True])
def test_fast_offpolicy_runner_matches_jax_runner_deterministic(obs_normalize):
    """External-store contract parity with HostOffPolicyRunner on a
    deterministic (MLPActor, no noise) policy: identical transitions,
    TD-done convention, real-next-obs patching, and episode metrics.
    The ``obs_normalize=True`` case pins the running-stats update order and
    the normalized final_obs patching at episode ends (advisor round-4)."""
    from omnisafe_tpu.adapter.host_fast import FastHostOffPolicyRunner
    from omnisafe_tpu.adapter.host_loop import HostOffPolicyRunner
    from omnisafe_tpu.models.actor_critic import ConstraintActorQCritic

    steps = 12
    stack_a = build_env_stack('FakeHost-v0', B, _algo_cfgs(
        obs_normalize=obs_normalize, cost_normalize=True))
    stack_b = build_env_stack('FakeHost-v0', B, _algo_cfgs(
        obs_normalize=obs_normalize, cost_normalize=True))
    ac = ConstraintActorQCritic(stack_a.observation_space, stack_a.action_space,
                                _q_model_cfgs('mlp'))
    params = ac.init(jax.random.key(11))

    def predict(p, obs, k):
        del k
        return ac.actor.apply(p.actor, obs)

    jr = HostOffPolicyRunner(stack_a, predict, None)
    fr = FastHostOffPolicyRunner(stack_b, ac.actor, False, 0.0)

    carry_j = jr.reset(jax.random.key(0))
    carry_f = fr.reset(jax.random.key(0))
    np.testing.assert_allclose(np.asarray(carry_j.obs), np.asarray(carry_f.obs),
                               atol=1e-6)
    carry_j, tr_j, ep_j = jr.rollout(carry_j, None, params, jax.random.key(1),
                                     steps, False)
    carry_f, tr_f, ep_f = fr.rollout(carry_f, None, params, jax.random.key(1),
                                     steps, False)
    for name in ('obs', 'act', 'reward', 'cost', 'done', 'next_obs'):
        np.testing.assert_allclose(
            np.asarray(tr_j[name], np.float32), np.asarray(tr_f[name], np.float32),
            atol=2e-4, err_msg=name)
    for name in ('done', 'ep_ret', 'ep_cost', 'ep_len'):
        np.testing.assert_allclose(
            np.asarray(getattr(ep_j, name), np.float32),
            np.asarray(getattr(ep_f, name), np.float32), atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(carry_j.obs), np.asarray(carry_f.obs),
                               atol=2e-4)


def test_fast_offpolicy_sac_actor_matches_flax():
    """numpy SAC policy forward == flax TanhNormal mode (deterministic) and
    stays inside [-1, 1] when sampling."""
    from omnisafe_tpu.adapter.host_fast import FastHostOffPolicyRunner
    from omnisafe_tpu.models.actor_critic import ConstraintActorQCritic

    stack = build_env_stack('FakeHost-v0', B, _algo_cfgs(obs_normalize=False))
    ac = ConstraintActorQCritic(stack.observation_space, stack.action_space,
                                _q_model_cfgs('gaussian_sac'))
    params = ac.init(jax.random.key(3))
    fr = FastHostOffPolicyRunner(stack, ac.actor, False, 0.0)
    from omnisafe_tpu.adapter.host_fast import _mlp_weights
    net = _mlp_weights(params.actor, 'net')
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(B, 2)).astype(np.float32)
    det = fr._policy(net, obs, rng, deterministic=True)
    dist = ac.actor.apply(params.actor, jnp.asarray(obs))
    np.testing.assert_allclose(det, np.asarray(dist.mode()), atol=1e-5)
    samp = fr._policy(net, obs, rng, deterministic=False)
    assert np.all(np.abs(samp) <= 1.0)
