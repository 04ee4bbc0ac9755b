"""Advantage/target assembly tests (reference analogue: tests/test_buffer.py:43-413)."""

import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.common.buffer.advantages import Trajectory, compute_batch


def _traj(T, B=1, **over):
    z = lambda: jnp.zeros((T, B))
    fields = dict(
        obs=jnp.zeros((T, B, 3)),
        act=jnp.zeros((T, B, 2)),
        logp=z(),
        reward=z(),
        cost=z(),
        value_r=z(),
        value_c=z(),
        terminated=jnp.zeros((T, B), bool),
        truncated=jnp.zeros((T, B), bool),
        final_value_r=z(),
        final_value_c=z(),
    )
    fields.update(over)
    return Trajectory(**fields)


def _ref_gae(rews, vals, last_v, gamma, lam):
    """Reference semantics per path: deltas + discount_cumsum
    (reference: onpolicy_buffer.py:299-305)."""
    rews = np.append(rews, last_v)
    vals = np.append(vals, last_v)
    deltas = rews[:-1] + gamma * vals[1:] - vals[:-1]
    adv = np.zeros_like(deltas)
    acc = 0.0
    for i in reversed(range(len(deltas))):
        acc = deltas[i] + gamma * lam * acc
        adv[i] = acc
    return adv


def test_gae_single_path_epoch_cut():
    T = 6
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=T).astype(np.float32)
    values = rng.normal(size=T).astype(np.float32)
    last_v = 0.7
    traj = _traj(T, reward=jnp.asarray(rewards)[:, None], value_r=jnp.asarray(values)[:, None])
    batch = compute_batch(
        traj, jnp.asarray([last_v]), jnp.asarray([0.0]),
        gamma=0.99, cost_gamma=0.99, lam=0.95, lam_c=0.95,
    )
    expected = _ref_gae(rewards, values, last_v, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(batch.adv_r), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batch.target_value_r), expected + values, rtol=1e-4, atol=1e-5
    )


def test_gae_terminated_mid_rollout():
    """A terminal at t=2 splits into two paths: [0..2] bootstrap 0, [3..5] epoch cut."""
    T = 6
    rng = np.random.default_rng(1)
    rewards = rng.normal(size=T).astype(np.float32)
    values = rng.normal(size=T).astype(np.float32)
    last_v = -0.3
    terminated = np.zeros(T, bool)
    terminated[2] = True
    traj = _traj(
        T,
        reward=jnp.asarray(rewards)[:, None],
        value_r=jnp.asarray(values)[:, None],
        terminated=jnp.asarray(terminated)[:, None],
    )
    batch = compute_batch(
        traj, jnp.asarray([last_v]), jnp.asarray([0.0]),
        gamma=0.99, cost_gamma=0.99, lam=0.95, lam_c=0.95,
    )
    exp1 = _ref_gae(rewards[:3], values[:3], 0.0, 0.99, 0.95)
    exp2 = _ref_gae(rewards[3:], values[3:], last_v, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(batch.adv_r), np.concatenate([exp1, exp2]), rtol=1e-4, atol=1e-5)


def test_gae_truncated_uses_final_value():
    """Truncation at t=2 bootstraps with V(final_obs) (reference: onpolicy_adapter.py:114-136)."""
    T = 4
    rewards = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
    values = np.array([0.5, 0.4, 0.3, 0.2], np.float32)
    fv = 0.9
    truncated = np.array([False, False, True, False])
    traj = _traj(
        T,
        reward=jnp.asarray(rewards)[:, None],
        value_r=jnp.asarray(values)[:, None],
        truncated=jnp.asarray(truncated)[:, None],
        final_value_r=jnp.asarray([0.0, 0.0, fv, 0.0])[:, None],
    )
    batch = compute_batch(
        traj, jnp.asarray([0.1]), jnp.asarray([0.0]),
        gamma=0.9, cost_gamma=0.9, lam=0.9, lam_c=0.9,
    )
    exp1 = _ref_gae(rewards[:3], values[:3], fv, 0.9, 0.9)
    exp2 = _ref_gae(rewards[3:], values[3:], 0.1, 0.9, 0.9)
    np.testing.assert_allclose(np.asarray(batch.adv_r), np.concatenate([exp1, exp2]), rtol=1e-4, atol=1e-5)


def test_penalty_coefficient_shapes_rewards():
    T = 3
    rewards = np.ones(T, np.float32)
    costs = np.ones(T, np.float32) * 2.0
    traj = _traj(T, reward=jnp.asarray(rewards)[:, None], cost=jnp.asarray(costs)[:, None])
    batch = compute_batch(
        traj, jnp.asarray([0.0]), jnp.asarray([0.0]),
        gamma=0.9, cost_gamma=0.9, lam=1.0, lam_c=1.0, penalty_coef=0.5,
    )
    shaped = rewards - 0.5 * costs  # = 0
    expected = _ref_gae(shaped, np.zeros(T, np.float32), 0.0, 0.9, 1.0)
    np.testing.assert_allclose(np.asarray(batch.adv_r), expected, rtol=1e-5, atol=1e-6)
    # discounted_ret uses the raw reward
    assert float(batch.discounted_ret[0]) > 0


@pytest.mark.parametrize('estimator', ['gae', 'gae-rtg', 'vtrace', 'plain'])
def test_all_estimators_finite(estimator):
    T, B = 8, 4
    rng = np.random.default_rng(3)
    traj = _traj(
        T, B,
        reward=jnp.asarray(rng.normal(size=(T, B)).astype(np.float32)),
        cost=jnp.abs(jnp.asarray(rng.normal(size=(T, B)).astype(np.float32))),
        value_r=jnp.asarray(rng.normal(size=(T, B)).astype(np.float32)),
        value_c=jnp.asarray(rng.normal(size=(T, B)).astype(np.float32)),
        terminated=jnp.asarray(rng.random((T, B)) < 0.1),
        logp=jnp.asarray(rng.normal(size=(T, B)).astype(np.float32)),
    )
    batch = compute_batch(
        traj, jnp.zeros(B), jnp.zeros(B),
        gamma=0.99, cost_gamma=0.99, lam=0.95, lam_c=0.95, estimator=estimator,
    )
    for leaf in [batch.adv_r, batch.adv_c, batch.target_value_r, batch.target_value_c]:
        assert np.all(np.isfinite(np.asarray(leaf)))
        assert leaf.shape == (T * B,)


def test_vtrace_matches_reference_recursion():
    """V-trace scan vs the reference's per-path Python recursion
    (reference: onpolicy_buffer.py:338-405) with rho = c = 1."""
    T = 6
    rng = np.random.default_rng(7)
    rewards = rng.normal(size=T).astype(np.float32)
    values = rng.normal(size=T).astype(np.float32)
    last_v = 0.3
    gamma = 0.95

    # reference recursion on [values..., bootstrap]
    vals_ext = np.append(values, last_v)
    rews_ext = np.append(rewards, last_v)
    v_s = vals_ext[:-1].copy()
    last_v_s = vals_ext[-1]
    for i in reversed(range(T)):
        delta = rews_ext[i] + gamma * vals_ext[i + 1] - vals_ext[i]
        v_s[i] += delta + gamma * (last_v_s - vals_ext[i + 1])
        last_v_s = v_s[i]
    v_s_plus_1 = np.append(v_s[1:], vals_ext[-1])
    expected_adv = rews_ext[:-1] + gamma * v_s_plus_1 - vals_ext[:-1]

    traj = _traj(T, reward=jnp.asarray(rewards)[:, None], value_r=jnp.asarray(values)[:, None])
    batch = compute_batch(
        traj, jnp.asarray([last_v]), jnp.asarray([0.0]),
        gamma=gamma, cost_gamma=gamma, lam=0.95, lam_c=0.95, estimator='vtrace',
    )
    np.testing.assert_allclose(np.asarray(batch.target_value_r), v_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch.adv_r), expected_adv, rtol=1e-4, atol=1e-5)


def test_plain_estimator_is_td_error():
    T = 3
    rewards = np.array([1.0, 2.0, 3.0], np.float32)
    values = np.array([0.1, 0.2, 0.3], np.float32)
    traj = _traj(T, reward=jnp.asarray(rewards)[:, None], value_r=jnp.asarray(values)[:, None])
    batch = compute_batch(
        traj, jnp.asarray([0.4]), jnp.asarray([0.0]),
        gamma=0.9, cost_gamma=0.9, lam=0.95, lam_c=0.95, estimator='plain',
    )
    next_vals = np.array([0.2, 0.3, 0.4])
    np.testing.assert_allclose(
        np.asarray(batch.adv_r), rewards + 0.9 * next_vals - values, rtol=1e-5
    )
