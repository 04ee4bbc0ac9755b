"""Mock-backed tests for the optional host-simulator backends.

MetaDrive and Isaac Gym cannot run in this image (optional / CUDA-only
dependencies), but their ``io_callback`` marshaling paths must still be real,
executed code: these tests inject fake simulator backends and drive the
wrappers through jitted reset + scan-of-steps programs, checking shapes,
dtypes, cost extraction, auto-reset, and the ``final_obs`` convention
(reference: omnisafe/envs/meta_drive_env.py:67-198,
omnisafe/utils/isaac_gym_utils.py:42-104).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class _FakeSpace:
    def __init__(self, shape):
        self.shape = shape


class _FakeMetaDriveEnv:
    """Single-env MetaDrive stand-in: obs counts steps, terminates after 3
    steps, cost 1.0 whenever action[0] > 0 (crash surrogate)."""

    OBS_DIM = 5
    ACT_DIM = 2

    def __init__(self, config):
        self.config = config
        self.observation_space = _FakeSpace((self.OBS_DIM,))
        self.action_space = _FakeSpace((self.ACT_DIM,))
        self._t = 0
        self.n_resets = 0

    def reset(self, seed=None):
        self._t = 0
        self.n_resets += 1
        return np.full(self.OBS_DIM, float(self.n_resets), np.float64), {}

    def step(self, action):
        assert action.dtype == np.float64  # wrapper marshals to host dtype
        self._t += 1
        obs = np.full(self.OBS_DIM, self.n_resets + self._t / 10.0, np.float64)
        terminated = self._t >= 3
        info = {'cost': 1.0 if float(action[0]) > 0 else 0.0}
        return obs, 0.5, terminated, False, info


def test_metadrive_callback_marshaling(monkeypatch):
    import omnisafe_tpu.envs.meta_drive as md

    monkeypatch.setattr(md, '_SafeMetaDriveEnv', _FakeMetaDriveEnv, raising=False)
    env = md.SafetyMetaDriveEnv('SafeMetaDrive', num_envs=2)
    assert env.observation_space.shape == (_FakeMetaDriveEnv.OBS_DIM,)
    assert env.action_space.shape == (_FakeMetaDriveEnv.ACT_DIM,)

    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(env.reset)(key)
    assert obs.shape == (2, _FakeMetaDriveEnv.OBS_DIM)
    np.testing.assert_allclose(np.asarray(obs), 1.0)  # first reset of each env

    # positive action[0] in env 0 -> cost 1; negative in env 1 -> cost 0
    act = jnp.stack([jnp.array([0.7, 0.0]), jnp.array([-0.7, 0.0])])

    def scan_step(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        st, ts = env.step(st, act, sub)
        return (st, k), ts

    (_state, _), traj = jax.jit(
        lambda c: jax.lax.scan(scan_step, c, None, length=4)
    )((state, key))

    assert traj.obs.shape == (4, 2, _FakeMetaDriveEnv.OBS_DIM)
    assert traj.reward.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(traj.reward), 0.5)
    np.testing.assert_allclose(np.asarray(traj.cost)[:, 0], 1.0)
    np.testing.assert_allclose(np.asarray(traj.cost)[:, 1], 0.0)
    # fake env terminates on step 3 (index 2)
    term = np.asarray(traj.terminated)
    assert term[2].all() and not term[[0, 1, 3]].any()
    # auto-reset on termination: step 3's obs comes from a fresh reset while
    # final_obs keeps the pre-reset terminal observation
    step3_obs = np.asarray(traj.obs)[2]
    np.testing.assert_allclose(step3_obs, 2.0)  # second reset
    final3 = np.asarray(traj.final_obs)[2]
    np.testing.assert_allclose(final3, 1.3)  # obs at the terminal step
    # non-terminal steps keep stepping the fresh episode
    np.testing.assert_allclose(np.asarray(traj.obs)[3], 2.1)


class _FakeIsaacBatch:
    """Batched Isaac Gym stand-in: steps the whole batch in one call and
    returns already-batched arrays (torch-like float32/bool)."""

    def __init__(self, num_envs, obs_dim=7, act_dim=3):
        self.num_envs = num_envs
        self.observation_space = _FakeSpace((obs_dim,))
        self.action_space = _FakeSpace((act_dim,))
        self._t = 0

    def reset(self, seed=None):
        self._t = 0
        obs = np.tile(np.arange(self.num_envs, dtype=np.float32)[:, None],
                      (1, self.observation_space.shape[0]))
        return obs, {}

    def step(self, actions):
        assert actions.shape == (self.num_envs, self.action_space.shape[0])
        self._t += 1
        obs = np.full((self.num_envs, self.observation_space.shape[0]),
                      float(self._t), np.float32)
        reward = actions.sum(axis=-1).astype(np.float32)
        cost = (actions[:, 0] > 0).astype(np.float32)
        term = np.zeros(self.num_envs, np.bool_)
        trunc = np.full(self.num_envs, self._t >= 2, np.bool_)
        return obs, reward, cost, term, trunc, {}


def test_isaac_gym_callback_marshaling(monkeypatch):
    import omnisafe_tpu.envs.isaac_gym as ig

    monkeypatch.setattr(
        ig, 'make_isaac_gym_env',
        lambda env_id, num_envs: _FakeIsaacBatch(num_envs),
        raising=False,
    )
    env = ig.SafetyIsaacGymEnv('ShadowHandOverSafeFinger', num_envs=4)
    key = jax.random.PRNGKey(1)
    state, obs = jax.jit(env.reset)(key)
    assert obs.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(obs)[:, 0], np.arange(4, dtype=np.float32))

    act = jnp.concatenate(
        [jnp.ones((2, 3), jnp.float32), -jnp.ones((2, 3), jnp.float32)]
    )
    step = jax.jit(env.step)
    state, ts = step(state, act, key)
    assert ts.obs.shape == (4, 7) and ts.cost.shape == (4,)
    np.testing.assert_allclose(np.asarray(ts.reward), [3.0, 3.0, -3.0, -3.0])
    np.testing.assert_allclose(np.asarray(ts.cost), [1.0, 1.0, 0.0, 0.0])
    assert not np.asarray(ts.truncated).any()
    state, ts = step(state, act, key)
    assert np.asarray(ts.truncated).all()
    assert not np.asarray(ts.terminated).any()


def test_unavailable_ids_raise_named_dependency():
    """Without the optional deps, make() names the missing package instead of
    an unknown-id error (reference optional-import behavior)."""
    from omnisafe_tpu.envs.core import make

    with pytest.raises(Exception, match='metadrive'):
        make('SafeMetaDrive')
    with pytest.raises(Exception, match='isaacgym'):
        make('ShadowHandOverSafeFinger')
