"""Environment contract tests (reference analogue: tests/test_env.py:27-153)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.envs import (
    ActionScale,
    AutoReset,
    TimeLimit,
    Vectorize,
    make,
    support_envs,
)
from omnisafe_tpu.envs.core import CMDP


def test_registry_and_make():
    ids = support_envs()
    assert 'Test-v0' in ids and 'SafetyPointGoal1-v0' in ids and 'SafetyAntVelocity-v1' in ids
    with pytest.raises(NotImplementedError):
        make('Bogus-v0')


@pytest.mark.parametrize('env_id', ['Test-v0', 'SafetyPointGoal1-v0', 'SafetyCarButton1-v0',
                                    'SafetyPointCircle1-v0', 'SafetyAntVelocity-v1'])
def test_step_contract(env_id):
    env = make(env_id)
    key = jax.random.key(0)
    state, obs = env.reset(key)
    assert obs.shape == env.observation_space.shape
    act = env.action_space.sample(jax.random.key(1))
    state, ts = env.step(state, act, jax.random.key(2))
    assert ts.obs.shape == env.observation_space.shape
    for field in (ts.reward, ts.cost):
        assert field.shape == ()
        assert np.isfinite(float(field))
    assert ts.terminated.dtype == bool and ts.truncated.dtype == bool
    assert float(ts.cost) >= 0.0


def test_time_limit_truncates():
    env = TimeLimit(make('Test-v0'), time_limit=3)
    state, _ = env.reset(jax.random.key(0))
    act = jnp.zeros(2)
    for i in range(3):
        state, ts = env.step(state, act, jax.random.key(i))
    assert bool(ts.truncated)


def test_auto_reset_restarts_and_keeps_final_obs():
    env = AutoReset(TimeLimit(make('Test-v0'), time_limit=2))
    state, _ = env.reset(jax.random.key(0))
    act = jnp.zeros(2)
    state, ts1 = env.step(state, act, jax.random.key(1))
    state, ts2 = env.step(state, act, jax.random.key(2))  # hits the limit
    assert bool(ts2.truncated)
    # returned obs is the fresh reset obs, final_obs the pre-reset one
    assert not np.allclose(np.asarray(ts2.obs), np.asarray(ts2.final_obs))
    # next episode starts from 0 elapsed steps: stepping once doesn't truncate
    state, ts3 = env.step(state, act, jax.random.key(3))
    assert not bool(ts3.truncated)


def test_vectorize_batches():
    env = Vectorize(make('Test-v0'), 5)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (5, 8)
    state, ts = env.step(state, jnp.zeros((5, 2)), jax.random.key(1))
    assert ts.reward.shape == (5,)


def test_action_scale_maps_bounds():
    class Bounded(CMDP):
        _support_envs = ['b']
        def __init__(self):  # pylint: disable=super-init-not-called
            self._env_id = 'b'
            self.seen = None
        @property
        def observation_space(self):
            from omnisafe_tpu.envs.spaces import Box
            return Box.create(-1, 1, (2,))
        @property
        def action_space(self):
            from omnisafe_tpu.envs.spaces import Box
            return Box.create([0.0, -4.0], [2.0, 4.0])
        def reset(self, key):
            return None, jnp.zeros(2)
        def step(self, state, action, key):
            from omnisafe_tpu.envs.core import TimeStep
            obs = action  # echo native action
            return state, TimeStep(obs=obs, reward=jnp.zeros(()), cost=jnp.zeros(()),
                                   terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
                                   final_obs=obs)

    env = ActionScale(Bounded(), -1.0, 1.0)
    assert env.action_space.low == (-1.0, -1.0)
    _, ts = env.step(None, jnp.array([1.0, -1.0]), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(ts.obs), [2.0, -4.0], atol=1e-6)
    _, ts = env.step(None, jnp.array([0.0, 0.0]), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(ts.obs), [1.0, 0.0], atol=1e-6)


def test_velocity_cost_semantics():
    env = make('SafetyAntVelocity-v1')
    state, _ = env.reset(jax.random.key(0))
    # drive forward hard for many steps -> speed exceeds the limit -> cost 1
    act = jnp.ones(8)
    cost = 0.0
    for i in range(200):
        state, ts = env.step(state, act, jax.random.key(i))
        cost = float(ts.cost)
    assert float(state.vx) > env.velocity_limit
    assert cost == 1.0


@pytest.mark.parametrize('env_id', support_envs())
def test_every_registered_env_contract(env_id):
    """Contract sweep over the entire registry (reference analogue:
    tests/test_env.py loops support lists)."""
    if env_id.startswith('FakeHost'):
        pytest.skip('test-only host fake (no device path); order-dependent '
                    'registration from test_host_loop imports')
    env = make(env_id)
    batch = (1,) if env.is_vectorized else ()
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == batch + env.observation_space.shape
    act = env.action_space.sample(jax.random.key(1))
    if env.is_vectorized:
        act = act[None]
    state, ts = env.step(state, act, jax.random.key(2))
    assert ts.obs.shape == batch + env.observation_space.shape
    assert ts.final_obs.shape == batch + env.observation_space.shape
    assert np.all(np.isfinite(np.asarray(ts.reward))) and np.all(np.isfinite(np.asarray(ts.cost)))
    assert env.max_episode_steps > 0


def test_navigation_hazard_cost():
    env = make('SafetyPointGoal1-v0')
    state, _ = env.reset(jax.random.key(0))
    # teleport onto a hazard: cost must fire
    state = state.replace(pos=state.hazards[0])
    state, ts = env.step(state, jnp.zeros(2), jax.random.key(1))
    assert float(ts.cost) == 1.0


def test_unavailable_optional_backend_message():
    """MetaDrive / Isaac Gym ids degrade to a helpful error when their
    third-party simulator is not installed (reference analogue: optional
    import of metadrive/isaacgym backends)."""
    try:
        import metadrive  # noqa: F401

        pytest.skip('metadrive installed; backend registers normally')
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match='metadrive'):
        make('SafeMetaDrive')
    with pytest.raises(NotImplementedError, match='isaacgym'):
        make('ShadowHandOverSafeFinger')


def test_ant_navigation_registered():
    """Ant completes the 5-agent roster (reference:
    safety_gymnasium_env.py:80-91)."""
    for task in ('Goal', 'Button', 'Push', 'Circle'):
        for level in (0, 1, 2):
            assert f'SafetyAnt{task}{level}-v0' in support_envs()
    assert 'SafetyAntGoal1-v0-modelbased' in support_envs()
