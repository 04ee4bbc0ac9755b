"""Model layer tests (reference analogue: tests/test_model.py:36-203)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.envs.spaces import Box
from omnisafe_tpu.models import (
    ConstraintActorCritic,
    ConstraintActorQCritic,
    build_actor,
    build_critic,
)
from omnisafe_tpu.utils.config import Config


def _model_cfgs(actor_type='gaussian_learning', num_critics=1):
    return Config(
        weight_initialization_mode='kaiming_uniform',
        actor_type=actor_type,
        actor={'hidden_sizes': [8, 8], 'activation': 'tanh', 'lr': 3e-4},
        critic={'hidden_sizes': [8, 8], 'activation': 'tanh', 'lr': 3e-4,
                'num_critics': num_critics},
    )


def test_builders_reject_unknown():
    with pytest.raises(NotImplementedError):
        build_actor('bogus', 2, [8])
    with pytest.raises(NotImplementedError):
        build_critic('bogus', [8])


@pytest.mark.parametrize('actor_type', ['gaussian_learning', 'gaussian_sac', 'mlp'])
def test_actor_shapes(actor_type):
    actor = build_actor(actor_type, act_dim=3, hidden_sizes=[8, 8])
    params = actor.init(jax.random.key(0), jnp.zeros((5, 4)))
    out = actor.apply(params, jnp.zeros((5, 4)))
    if actor_type == 'mlp':
        assert out.shape == (5, 3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)
    else:
        act = out.sample(jax.random.key(1))
        assert act.shape == (5, 3)
        assert out.log_prob(act).shape == (5,)


def test_q_critic_twin_heads_differ():
    critic = build_critic('q', [8, 8], num_critics=2)
    obs, act = jnp.ones((7, 4)), jnp.ones((7, 2))
    params = critic.init(jax.random.key(0), obs, act)
    q = critic.apply(params, obs, act)
    assert q.shape == (2, 7)
    assert not np.allclose(np.asarray(q[0]), np.asarray(q[1]))


def test_constraint_actor_critic_step():
    obs_space, act_space = Box.create(-1, 1, (6,)), Box.create(-1, 1, (2,))
    ac = ConstraintActorCritic(obs_space, act_space, _model_cfgs())
    params = ac.init(jax.random.key(0))
    obs = jnp.zeros((3, 6))
    act, v_r, v_c, logp = ac.step(params, obs, jax.random.key(1))
    assert act.shape == (3, 2) and v_r.shape == (3,) and v_c.shape == (3,) and logp.shape == (3,)
    det1, *_ = ac.step(params, obs, jax.random.key(2), deterministic=True)
    det2, *_ = ac.step(params, obs, jax.random.key(3), deterministic=True)
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det2))


def test_constraint_actor_q_critic_polyak():
    obs_space, act_space = Box.create(-1, 1, (6,)), Box.create(-1, 1, (2,))
    acq = ConstraintActorQCritic(obs_space, act_space, _model_cfgs('gaussian_sac', num_critics=2))
    params = acq.init(jax.random.key(0))
    # perturb online nets, then polyak: targets move a fraction toward online
    moved = params.replace(actor=jax.tree.map(lambda p: p + 1.0, params.actor))
    updated = acq.polyak_update(moved, polyak=0.25)
    diff = jax.tree.leaves(
        jax.tree.map(lambda t, a: np.max(np.abs(np.asarray(t - a + 0.75))), updated.target_actor, moved.actor)
    )
    assert max(diff) < 1e-5


def test_gaussian_learning_actor_std_init_one():
    actor = build_actor('gaussian_learning', 2, [8])
    params = actor.init(jax.random.key(0), jnp.zeros((1, 3)))
    dist = actor.apply(params, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(dist.scale), 1.0, atol=1e-6)
