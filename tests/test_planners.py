"""Planner unit tests: chunked receding-horizon execution.

The reference replans every step (reference: planner/cem.py:227-271);
``plan(..., chunk=k)`` returns the first k actions of the optimized
sequence so callers can execute a k-step prefix per planning call
(amortizing planner compute / dispatch round trips).  chunk=1 must stay
exactly the reference semantics.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.algorithms.model_based.planners import CCEPlanner, CEMPlanner
from omnisafe_tpu.models.ensemble import DynamicsEnsemble

OBS, ACT, H = 3, 2, 6


def _planner(cls=CEMPlanner, **over):
    dyn = DynamicsEnsemble(state_dim=OBS, action_dim=ACT, num_ensemble=2,
                           elite_size=1, hidden_size=8, max_epoch=1)
    cfg = dict(plan_horizon=H, num_iterations=2, num_particles=2,
               num_samples=10, num_elites=3, momentum=0.1, epsilon=1e-3,
               init_var=4.0)
    cfg.update(over)
    ns = types.SimpleNamespace(**cfg)
    ns.get = lambda k, d=None: cfg.get(k, d)
    return dyn, cls(dyn, ns, gamma=0.99, cost_gamma=1.0, action_dim=ACT,
                    cost_limit=1.0)


@pytest.mark.parametrize('cls', [CEMPlanner, CCEPlanner])
def test_plan_chunk_shapes_and_prefix(cls):
    dyn, planner = _planner(cls)
    dyn_state = dyn.init(jax.random.key(0))
    obs = jnp.ones((OBS,))
    ps = planner.init()

    act1, ps1, _ = planner.plan(dyn_state, ps, obs, jax.random.key(1))
    assert act1.shape == (1, ACT)
    act3, ps3, _ = planner.plan(dyn_state, ps, obs, jax.random.key(1), chunk=3)
    assert act3.shape == (3, ACT)
    # same key + same warm start -> identical optimized sequence; the chunk
    # only changes how much of it is returned
    np.testing.assert_allclose(np.asarray(act3[0]), np.asarray(act1[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps1.mean), np.asarray(ps3.mean), rtol=1e-6)


def test_plan_chunk_warm_start_shift():
    dyn, planner = _planner()
    dyn_state = dyn.init(jax.random.key(0))
    obs = jnp.ones((OBS,))
    _, ps, _ = planner.plan(dyn_state, planner.init(), obs, jax.random.key(1))

    # a chunk-k call must shift the carried mean forward k steps on entry;
    # with momentum 1.0 the CEM iteration keeps mean == warm start, making
    # the shift directly observable
    dyn2, planner0 = _planner(num_iterations=1, momentum=1.0)
    del dyn2
    k = 2
    acts, ps2, _ = planner0.plan(dyn_state, ps, obs, jax.random.key(2), chunk=k)
    np.testing.assert_allclose(np.asarray(acts), np.asarray(ps.mean[k:k + 2]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps2.mean[:H - k]),
                               np.asarray(ps.mean[k:]), rtol=1e-6)


def test_pets_trains_with_plan_chunk():
    import omnisafe_tpu

    cfg = {
        'train_cfgs': {'total_steps': 40, 'vector_env_nums': 1},
        'algo_cfgs': {'steps_per_epoch': 20, 'update_dynamics_cycle': 10,
                      'start_learning_steps': 5, 'action_repeat': 1},
        'dynamics_cfgs': {'num_ensemble': 2, 'elite_size': 1,
                          'hidden_size': 8, 'max_epoch': 1},
        'planner_cfgs': {'plan_chunk': 5, 'plan_horizon': 6, 'num_particles': 2,
                         'num_samples': 10, 'num_elites': 3, 'num_iterations': 1},
        'evaluation_cfgs': {'use_eval': False},
        'logger_cfgs': {'use_tensorboard': False,
                        'log_dir': '/tmp/osafe_test_runs'},
    }
    agent = omnisafe_tpu.Agent('PETS', 'SafetyPointGoal1-v0-modelbased',
                               custom_cfgs=cfg)
    ret, cost, _len = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost)
