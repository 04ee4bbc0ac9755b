"""Algorithm smoke-training tests (reference analogue: tests/test_policy.py).

Strategy mirrors the reference: train every registered algorithm end-to-end
on the tiny synthetic CMDP with a few hundred steps and [8, 8] networks
(reference: tests/test_policy.py:42-51).  A small representative set runs by
default; the exhaustive matrix runs under ``--full``.
"""

import os

import numpy as np
import pytest

import omnisafe_tpu

TINY = {
    'train_cfgs': {'total_steps': 512, 'vector_env_nums': 4},
    'algo_cfgs': {'steps_per_epoch': 256, 'update_iters': 2, 'batch_size': 64},
    'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
    'model_cfgs': {
        'actor': {'hidden_sizes': [8, 8]},
        'critic': {'hidden_sizes': [8, 8]},
    },
}

CORE_ON_POLICY = ['PolicyGradient', 'PPO', 'PPOLag']


def _train(algo, custom=None):
    cfg = {k: dict(v) for k, v in TINY.items()}
    if custom:
        for k, v in custom.items():
            cfg.setdefault(k, {}).update(v)
    agent = omnisafe_tpu.Agent(algo, 'Test-v0', custom_cfgs=cfg)
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost) and np.isfinite(length)
    return ret, cost, length


@pytest.mark.parametrize('algo', CORE_ON_POLICY)
def test_on_policy_core_smoke(algo):
    _train(algo)


@pytest.mark.full
@pytest.mark.parametrize(
    'algo', [a for a in omnisafe_tpu.ALGORITHMS['on-policy'] if a not in CORE_ON_POLICY]
)
def test_on_policy_full_matrix(algo):
    _train(algo)


OFF_POLICY_TINY = {
    'train_cfgs': {'total_steps': 400, 'vector_env_nums': 2, 'eval_episodes': 1},
    'algo_cfgs': {'steps_per_epoch': 200, 'update_cycle': 10, 'update_iters': 2,
                  'batch_size': 32, 'size': 1000, 'start_learning_steps': 100},
    'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
    'model_cfgs': {'actor': {'hidden_sizes': [8, 8]}, 'critic': {'hidden_sizes': [8, 8]}},
}

CORE_OFF_POLICY = ['DDPG', 'SACLag']


def _train_off_policy(algo):
    cfg = {k: dict(v) for k, v in OFF_POLICY_TINY.items()}
    if algo.endswith(('Lag', 'PID')):
        cfg['algo_cfgs']['warmup_epochs'] = 0
    agent = omnisafe_tpu.Agent(algo, 'Test-v0', custom_cfgs=cfg)
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost) and np.isfinite(length)


@pytest.mark.parametrize('algo', CORE_OFF_POLICY)
def test_off_policy_core_smoke(algo):
    _train_off_policy(algo)


@pytest.mark.full
@pytest.mark.parametrize(
    'algo',
    [
        a
        for a in omnisafe_tpu.ALGORITHMS['off-policy']
        # CRABS requires a SafeEnv with barrier hooks; its full-matrix slot is
        # test_crabs_smoke below, on SafeInvertedPendulum-v2.
        if a not in CORE_OFF_POLICY and a != 'CRABS'
    ],
)
def test_off_policy_full_matrix(algo):
    _train_off_policy(algo)


MODEL_BASED_TINY = {
    'train_cfgs': {'total_steps': 500},
    'algo_cfgs': {'steps_per_epoch': 500, 'update_dynamics_cycle': 250,
                  'start_learning_steps': 250, 'action_repeat': 5},
    'dynamics_cfgs': {'batch_size': 32, 'hidden_size': 16},
    'planner_cfgs': {'num_samples': 20, 'num_elites': 8, 'num_particles': 5,
                     'plan_horizon': 4, 'num_iterations': 2},
    'evaluation_cfgs': {'use_eval': False},
    'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs',
                    'save_model_freq': 100},
}

CORE_MODEL_BASED = ['CCEPETS', 'SafeLOOP']


def _train_model_based(algo):
    cfg = {k: dict(v) for k, v in MODEL_BASED_TINY.items()}
    if 'LOOP' in algo:
        cfg['algo_cfgs'].update({'update_policy_cycle': 125, 'update_policy_iters': 2,
                                 'policy_batch_size': 32})
        cfg['model_cfgs'] = {'actor': {'hidden_sizes': [8, 8]},
                             'critic': {'hidden_sizes': [8, 8]}}
    agent = omnisafe_tpu.Agent(algo, 'SafetyPointGoal1-v0-modelbased', custom_cfgs=cfg)
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost)


@pytest.mark.parametrize('algo', CORE_MODEL_BASED)
def test_model_based_core_smoke(algo):
    _train_model_based(algo)


@pytest.mark.full
@pytest.mark.parametrize(
    'algo', [a for a in omnisafe_tpu.ALGORITHMS['model-based'] if a not in CORE_MODEL_BASED]
)
def test_model_based_full_matrix(algo):
    _train_model_based(algo)


@pytest.mark.full
def test_crabs_smoke():
    cfg = {
        'train_cfgs': {'total_steps': 400, 'vector_env_nums': 2, 'eval_episodes': 1},
        'algo_cfgs': {'steps_per_epoch': 200, 'update_cycle': 10, 'update_iters': 1,
                      'batch_size': 32, 'size': 1000, 'start_learning_steps': 100,
                      'num_candidates': 4},
        'dynamics_cfgs': {'hidden_size': 16, 'batch_size': 32, 'max_epoch': 2},
        'crabs_cfgs': {'pool_size': 32, 'cert_iters': 2, 'barrier_hidden_sizes': [8, 8]},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
        'model_cfgs': {'actor': {'hidden_sizes': [8, 8]}, 'critic': {'hidden_sizes': [8, 8]}},
    }
    agent = omnisafe_tpu.Agent('CRABS', 'SafeInvertedPendulum-v2', custom_cfgs=cfg)
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost)


@pytest.fixture(scope='module')
def offline_dataset(tmp_path_factory):
    from omnisafe_tpu.common.offline import OfflineDataCollector

    path = str(tmp_path_factory.mktemp('data') / 'testv0')
    return OfflineDataCollector('Test-v0', num_envs=8).collect(1000, path, seed=0)


def _offline_cfg(algo, dataset):
    cfg = {
        'train_cfgs': {'total_steps': 100, 'dataset': dataset, 'evaluate_epoisodes': 2},
        'algo_cfgs': {'steps_per_epoch': 50, 'batch_size': 64},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs',
                        'save_model_freq': 100},
    }
    if algo == 'VAEBC':
        cfg['model_cfgs'] = {'hidden_sizes': [16, 16]}
    elif algo == 'COptiDICE':
        cfg['model_cfgs'] = {'actor': {'hidden_sizes': [16, 16]},
                             'nu': {'hidden_sizes': [16, 16]},
                             'chi': {'hidden_sizes': [16, 16]}}
    else:
        cfg['model_cfgs'] = {'actor': {'hidden_sizes': [16, 16]},
                             'critic': {'hidden_sizes': [16, 16]}}
    return cfg


CORE_OFFLINE = ['BCQLag', 'COptiDICE']


@pytest.mark.parametrize('algo', CORE_OFFLINE)
def test_offline_core_smoke(algo, offline_dataset):
    agent = omnisafe_tpu.Agent(algo, 'Test-v0', custom_cfgs=_offline_cfg(algo, offline_dataset))
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost)


def test_offline_resume(offline_dataset, tmp_path):
    """Offline family resumes from the saved full-state checkpoint."""
    import glob as _glob
    import os as _os

    cfg = _offline_cfg('VAEBC', offline_dataset)
    cfg['logger_cfgs'] = {'use_tensorboard': False, 'log_dir': str(tmp_path),
                          'save_model_freq': 1}
    agent = omnisafe_tpu.Agent('VAEBC', 'Test-v0', custom_cfgs=cfg)
    agent.learn()
    run_dir = agent.agent._logger.log_dir
    ckpt = sorted(_glob.glob(_os.path.join(run_dir, 'save', '*.msgpack')))[0]

    agent2 = omnisafe_tpu.Agent('VAEBC', 'Test-v0', custom_cfgs=cfg)
    agent2.agent.restore(ckpt)
    ret, cost, length = agent2.learn()
    assert np.isfinite(ret) and np.isfinite(cost)


@pytest.mark.full
@pytest.mark.parametrize(
    'algo', [a for a in omnisafe_tpu.ALGORITHMS['offline'] if a not in CORE_OFFLINE]
)
def test_offline_full_matrix(algo, offline_dataset):
    agent = omnisafe_tpu.Agent(algo, 'Test-v0', custom_cfgs=_offline_cfg(algo, offline_dataset))
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost)


def test_multi_device_data_parallel():
    """The dp path: shard_map over a 4-device CPU mesh
    (reference analogue: tests/test_utils.py:91-92 torchrun relaunch)."""
    cfg = {
        'train_cfgs': {'total_steps': 512, 'vector_env_nums': 2, 'num_devices': 4},
        'algo_cfgs': {'steps_per_epoch': 256, 'update_iters': 2, 'batch_size': 32},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
        'model_cfgs': TINY['model_cfgs'],
    }
    agent = omnisafe_tpu.Agent('PPOLag', 'Test-v0', custom_cfgs=cfg)
    ret, cost, length = agent.learn()
    assert np.isfinite(ret) and np.isfinite(cost)


@pytest.mark.full
def test_constrained_learning_acceptance():
    """Full-stack acceptance: a Lagrangian learner on physics-exact MuJoCo
    must drive episode cost toward the limit while keeping reward high
    (VERDICT r1 #5; reference analogue: the full-stack training tests,
    reference tests/test_policy.py:404-437).  ~10 min on 2 CPUs.

    Thresholds are lenient vs the observed parity trajectory (ret 2563 /
    cost 32 at 2e6 steps, vs reference final 2946±306 / 3.4) so seed noise
    does not flake the gate, while env-geometry or Lagrangian regressions
    (cost stuck at ~1000, reward collapse) still fail loudly.
    """
    pytest.importorskip('mujoco')
    import csv
    import glob as _glob

    agent = omnisafe_tpu.Agent('PPOLag', 'SafetyHalfCheetahVelocity-v1-mujoco', custom_cfgs={
        'seed': 0,
        'train_cfgs': {'total_steps': 2_000_000, 'vector_env_nums': 16},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_accept'},
    })
    agent.learn()
    run_dir = agent.agent._logger.log_dir
    with open(_glob.glob(os.path.join(run_dir, 'progress.csv'))[0]) as f:
        rows = list(csv.DictReader(f))
    tail = rows[-5:]
    final_ret = np.mean([float(r['Metrics/EpRet']) for r in tail])
    final_cost = np.mean([float(r['Metrics/EpCost']) for r in tail])
    peak_cost = max(float(r['Metrics/EpCost']) for r in rows)
    assert final_ret > 1500.0, f'reward did not learn: {final_ret}'
    assert final_cost < 80.0, f'cost not driven toward the 25 limit: {final_cost}'
    assert final_cost < 0.5 * peak_cost, (
        f'Lagrangian never engaged: final {final_cost} vs peak {peak_cost}'
    )


def test_cpo_multi_device_matches_single_device():
    """The trust-region family's collective placement (pmean inside the FVP/CG
    solve, the vmapped line search, and advantage standardization — reference:
    natural_pg.py:112, cpo.py:140-143) must make an N-device CPO update equal
    a 1-device update on identical data."""
    import jax
    import jax.numpy as jnp

    from omnisafe_tpu.parallel.onpolicy import make_distributed_programs, make_mesh

    def build(num_devices, vector_env_nums):
        cfg = {
            'seed': 7,
            'train_cfgs': {'total_steps': 256, 'vector_env_nums': vector_env_nums,
                           'num_devices': num_devices},
            'algo_cfgs': {'steps_per_epoch': 256, 'update_iters': 2, 'batch_size': 256},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
            'model_cfgs': TINY['model_cfgs'],
        }
        return omnisafe_tpu.Agent('CPO', 'Test-v0', custom_cfgs=cfg).agent

    a1 = build(1, 4)
    a4 = build(4, 1)
    state1 = a1._init_train_state()
    state4 = a4._init_train_state()
    # identical seeds -> identical initial params
    for l1, l4 in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state4.params)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l4))

    # one batch collected single-device, fed to both update programs
    state1, batch, _, _ = jax.jit(a1._rollout_program)(state1)
    Jc, lr = jnp.asarray(30.0), jnp.asarray(1e-3)
    new1, m1 = jax.jit(a1._update_program)(state1, batch, Jc, lr)

    mesh = make_mesh(4)
    _, update4 = make_distributed_programs(a4, mesh, state4)
    state4 = state4.replace(params=state1.params, key=state1.key)
    new4, m4 = update4(state4, batch, Jc, lr)

    for l1, l4 in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new4.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l4), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(m1['Train/KL']), float(m4['Train/KL']),
                               rtol=1e-3, atol=1e-6)


def test_learning_direction():
    """On Test-v0 reward grows with act[0]; PPO must exploit it."""
    ret, _, _ = _train(
        'PPO',
        {
            'train_cfgs': {'total_steps': 4096},
            'algo_cfgs': {'update_iters': 8},
            'model_cfgs': {'actor': {'hidden_sizes': [8, 8], 'lr': 0.01}},
        },
    )
    # random policy averages ~0 reward/step over 10-step episodes
    assert ret > 2.0


def test_checkpoint_artifacts(tmp_path):
    cfg = {k: dict(v) for k, v in TINY.items()}
    cfg['logger_cfgs'] = {'use_tensorboard': False, 'log_dir': str(tmp_path),
                          'save_model_freq': 1}
    agent = omnisafe_tpu.Agent('PPO', 'Test-v0', custom_cfgs=cfg)
    agent.learn()
    run_dir = next((tmp_path / 'Test-v0---PPO').iterdir())
    assert (run_dir / 'config.json').exists()
    assert (run_dir / 'progress.csv').exists()
    assert list((run_dir / 'save').glob('*.msgpack'))


def test_cost_limit_hit_rate_logged(tmp_path):
    """BASELINE target: cost-limit hit rate tracked per config — constrained
    algorithms log Metrics/CostLimitHitRate in [0, 1]; unconstrained ones
    don't register the key."""
    import csv

    cfg = {k: dict(v) for k, v in TINY.items()}
    cfg['logger_cfgs'] = {'use_tensorboard': False, 'log_dir': str(tmp_path)}
    agent = omnisafe_tpu.Agent('PPOLag', 'Test-v0', custom_cfgs=cfg)
    agent.learn()
    run_dir = agent.agent._logger.log_dir
    with open(os.path.join(run_dir, 'progress.csv'), encoding='utf-8') as handle:
        rows = list(csv.DictReader(handle))
    assert rows, 'no epochs logged'
    vals = [float(r['Metrics/CostLimitHitRate']) for r in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)

    plain = omnisafe_tpu.Agent('PPO', 'Test-v0', custom_cfgs=cfg)
    assert 'Metrics/CostLimitHitRate' not in plain.agent._logger._data


def test_offpolicy_multi_device_sharded_ring():
    """Off-policy dp: env streams + the replay ring shard over the mesh
    (parallel/offpolicy.py); params must remain REPLICATED after an epoch of
    per-device replay sampling because every gradient (incl. SAC's alpha) is
    pmean'd before the apply.  The reference cannot run off-policy in
    parallel at all (asserts parallel==1, reference: utils/config.py:288-291)."""
    import jax
    import jax.numpy as jnp

    from omnisafe_tpu.parallel.offpolicy import make_distributed_epoch, make_mesh

    cfg = {
        'seed': 3,
        'train_cfgs': {'total_steps': 128, 'vector_env_nums': 2,
                       'num_devices': 4, 'eval_episodes': 0},
        'algo_cfgs': {'steps_per_epoch': 32, 'update_cycle': 8,
                      'update_iters': 2, 'batch_size': 16, 'size': 64,
                      'start_learning_steps': 8, 'warmup_epochs': 0,
                      'auto_alpha': True},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
        'model_cfgs': {'actor': {'hidden_sizes': [8, 8]},
                       'critic': {'hidden_sizes': [8, 8]}},
    }
    algo = omnisafe_tpu.Agent('SACLag', 'Test-v0', custom_cfgs=cfg).agent
    state = algo._init_train_state()
    mesh = make_mesh(4)
    epoch = make_distributed_epoch(algo, mesh, state)
    for _ in range(2):
        state, ep_metrics, metrics = epoch(
            state, jnp.asarray(30.0), jnp.asarray(3e-4), jnp.asarray(True)
        )
    assert np.isfinite(float(metrics['Loss/Loss_pi']))
    # ring advanced and stayed device-sharded over the env axis
    assert int(state.buffer.size) == 64
    obs_field = state.buffer.data['obs']
    assert obs_field.shape[:2] == (64, 8)  # capacity x global envs
    # params replicated: every device's replica identical
    for leaf in jax.tree.leaves(state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for shard in shards[1:]:
            np.testing.assert_array_equal(shards[0], shard)
    # lambda moved (warmup passed, Jc 30 > limit 25) and is replicated
    assert float(state.extra.multiplier) > 0.0


def test_offline_dp_epoch_keeps_params_replicated(tmp_path):
    """Offline dp epoch (parallel/offline.py): per-device batch streams with
    pmean'd gradients must keep parameters in lockstep across the mesh (the
    reference's offline trainers have no distributed path at all —
    offline/base.py:95-150)."""
    import jax
    import numpy as np_

    from omnisafe_tpu.parallel.offline import make_distributed_epoch, make_mesh

    env = omnisafe_tpu.envs.make('Test-v0')
    obs_dim = env.observation_space.shape[0]
    act_dim = env.action_space.shape[0]
    rng = np_.random.default_rng(0)
    n = 128
    dataset = str(tmp_path / 'ds.npz')
    np_.savez(dataset,
              obs=rng.normal(size=(n, obs_dim)).astype(np_.float32),
              action=rng.uniform(-1, 1, size=(n, act_dim)).astype(np_.float32),
              reward=rng.normal(size=(n,)).astype(np_.float32),
              cost=(rng.uniform(size=(n,)) < 0.2).astype(np_.float32),
              next_obs=rng.normal(size=(n, obs_dim)).astype(np_.float32),
              done=np_.zeros((n,), np_.float32))
    algo = omnisafe_tpu.Agent('VAEBC', 'Test-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 4, 'dataset': dataset},
        'algo_cfgs': {'steps_per_epoch': 2, 'batch_size': 8},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_test_runs'},
    }).agent
    state = algo._init_state()
    epoch = make_distributed_epoch(algo, make_mesh(4), steps_per_epoch=2)
    state, metrics = epoch(state, jax.random.key(0))
    assert np_.isfinite(float(metrics['Loss/Loss_vae']))
    for leaf in jax.tree.leaves(state.vae):
        shards = [np_.asarray(s.data) for s in leaf.addressable_shards]
        for shard in shards[1:]:
            np_.testing.assert_array_equal(shards[0], shard)
