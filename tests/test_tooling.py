"""Experiment tooling tests: Evaluator, CLI, ExperimentGrid, StatisticsTools,
Plotter, resume (reference analogue: tests/test_cli.py:27-130,
tests/test_statistics_tools.py:22-36)."""

import csv
import glob
import os

import numpy as np
import pytest

import omnisafe_tpu
from omnisafe_tpu.common.experiment_grid import ExperimentGrid
from omnisafe_tpu.common.statistics_tools import StatisticsTools
from omnisafe_tpu.utils.command_app import custom_cfgs_to_dict, main
from omnisafe_tpu.utils.plotter import Plotter

TINY_ARGS = [
    '--total-steps', '512', '--vector-env-nums', '4',
    '--custom-cfgs',
    'algo_cfgs:steps_per_epoch=256', 'algo_cfgs:update_iters=2',
    'algo_cfgs:batch_size=64', 'logger_cfgs:use_tensorboard=false',
    'model_cfgs:actor:hidden_sizes=[8,8]', 'model_cfgs:critic:hidden_sizes=[8,8]',
]


def test_custom_cfgs_parsing():
    out = custom_cfgs_to_dict(['algo_cfgs:gamma=0.9', 'train_cfgs:total_steps=100',
                               'model_cfgs:actor:hidden_sizes=[8,8]'])
    assert out['algo_cfgs']['gamma'] == 0.9
    assert out['train_cfgs']['total_steps'] == 100
    assert out['model_cfgs']['actor']['hidden_sizes'] == [8, 8]


@pytest.fixture(scope='module')
def trained_run(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp('cli_run'))
    main(['train', '--algo', 'PPO', '--env-id', 'SafetyPointGoal1-v0',
          '--log-dir', log_dir, *TINY_ARGS])
    run_dir = glob.glob(os.path.join(log_dir, 'SafetyPointGoal1-v0---PPO', 'seed-*'))[0]
    return run_dir


def test_cli_train_and_evaluator(trained_run):
    evaluator = omnisafe_tpu.Evaluator()
    evaluator.load_saved(trained_run)
    ret, cost, length = evaluator.evaluate(num_episodes=2)
    assert np.isfinite(ret) and np.isfinite(cost) and length > 0


def test_evaluator_render(trained_run, tmp_path):
    evaluator = omnisafe_tpu.Evaluator()
    evaluator.load_saved(trained_run)
    evaluator.render(num_episodes=1, save_replay_path=str(tmp_path), stride=40)
    assert (tmp_path / 'episode-0.png').exists()
    # animated replay (reference: evaluator.py:511-629 records video)
    gif = tmp_path / 'episode-0.gif'
    assert gif.exists() and gif.stat().st_size > 1000
    from PIL import Image
    with Image.open(gif) as im:
        assert getattr(im, 'n_frames', 1) > 3


def test_resume_from_checkpoint(trained_run):
    ckpt = glob.glob(os.path.join(trained_run, 'save', '*.msgpack'))[0]
    agent = omnisafe_tpu.Agent('PPO', 'SafetyPointGoal1-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 256, 'vector_env_nums': 4},
        'algo_cfgs': {'steps_per_epoch': 256, 'update_iters': 1, 'batch_size': 64},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_resume'},
        'model_cfgs': {'actor': {'hidden_sizes': [8, 8]}, 'critic': {'hidden_sizes': [8, 8]}},
    })
    agent.agent.restore(ckpt)
    ret, cost, length = agent.learn()
    assert np.isfinite(ret)


def test_experiment_grid_and_tools(tmp_path):
    grid = ExperimentGrid('grid_test')
    grid.add('algo', ['PPO'])
    grid.add('env_id', ['Test-v0'])
    grid.add('algo_cfgs:update_iters', [1, 2])
    grid.add('train_cfgs:total_steps', [256])
    grid.add('train_cfgs:vector_env_nums', [4])
    grid.add('algo_cfgs:steps_per_epoch', [256])
    grid.add('algo_cfgs:batch_size', [64])
    grid.add('logger_cfgs:use_tensorboard', [False])
    results = grid.run(num_pool=1, exp_dir=str(tmp_path))
    assert len(results) == 2
    assert all(r['error'] is None for r in results.values())

    analyzed = ExperimentGrid.analyze(str(tmp_path))
    assert len(analyzed) == 2

    tools = StatisticsTools()
    tools.load_source(str(tmp_path))
    out = tools.draw_graph(parameter='algo_cfgs:update_iters')
    assert os.path.exists(out)

    plot = Plotter().make_plots(
        [str(tmp_path)], value='Metrics/EpRet', cost_limit=25.0,
        save_name=str(tmp_path / 'curves.png'),
    )
    assert os.path.exists(plot)


def test_profiler_trace_and_verbose_table(tmp_path, capsys):
    """use_profiler captures a jax trace of epochs 2-3 into the run dir;
    verbose renders the per-epoch table (SURVEY §5 observability)."""
    agent = omnisafe_tpu.Agent('PPO', 'Test-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 1024, 'vector_env_nums': 4},
        'algo_cfgs': {'steps_per_epoch': 256, 'update_iters': 1, 'batch_size': 64},
        'model_cfgs': {'actor': {'hidden_sizes': [8, 8]},
                       'critic': {'hidden_sizes': [8, 8]}},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': str(tmp_path),
                        'verbose': True, 'use_profiler': True},
    })
    agent.learn()
    run_dir = agent.agent._logger.log_dir
    profile_dir = os.path.join(run_dir, 'profile')
    assert os.path.isdir(profile_dir) and any(os.scandir(profile_dir))
    out = capsys.readouterr().out
    assert 'Metrics/EpRet' in out  # the rendered table reached the console


def test_experiment_grid_refuses_overwrite(tmp_path):
    """An exp dir holding a DIFFERENT grid is refused
    (reference: experiment_grid.py:419-427)."""
    grid = ExperimentGrid('g1')
    grid.add('algo', ['PPO']).add('env_id', ['Test-v0'])
    grid.add('train_cfgs:total_steps', [256])
    grid.add('train_cfgs:vector_env_nums', [4])
    grid.add('algo_cfgs:steps_per_epoch', [256])
    grid.add('logger_cfgs:use_tensorboard', [False])
    grid.run(num_pool=1, exp_dir=str(tmp_path))

    other = ExperimentGrid('g2')
    other.add('algo', ['PPO']).add('env_id', ['Test-v0'])
    other.add('train_cfgs:total_steps', [512])
    with pytest.raises(FileExistsError):
        other.run(num_pool=1, exp_dir=str(tmp_path))


def test_experiment_grid_resume(tmp_path):
    """Interrupted sweeps resume: completed variants are skipped, failed ones
    re-run (reference analogue: resumable bookkeeping, experiment_grid.py:387-473)."""
    calls = []

    def flaky_train(algo, env_id, custom):
        n = custom['algo_cfgs']['update_iters']
        calls.append(n)
        if n == 2:
            raise RuntimeError('simulated crash')
        return (0.0, 0.0, 0.0)

    def grid():
        g = ExperimentGrid('resume_test')
        g.add('algo', ['PPO']).add('env_id', ['Test-v0'])
        g.add('algo_cfgs:update_iters', [1, 2])
        return g

    results = grid().run(train_fn=flaky_train, num_pool=1, exp_dir=str(tmp_path))
    assert sorted(calls) == [1, 2]
    errors = [r['error'] for r in results.values()]
    assert sum(e is None for e in errors) == 1 and sum(e is not None for e in errors) == 1

    # second pass: identical grid resumes — only the failed variant re-runs
    calls.clear()

    def fixed_train(algo, env_id, custom):
        calls.append(custom['algo_cfgs']['update_iters'])
        return (1.0, 0.0, 0.0)

    results = grid().run(train_fn=fixed_train, num_pool=1, exp_dir=str(tmp_path))
    assert calls == [2]
    assert all(r['error'] is None for r in results.values())


def test_experiment_grid_posthoc_evaluate(tmp_path):
    grid = ExperimentGrid('posthoc')
    grid.add('algo', ['PPO']).add('env_id', ['Test-v0'])
    grid.add('train_cfgs:total_steps', [256])
    grid.add('train_cfgs:vector_env_nums', [4])
    grid.add('algo_cfgs:steps_per_epoch', [256])
    grid.add('algo_cfgs:update_iters', [1])
    grid.add('algo_cfgs:batch_size', [64])
    grid.add('logger_cfgs:use_tensorboard', [False])
    grid.add('logger_cfgs:save_model_freq', [1])
    grid.run(num_pool=1, exp_dir=str(tmp_path))
    out = ExperimentGrid.evaluate(str(tmp_path), num_episodes=1)
    assert len(out) == 1
    for entry in out.values():
        assert np.isfinite(entry['reward']) and np.isfinite(entry['cost'])
    assert os.path.exists(tmp_path / 'evaluation.json')


def test_statistics_tools_two_parameters(tmp_path):
    """Two swept parameters analyzed through the grid-config-driven draw path
    (reference: statistics_tools.py:54-170)."""
    grid = ExperimentGrid('two_param')
    grid.add('algo', ['PPO']).add('env_id', ['Test-v0'])
    grid.add('algo_cfgs:update_iters', [1, 2])
    grid.add('algo_cfgs:gamma', [0.9, 0.99])
    grid.add('train_cfgs:total_steps', [256])
    grid.add('train_cfgs:vector_env_nums', [4])
    grid.add('algo_cfgs:steps_per_epoch', [256])
    grid.add('algo_cfgs:batch_size', [64])
    grid.add('logger_cfgs:use_tensorboard', [False])
    results = grid.run(num_pool=1, exp_dir=str(tmp_path))
    assert len(results) == 4

    tools = StatisticsTools()
    tools.load_source(str(tmp_path))
    paths = tools.draw_all(cost_limit=25.0, smooth=2)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    # value filtering and compare_num
    p = tools.draw_graph(parameter='algo_cfgs:gamma', values=[0.9],
                         save_name='gamma_09.png')
    assert os.path.exists(p)
    p = tools.draw_graph(parameter='algo_cfgs:update_iters', compare_num=1,
                         save_name='iters_top1.png')
    assert os.path.exists(p)
    with pytest.raises(AssertionError):
        tools.draw_graph(parameter='algo_cfgs:gamma', values=[0.9], compare_num=1)


@pytest.mark.parametrize(
    ('algo', 'env_id', 'cfgs'),
    [
        (
            'SACLag',
            'Test-v0',
            {
                'train_cfgs': {'total_steps': 128, 'vector_env_nums': 1},
                'algo_cfgs': {'steps_per_epoch': 64, 'update_cycle': 16,
                              'update_iters': 1, 'batch_size': 16, 'size': 512,
                              'start_learning_steps': 8, 'warmup_epochs': 0},
                'model_cfgs': {'actor': {'hidden_sizes': [8, 8]},
                               'critic': {'hidden_sizes': [8, 8]}},
            },
        ),
        (
            'PETS',
            'SafetyPointGoal1-v0-modelbased',
            {
                'train_cfgs': {'total_steps': 40, 'vector_env_nums': 1},
                'algo_cfgs': {'steps_per_epoch': 20, 'update_dynamics_cycle': 10,
                              'start_learning_steps': 5, 'action_repeat': 1},
                'dynamics_cfgs': {'num_ensemble': 2, 'elite_size': 1,
                                  'hidden_size': 8, 'max_epoch': 1},
                'planner_cfgs': {'plan_horizon': 3, 'num_particles': 2,
                                 'num_samples': 10, 'num_elites': 3,
                                 'num_iterations': 1},
                'evaluation_cfgs': {'use_eval': False},
            },
        ),
    ],
)
def test_resume_off_policy_and_model_based(algo, env_id, cfgs, tmp_path):
    """Mid-training resume for the off-policy and model-based families:
    model/optimizer/multiplier state restores; buffers restart fresh."""
    base = {'logger_cfgs': {'use_tensorboard': False, 'log_dir': str(tmp_path),
                            'save_model_freq': 1}}
    cfgs = {**cfgs, **base}
    agent = omnisafe_tpu.Agent(algo, env_id, custom_cfgs=cfgs)
    agent.learn()
    run_dir = agent.agent._logger.log_dir
    ckpt = sorted(glob.glob(os.path.join(run_dir, 'save', '*.msgpack')))[0]

    agent2 = omnisafe_tpu.Agent(algo, env_id, custom_cfgs=cfgs)
    agent2.agent.restore(ckpt)
    ret, cost, length = agent2.learn()
    assert np.isfinite(ret) and np.isfinite(cost)

    # restored params must equal the checkpointed ones at init
    from omnisafe_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt)
    assert 'resume' in payload

    if hasattr(agent2.agent, '_jc_window'):
        # λ's host-side episode-cost window is checkpointed and restored, so
        # a resumed Lagrangian run does not transiently see Jc=0
        saved_window = np.asarray((payload.get('host') or {})['jc_window'],
                                  np.float64).reshape(-1)
        agent3 = omnisafe_tpu.Agent(algo, env_id, custom_cfgs=cfgs)
        agent3.agent.restore(ckpt)
        agent3.agent._init_train_state()
        assert list(agent3.agent._jc_window) == saved_window.tolist()


def test_plotter_seed_bands(tmp_path):
    """Multi-seed conditions aggregate into mean ± std bands (reference:
    omnisafe/utils/plotter.py:31-389 — seaborn mean/std aggregation)."""
    rng = np.random.default_rng(0)
    cond = tmp_path / 'PPOLag-Test'
    for seed in range(3):
        run = cond / f'seed-{seed:03d}'
        run.mkdir(parents=True)
        with open(run / 'progress.csv', 'w', newline='', encoding='utf-8') as f:
            writer = csv.DictWriter(
                f, fieldnames=['TotalEnvSteps', 'Metrics/EpRet', 'Metrics/EpCost'])
            writer.writeheader()
            for i in range(50):
                writer.writerow({
                    'TotalEnvSteps': 20 * (i + 1),
                    'Metrics/EpRet': i + rng.normal(scale=2.0),
                    'Metrics/EpCost': 30.0 - 0.1 * i + rng.normal(),
                })
    out = Plotter().make_plots(
        [str(cond)], legend=['PPOLag'], cost_limit=25.0, smooth=3,
        save_name=str(tmp_path / 'bands.png'),
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0
