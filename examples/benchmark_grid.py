"""Run a hyperparameter grid and analyze it
(reference analogue: examples/benchmarks + examples/analyze_experiment_results.py)."""

from omnisafe_tpu.common.experiment_grid import ExperimentGrid
from omnisafe_tpu.common.statistics_tools import StatisticsTools

if __name__ == '__main__':
    grid = ExperimentGrid('lagrange_sweep')
    grid.add('algo', ['PPOLag', 'TRPOLag'])
    grid.add('env_id', ['SafetyPointGoal1-v0'])
    grid.add('lagrange_cfgs:lambda_lr', [0.035, 0.01])
    grid.add('train_cfgs:total_steps', [200_000])
    grid.add('train_cfgs:vector_env_nums', [16])
    results = grid.run(num_pool=1, exp_dir='./runs/lagrange_sweep')
    print(results)

    tools = StatisticsTools()
    tools.load_source('./runs/lagrange_sweep')
    tools.draw_graph(parameter='lagrange_cfgs:lambda_lr')
