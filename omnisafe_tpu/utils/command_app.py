"""Command-line interface: train / benchmark / eval / train-config / analyze-grid.

Counterpart of the reference's typer CLI (reference:
omnisafe/utils/command_app.py:39-454), on argparse (typer is not in this
image).  Invoke as ``python -m omnisafe_tpu <command> ...``.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict, List

import yaml


def custom_cfgs_to_dict(pairs: List[str]) -> Dict[str, Any]:
    """Parse repeated ``key:value`` pairs with ':'-nesting
    (reference: utils/tools.py:157-192, command_app.py:87-141)."""
    out: Dict[str, Any] = {}
    for pair in pairs:
        key, _, raw = pair.partition('=')
        if not raw:
            raise ValueError(f'expected key=value, got {pair!r}')
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = out
        parts = key.split(':')
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def cmd_train(args: argparse.Namespace) -> None:
    """(reference: command_app.py:39-163)."""
    import omnisafe_tpu  # pylint: disable=import-outside-toplevel

    custom = custom_cfgs_to_dict(args.custom_cfgs or [])
    if args.total_steps is not None:
        custom.setdefault('train_cfgs', {})['total_steps'] = args.total_steps
    if args.vector_env_nums is not None:
        custom.setdefault('train_cfgs', {})['vector_env_nums'] = args.vector_env_nums
    if args.log_dir is not None:
        custom.setdefault('logger_cfgs', {})['log_dir'] = args.log_dir
    agent = omnisafe_tpu.Agent(args.algo, args.env_id, custom_cfgs=custom)
    ret, cost, length = agent.learn()
    print(f'final: reward={ret:.3f} cost={cost:.3f} len={length:.1f}')


def cmd_benchmark(args: argparse.Namespace) -> None:
    """(reference: command_app.py:165-261)."""
    from omnisafe_tpu.common.experiment_grid import ExperimentGrid  # pylint: disable=import-outside-toplevel

    with open(args.config, encoding='utf-8') as f:
        grid_cfg = yaml.safe_load(f)
    grid = ExperimentGrid(exp_name=args.exp_name)
    for key, vals in grid_cfg.items():
        grid.add(key, vals)
    results = grid.run(num_pool=args.num_pool, exp_dir=args.log_dir)
    for name, res in results.items():
        status = res['error'] or res['result']
        print(f'{name}: {status}')


def cmd_eval(args: argparse.Namespace) -> None:
    """(reference: command_app.py:262-335)."""
    from omnisafe_tpu.evaluator import Evaluator  # pylint: disable=import-outside-toplevel

    evaluator = Evaluator()
    evaluator.load_saved(args.result_dir)
    evaluator.evaluate(num_episodes=args.num_episode)
    if args.render:
        evaluator.render(num_episodes=1, save_replay_path=args.result_dir)


def cmd_train_config(args: argparse.Namespace) -> None:
    """(reference: command_app.py:336-402)."""
    import omnisafe_tpu  # pylint: disable=import-outside-toplevel

    with open(args.config, encoding='utf-8') as f:
        cfg = yaml.safe_load(f)
    algo = cfg.pop('algo')
    env_id = cfg.pop('env_id')
    agent = omnisafe_tpu.Agent(algo, env_id, custom_cfgs=cfg)
    ret, cost, length = agent.learn()
    print(f'final: reward={ret:.3f} cost={cost:.3f} len={length:.1f}')


def cmd_analyze_grid(args: argparse.Namespace) -> None:
    """(reference: command_app.py:403-454)."""
    from omnisafe_tpu.common.statistics_tools import StatisticsTools  # pylint: disable=import-outside-toplevel

    tools = StatisticsTools()
    tools.load_source(args.path)
    out = tools.draw_graph(parameter=args.parameter, costs=True)
    print(f'saved comparison to {out}')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='omnisafe_tpu', description='TPU-native safe-RL framework CLI'
    )
    sub = parser.add_subparsers(dest='command', required=True)

    p = sub.add_parser('train', help='train a single algorithm')
    p.add_argument('--algo', required=True)
    p.add_argument('--env-id', required=True)
    p.add_argument('--total-steps', type=int, default=None)
    p.add_argument('--vector-env-nums', type=int, default=None)
    p.add_argument('--log-dir', default=None)
    p.add_argument('--custom-cfgs', nargs='*', help='key=value (":"-nested keys)')
    p.set_defaults(func=cmd_train)

    p = sub.add_parser('benchmark', help='run an experiment grid from YAML')
    p.add_argument('exp_name')
    p.add_argument('num_pool', type=int)
    p.add_argument('config')
    p.add_argument('--log-dir', default=None)
    p.set_defaults(func=cmd_benchmark)

    p = sub.add_parser('eval', help='evaluate a saved run directory')
    p.add_argument('result_dir')
    p.add_argument('--num-episode', type=int, default=10)
    p.add_argument('--render', action='store_true')
    p.set_defaults(func=cmd_eval)

    p = sub.add_parser('train-config', help='train from a YAML config file')
    p.add_argument('config')
    p.set_defaults(func=cmd_train_config)

    p = sub.add_parser('analyze-grid', help='compare grid results on one parameter')
    p.add_argument('path')
    p.add_argument('--parameter', required=True)
    p.set_defaults(func=cmd_analyze_grid)
    return parser


def main(argv: List[str] | None = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.func(args)


if __name__ == '__main__':
    main()
