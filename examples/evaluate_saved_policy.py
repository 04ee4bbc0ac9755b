"""Evaluate + render a saved run (reference analogue: examples/evaluate_saved_policy.py)."""

import argparse

import omnisafe_tpu

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('run_dir', help='runs/<env>---<algo>/seed-... directory')
    parser.add_argument('--episodes', type=int, default=10)
    parser.add_argument('--render', action='store_true')
    args = parser.parse_args()

    evaluator = omnisafe_tpu.Evaluator()
    evaluator.load_saved(args.run_dir)
    evaluator.evaluate(num_episodes=args.episodes)
    if args.render:
        evaluator.render(num_episodes=1, save_replay_path=args.run_dir)
