"""Train a single safe-RL policy (reference analogue: examples/train_policy.py)."""

import argparse

import omnisafe_tpu

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--algo', default='PPOLag')
    parser.add_argument('--env-id', default='SafetyPointGoal1-v0')
    parser.add_argument('--total-steps', type=int, default=1_000_000)
    parser.add_argument('--vector-env-nums', type=int, default=16)
    args = parser.parse_args()

    agent = omnisafe_tpu.Agent(
        args.algo,
        args.env_id,
        custom_cfgs={
            'train_cfgs': {
                'total_steps': args.total_steps,
                'vector_env_nums': args.vector_env_nums,
            },
        },
    )
    ret, cost, length = agent.learn()
    print(f'reward={ret:.2f} cost={cost:.2f} len={length:.1f}')
