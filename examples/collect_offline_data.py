"""Collect an offline dataset and train BCQLag on it
(reference analogue: examples/collect_offline_data.py)."""

import omnisafe_tpu
from omnisafe_tpu.common.offline import OfflineDataCollector

if __name__ == '__main__':
    path = OfflineDataCollector('SafetyPointCircle1-v0', num_envs=16).collect(
        200_000, './SafetyPointCircle1-v0_random'
    )
    print(f'collected {path}')

    agent = omnisafe_tpu.Agent(
        'BCQLag',
        'SafetyPointCircle1-v0',
        custom_cfgs={'train_cfgs': {'total_steps': 100_000, 'dataset': path}},
    )
    print(agent.learn())
