#!/usr/bin/env python
"""Measure the torch reference's PPO throughput on this host (the baseline for bench.py).

Runs the actual reference package at /root/reference on its own synthetic
``Test-v0`` env (reference: tests/simple_env.py) with render/offline/cloud
deps mocked out, since only core training matters for throughput.

Measured on this image (CPU, torch 8 threads, steps_per_epoch=2048,
update_iters=40, batch_size=64): ~168 env-steps/s end-to-end.
"""

import sys
import time
import types
from unittest.mock import MagicMock


def main() -> float:
    sv = types.ModuleType('gymnasium.utils.save_video')
    sv.save_video = lambda *a, **k: None
    import gymnasium  # noqa: F401

    sys.modules['gymnasium.utils.save_video'] = sv
    for mod in [
        'safety_gymnasium', 'safety_gymnasium.vector', 'wandb',
        'pytorch_lightning', 'pytorch_lightning.loggers', 'gdown',
        'moviepy', 'moviepy.editor',
    ]:
        sys.modules[mod] = MagicMock()
    sys.path.insert(0, '/root/reference')
    sys.path.insert(0, '/root/reference/tests')
    import omnisafe
    import simple_env  # noqa: F401  (registers Test-v0)

    total_steps = 4096
    agent = omnisafe.Agent(
        'PPO',
        'Test-v0',
        custom_cfgs={
            'train_cfgs': {'total_steps': total_steps, 'vector_env_nums': 1, 'torch_threads': 8},
            'algo_cfgs': {'steps_per_epoch': 2048, 'update_iters': 40, 'batch_size': 64},
            'logger_cfgs': {'use_tensorboard': False, 'use_wandb': False, 'log_dir': '/tmp/ref_runs'},
        },
    )
    t0 = time.time()
    agent.learn()
    steps_per_sec = total_steps / (time.time() - t0)
    print(f'torch reference PPO: {steps_per_sec:.0f} env-steps/s')
    return steps_per_sec


if __name__ == '__main__':
    main()
