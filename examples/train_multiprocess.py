"""Multi-process (multi-host) data-parallel training.

The torchrun-equivalent launch path (reference:
omnisafe/utils/distributed.py:83-139 under `train_cfgs.parallel`): setting
``parallel: N`` makes the parent re-launch this script as N coordinated
processes; each joins one JAX runtime via ``jax.distributed.initialize``
and runs the same shard_map data-parallel programs over the cross-process
global mesh (omnisafe_tpu/parallel/launch.py).

On a single machine this runs N local processes over gloo; on a real
multi-host TPU slice the same code path spans hosts, with the dp
collectives riding ICI/DCN.  ``num_devices`` is the GLOBAL mesh size
(processes x local devices); ``vector_env_nums`` is per-device.

Run:  python examples/train_multiprocess.py
"""

import os
import sys

# single-machine demo: one virtual CPU device per process
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import omnisafe_tpu  # noqa: E402

if __name__ == '__main__':
    agent = omnisafe_tpu.Agent('PPOLag', 'SafetyAntVelocity-v1', custom_cfgs={
        'train_cfgs': {
            'total_steps': 65536,
            'vector_env_nums': 8,   # per device
            'parallel': 2,          # processes (the fork happens here)
            'num_devices': 2,       # global mesh size
        },
        'algo_cfgs': {'steps_per_epoch': 16384},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': './runs_mp'},
    })
    print(agent.learn())
