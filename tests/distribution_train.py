"""Two-process distributed training smoke, launched by tests/test_distributed.py.

Mirror of the reference's distributed test entry (reference:
tests/distribution_train.py — NaturalPG on Test-v0 under torchrun with two
gloo ranks): each process owns one virtual CPU device, joins the JAX
runtime through ``parallel/launch.py``, and trains PPOLag over the
2-device cross-process mesh.  Rank 0 writes a result file the parent test
asserts on.
"""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')

import jax

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnisafe_tpu.parallel.launch import fork, maybe_initialize  # noqa: E402


def main() -> int:
    out_path = sys.argv[1]
    fork(2)  # parent exits in here; children fall through
    assert maybe_initialize(), 'expected to run as a coordinated child'
    assert jax.process_count() == 2 and jax.device_count() == 2

    import omnisafe_tpu  # pylint: disable=import-outside-toplevel

    agent = omnisafe_tpu.Agent('PPOLag', 'Test-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 512, 'vector_env_nums': 2, 'num_devices': 2},
        'algo_cfgs': {'steps_per_epoch': 256, 'update_iters': 2, 'batch_size': 64},
        'logger_cfgs': {'use_tensorboard': False, 'save_model_freq': 1,
                        'log_dir': os.path.join(os.path.dirname(out_path), 'runs')},
        'model_cfgs': {'actor': {'hidden_sizes': [8, 8]},
                       'critic': {'hidden_sizes': [8, 8]}},
    })
    ret, cost, length = agent.learn()
    if jax.process_index() == 0:
        with open(out_path, 'w', encoding='utf-8') as handle:
            json.dump({'ret': float(ret), 'cost': float(cost),
                       'len': float(length),
                       'log_dir': agent.agent.logger.log_dir}, handle)
    return 0


if __name__ == '__main__':
    sys.exit(main())
