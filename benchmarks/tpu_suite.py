"""TPU measurement suite beyond the headline PPO number.

Emits one JSON line per metric:
* ``saclag_env_steps_per_sec`` — off-policy family steady-state throughput
  (SACLag: interleaved rollout/TD-update cycles, device replay ring);
* ``ccepets_env_steps_per_sec`` — model-based family throughput (CCEPETS:
  CEM planning through the dynamics ensemble per env step);
* ``pallas_scan_gbps`` — achieved HBM bandwidth of the Pallas GAE/discount
  linear-recurrence kernel vs the chip's peak (roofline check for the
  memory-bound claim in ops/pallas_scan.py).

Run with the TPU visible (PYTHONPATH must include /root/.axon_site on this
image).  Each section is independently try/except'd so one failure doesn't
hide the other numbers.
"""

from __future__ import annotations

import csv
import json
import os
import statistics
import time


def bench_off_policy() -> None:
    import omnisafe_tpu

    agent = omnisafe_tpu.Agent('SACLag', 'Test-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 24000, 'vector_env_nums': 16},
        'algo_cfgs': {'steps_per_epoch': 4000, 'update_cycle': 200,
                      'update_iters': 1, 'batch_size': 256, 'size': 100000,
                      'start_learning_steps': 1000},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_tpu_suite'},
    })
    agent.learn()
    run_dir = agent.agent._logger.log_dir  # pylint: disable=protected-access
    with open(os.path.join(run_dir, 'progress.csv'), encoding='utf-8') as f:
        rows = list(csv.DictReader(f))
    fps = [float(r['Time/FPS']) for r in rows]
    steady = fps[2:] if len(fps) > 3 else fps
    print(json.dumps({
        'metric': 'saclag_env_steps_per_sec',
        'value': round(statistics.median(steady), 1),
        'unit': 'env-steps/s (SACLag, 16 envs, interleaved rollout+update)',
        'vs_baseline': None,
    }), flush=True)


def bench_model_based() -> None:
    import omnisafe_tpu

    agent = omnisafe_tpu.Agent('CCEPETS', 'SafetyPointGoal1-v0-modelbased', custom_cfgs={
        'train_cfgs': {'total_steps': 3000, 'vector_env_nums': 1},
        'algo_cfgs': {'steps_per_epoch': 1000, 'update_dynamics_cycle': 500,
                      'start_learning_steps': 200},
        'evaluation_cfgs': {'use_eval': False},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_tpu_suite'},
    })
    agent.learn()
    run_dir = agent.agent._logger.log_dir  # pylint: disable=protected-access
    with open(os.path.join(run_dir, 'progress.csv'), encoding='utf-8') as f:
        rows = list(csv.DictReader(f))
    fps = [float(r['Time/FPS']) for r in rows]
    steady = fps[1:] if len(fps) > 2 else fps
    print(json.dumps({
        'metric': 'ccepets_env_steps_per_sec',
        'value': round(statistics.median(steady), 1),
        'unit': 'env-steps/s (CCEPETS: CEM planning + ensemble dynamics)',
        'vs_baseline': None,
    }), flush=True)


def bench_pallas_roofline() -> None:
    import jax
    import jax.numpy as jnp

    from omnisafe_tpu.ops.pallas_scan import linear_reverse_scan

    # (T, B) shaped like a large on-policy epoch; the kernel reads a + b and
    # writes y once each -> bytes moved = 3 * T * B * 4
    t_len, batch = 4096, 2048
    a = jnp.full((t_len, batch), 0.99, jnp.float32)
    b = jnp.ones((t_len, batch), jnp.float32)

    # chain REPS dependent kernel invocations inside one jit so per-call
    # tunnel latency and async dispatch cannot distort the timing
    reps = 50

    @jax.jit
    def chained(a, b):
        def body(y, _):
            return linear_reverse_scan(a, y), ()
        y, _ = jax.lax.scan(body, b, None, length=reps)
        return y

    chained(a, b).block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        chained(a, b).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times) / reps
    gbytes = 3 * t_len * batch * 4 / 1e9
    achieved = gbytes / best
    print(json.dumps({
        'metric': 'pallas_scan_gbps',
        'value': round(achieved, 1),
        'unit': f'GB/s achieved on (T={t_len}, B={batch}) discount-cumsum '
                '(v5e HBM peak ~819 GB/s)',
        'vs_baseline': None,
    }), flush=True)


def main() -> None:
    for fn in (bench_pallas_roofline, bench_off_policy, bench_model_based):
        try:
            fn()
        except Exception as exc:  # pylint: disable=broad-except
            print(json.dumps({'metric': fn.__name__, 'error': repr(exc)}), flush=True)


if __name__ == '__main__':
    main()
