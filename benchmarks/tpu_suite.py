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
    """Scan-kernel bandwidth + the environment's achievable ceiling.

    Timing rules learned the hard way on the tunneled chip: (a) chain
    dependent kernels inside one jit (per-call dispatch otherwise
    dominates); (b) force a VALUE fetch of the scalar result —
    block_until_ready alone has been observed returning without the remote
    computation having run; (c) use a FRESH input per timed call — repeat
    executions with identical inputs return cached results.  A zero-compute
    pallas copy kernel moving the same bytes is measured identically: its
    number is the achievable ceiling to compare the scan against (the gap
    to the ~819 GB/s nameplate is the execution environment, not kernel
    structure).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from omnisafe_tpu.ops.pallas_scan import _pallas_linear_reverse_scan

    t_len, batch = 4096, 2048
    reps = 50
    gbytes = 3 * t_len * batch * 4 / 1e9
    # a in (0.1, 0.3) keeps 50 chained scans bounded in float32
    a = jax.random.uniform(jax.random.key(0), (t_len, batch), jnp.float32, 0.1, 0.3)

    def copy_kernel(a_ref, b_ref, out_ref):
        out_ref[:] = a_ref[:] + b_ref[:] * 0.5

    @jax.jit
    def copy_run(a, b):
        spec = pl.BlockSpec((256, 128), lambda i, j: (j, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
            grid=(batch // 128, t_len // 256), in_specs=[spec, spec], out_specs=spec,
        )(a, b)

    def chained(step):
        @jax.jit
        def fn(a, b):
            def body(y, _):
                return step(a, y), ()
            y, _ = jax.lax.scan(body, b, None, length=reps)
            return jnp.sum(y)
        return fn

    def measure(fn):
        float(fn(a, jax.random.normal(jax.random.key(7), (t_len, batch))))  # compile
        times = []
        for i in range(5):
            b = jax.random.normal(jax.random.key(100 + i), (t_len, batch))
            b.block_until_ready()
            t0 = time.perf_counter()
            float(fn(a, b))
            times.append((time.perf_counter() - t0) / reps)
        return gbytes / min(times)

    scan_fn = chained(lambda a, y: _pallas_linear_reverse_scan(
        a, y, jnp.zeros((batch,))))
    copy_fn = chained(copy_run)
    scan_gbps = measure(scan_fn)
    copy_gbps = measure(copy_fn)
    print(json.dumps({
        'metric': 'pallas_scan_gbps',
        'value': round(scan_gbps, 1),
        'unit': f'GB/s on (T={t_len}, B={batch}) discount-cumsum; achievable '
                f'ceiling (pallas copy, same bytes) measured {copy_gbps:.0f} '
                'GB/s; v5e nameplate ~819 GB/s',
        'vs_baseline': round(scan_gbps / copy_gbps, 3),
    }), flush=True)


def main() -> None:
    for fn in (bench_pallas_roofline, bench_off_policy, bench_model_based):
        try:
            fn()
        except Exception as exc:  # pylint: disable=broad-except
            print(json.dumps({'metric': fn.__name__, 'error': repr(exc)}), flush=True)


if __name__ == '__main__':
    main()
