#!/usr/bin/env python
"""CPO constrained trust-region solver benchmark.

Times the full CPO update program — two CG solves on jvp-of-grad
Fisher-vector products, the branch-free 5-case dual QP, the 20-candidate
vmapped line search, and the critic sweep — at the reference's production
scale (steps_per_epoch=20000 batch, 64x64 nets, SafetyPointGoal1-v0 obs),
the BASELINE.json north-star "CPO CG + dual-QP + line-search solve ms".

The torch reference re-evaluates full-batch losses sequentially per line
search trial and double-backprops per CG iteration; this program is one
compiled kernel.
"""

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    import omnisafe_tpu

    agent = omnisafe_tpu.Agent('CPO', 'SafetyPointGoal1-v0', custom_cfgs={
        'train_cfgs': {'total_steps': 40000, 'vector_env_nums': 16},
        'algo_cfgs': {'steps_per_epoch': 20000},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': '/tmp/osafe_solver_bench'},
    })
    algo = agent.agent
    state = algo._init_train_state()  # pylint: disable=protected-access
    rollout_jit = jax.jit(algo._rollout_program)  # pylint: disable=protected-access
    update_jit = jax.jit(algo._update_program)  # pylint: disable=protected-access

    state, batch, _, _ = rollout_jit(state)
    jax.block_until_ready(batch.obs)
    Jc, lr = jnp.asarray(30.0), jnp.asarray(1e-3)

    # compile + warmup
    new_state, metrics = update_jit(state, batch, Jc, lr)
    jax.block_until_ready(metrics['Train/KL'])

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        _, metrics = update_jit(state, batch, Jc, lr)
        jax.block_until_ready(metrics['Train/KL'])
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    median_ms = times[len(times) // 2]
    print(json.dumps({
        'metric': 'cpo_solver_update_ms',
        'value': round(median_ms, 2),
        'unit': 'ms (full CPO update: 2xCG FVP + dual QP + 20-way line search + critic sweep, 20k batch)',
        'vs_baseline': None,
    }))


if __name__ == '__main__':
    main()
