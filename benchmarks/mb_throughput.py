#!/usr/bin/env python
"""Model-based planning-loop throughput (env-steps/s of the jitted collect
program) at varying plan_chunk.

Round-3 baseline: 71 env-steps/s for CCEPETS training wall-clock, one
planner dispatch per (5-step action-repeated) planning step through the
tunnel.  Chunked receding-horizon execution (plan k steps per planner call,
``planner_cfgs.plan_chunk``) divides planner invocations per env step by k;
this harness measures the collect program itself on the analytic navigation
env (fully on-device — no host physics in the loop) so the number isolates
the planning loop.

Timing follows the tunnel rules (memory: tpu-tunnel-timing): each measured
call value-fetches a scalar that depends on the whole cycle, and successive
calls feed the evolving train state back in, so inputs are always fresh and
nothing is loop-invariant.

Usage: python benchmarks/mb_throughput.py [--chunks 1,8] [--cycles 5]
Writes benchmarks/evidence/mb-throughput.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVIDENCE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'evidence')


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--chunks', default='1,4')
    parser.add_argument('--cycles', type=int, default=5)
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    import omnisafe_tpu

    platform = jax.devices()[0].platform
    results = {}
    for chunk in [int(c) for c in args.chunks.split(',')]:
        cfg = {
            'seed': 0,
            'train_cfgs': {'total_steps': 20_000},
            'algo_cfgs': {'steps_per_epoch': 20_000,
                          'update_dynamics_cycle': 1_200,
                          'start_learning_steps': 0, 'action_repeat': 5},
            'planner_cfgs': {'plan_chunk': chunk},
            'evaluation_cfgs': {'use_eval': False},
            'logger_cfgs': {'use_tensorboard': False,
                            'log_dir': f'/tmp/mb_tp_{chunk}'},
        }
        agent = omnisafe_tpu.Agent('CCEPETS', 'SafetyPointGoal1-v0-modelbased',
                                   custom_cfgs=cfg)
        algo = agent.agent
        state = algo._init_train_state()  # pylint: disable=protected-access
        collect = jax.jit(algo._collect_program)  # pylint: disable=protected-access
        steps_per_cycle = (int(cfg['algo_cfgs']['update_dynamics_cycle']))

        def one_cycle(state):
            state, (done, ep_ret, _c, _l), _info = collect(
                state, jnp.asarray(True), jnp.asarray(0.0))
            # value-fetch a cycle-dependent scalar: forces remote completion
            _ = float(jnp.sum(ep_ret) + jnp.sum(done))
            return state

        state = one_cycle(state)  # compile + warm
        times = []
        for _ in range(args.cycles):
            t0 = time.perf_counter()
            state = one_cycle(state)
            times.append(time.perf_counter() - t0)
        best = min(times)
        steps_s = steps_per_cycle / best
        results[str(chunk)] = {
            'cycle_s': best,
            'env_steps_per_s': steps_s,
            'planner_calls_per_cycle': steps_per_cycle // 5 // chunk,
        }
        print(f'[mb-throughput] chunk={chunk}: {steps_s:,.0f} env-steps/s '
              f'({best*1e3:.1f} ms / {steps_per_cycle}-step cycle)', flush=True)

    os.makedirs(EVIDENCE, exist_ok=True)
    out = os.path.join(EVIDENCE, 'mb-throughput.json')
    with open(out, 'w', encoding='utf-8') as handle:
        json.dump({'platform': platform, 'algo': 'CCEPETS',
                   'env': 'SafetyPointGoal1-v0-modelbased',
                   'baseline_r3_env_steps_per_s': 71.0,
                   'per_chunk': results}, handle, indent=2)
    print(f'[mb-throughput] wrote {out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
