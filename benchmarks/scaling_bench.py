"""Data-parallel weak-scaling curve on a virtual CPU mesh.

BASELINE.md asks for a scaling-efficiency measurement; real multi-chip/
multi-host hardware is not available in this image (one tunneled TPU chip,
2 CPU cores), so this measures the compiled dp program's weak scaling on
virtual CPU devices: fixed per-device workload (vector_env_nums envs,
steps_per_epoch scaled with D), env-steps/s at D ∈ {1, 2, 4, 8}.

Interpretation caveat (printed with the results): with 2 physical cores,
D=2 is the only hardware-meaningful point — at D ≥ 4 the virtual devices
oversubscribe the cores, so ideal weak scaling is flat-at-2-cores, not
linear.  The curve still demonstrates (a) the program scales its WORK
linearly with mesh size in one compiled step, and (b) the collective
overhead (pmean of grads/KL/adv-stats) stays negligible at 8 shards.

Each device count runs in a fresh subprocess (XLA's device-count flag is
fixed at backend init).  Output: one JSON line per D plus a summary table;
results land in docs/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

def run_one(d: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD_TEMPLATE.format(d=d, repo=repr(repo))
    out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(f'D={d} failed:\n{out.stdout}\n{out.stderr}')
    line = [l for l in out.stdout.splitlines() if l.startswith('{')][-1]
    return json.loads(line)


_CHILD_TEMPLATE = '''
import os, sys, time, json
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count={d} '
                           + os.environ.get('XLA_FLAGS', ''))
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, {repo})
import omnisafe_tpu

D = {d}
PER_DEV_ENVS = 8
PER_ENV_STEPS = 128
steps_per_epoch = PER_DEV_ENVS * PER_ENV_STEPS * D
epochs = 8
agent = omnisafe_tpu.Agent('PPOLag', 'SafetyAntVelocity-v1', custom_cfgs={{
    'train_cfgs': {{'total_steps': steps_per_epoch * epochs,
                   'vector_env_nums': PER_DEV_ENVS, 'num_devices': D}},
    'algo_cfgs': {{'steps_per_epoch': steps_per_epoch, 'update_iters': 10,
                  'batch_size': steps_per_epoch // 4}},
    'logger_cfgs': {{'use_tensorboard': False, 'log_dir': '/tmp/scaling_bench',
                    'save_model_freq': 1000}},
}})
t0 = time.time()
agent.learn()
import csv, glob
runs = sorted(glob.glob('/tmp/scaling_bench/**/progress.csv', recursive=True),
              key=os.path.getmtime)
rows = list(csv.DictReader(open(runs[-1])))
# drop TWO epochs: epoch 0 compiles, epoch 1 RE-compiles (the first
# update returns committed-sharding arrays, changing the jit signature)
steady = [float(r['Time/Epoch']) for r in rows[2:]]
rate = steps_per_epoch * len(steady) / sum(steady)
print(json.dumps({{'devices': D, 'env_steps_per_sec': rate,
                  'steps_per_epoch': steps_per_epoch}}), flush=True)
'''


def main() -> int:
    results = []
    for d in (1, 2, 4, 8):
        res = run_one(d)
        results.append(res)
        print(json.dumps(res), flush=True)
    base = results[0]['env_steps_per_sec']
    print('\nD  steps/s   weak-scaling eff (vs D=1)')
    for res in results:
        d = res['devices']
        eff = res['env_steps_per_sec'] / (base * d)
        print(f"{d}  {res['env_steps_per_sec']:9.0f}  {eff:6.1%}")
    out_path = os.path.join(os.path.dirname(__file__), 'scaling_results.json')
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump(results, handle, indent=2)
    print(f'\nwritten: {out_path}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
