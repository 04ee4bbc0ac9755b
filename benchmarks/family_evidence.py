#!/usr/bin/env python
"""Quantitative evidence runs for the model-based and offline families.

The reference publishes convergence numbers for these families
(`/root/reference/benchmarks/model-based/README.md:87-160` — SafeLOOP
22.94/0.04, CCEPETS 24.98/1.87, PETS 27.66/49.16 on SafetyPointGoal1-v0;
`offline/README.md:117-222` — COptiDICE cost ordered by the dataset mix
ratio β).  Real Safety-Gymnasium physics is not installable in this image,
so these runs are STRUCTURAL evidence on the analytic counterparts: the
constrained planner/policy must drive cost far below its unconstrained
sibling at comparable reward (model-based), and COptiDICE's learned-policy
cost must track the dataset mix (offline).

Subcommands (each idempotent, writing benchmarks/evidence/*.json):

  modelbased --algo CCEPETS|PETS|SafeLOOP [--steps N]
  offline-prep      train PPO (unsafe) + PPOLag (safe) behavior policies on
                    SafetyPointCircle1-v0 and collect mixed datasets at
                    β ∈ {0.25, 0.5, 0.75} (β = fraction of SAFE-policy
                    transitions)
  offline-run       train + evaluate COptiDICE on each mixed dataset
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVIDENCE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'evidence')
WORK = os.path.join(EVIDENCE, '_work')


def _tail_metrics(log_dir: str, n: int = 5):
    runs = sorted(glob.glob(os.path.join(log_dir, '**', 'progress.csv'),
                            recursive=True), key=os.path.getmtime)
    with open(runs[-1], encoding='utf-8') as handle:
        rows = list(csv.DictReader(handle))
    tail = rows[-n:]
    mean = lambda key: sum(float(r[key]) for r in tail) / len(tail)  # noqa: E731
    return mean('Metrics/EpRet'), mean('Metrics/EpCost'), rows


def run_modelbased(args) -> None:
    out_path = os.path.join(EVIDENCE, f'modelbased-{args.algo}.json')
    if os.path.exists(out_path):
        print(f'[evidence] {out_path} exists, skipping')
        return
    import omnisafe_tpu

    log_dir = os.path.join(WORK, f'mb-{args.algo}')
    agent = omnisafe_tpu.Agent(args.algo, 'SafetyPointGoal1-v0-modelbased', custom_cfgs={
        'seed': 0,
        'train_cfgs': {'total_steps': args.steps},
        'algo_cfgs': {'steps_per_epoch': args.steps_per_epoch},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': log_dir,
                        'save_model_freq': 1000},
    })
    agent.learn()
    ret, cost, rows = _tail_metrics(log_dir)
    curve = [{'epoch': float(r['Train/Epoch']), 'ret': float(r['Metrics/EpRet']),
              'cost': float(r['Metrics/EpCost'])} for r in rows]
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump({'algo': args.algo, 'env': 'SafetyPointGoal1-v0-modelbased',
                   'steps': args.steps, 'final_window_ret': ret,
                   'final_window_cost': cost, 'curve': curve}, handle, indent=2)
    print(f'[evidence] {args.algo}: ret={ret:.2f} cost={cost:.2f}')


BETAS = (0.25, 0.5, 0.75)
OFFLINE_ENV = 'SafetyPointCircle1-v0'
PER_SOURCE = 500_000


def run_offline_prep(args) -> None:
    del args
    import jax
    import jax.numpy as jnp
    import numpy as np

    import omnisafe_tpu
    from omnisafe_tpu.common.offline.data_collector import OfflineDataCollector

    os.makedirs(WORK, exist_ok=True)
    if all(os.path.exists(os.path.join(WORK, f'dataset-beta{b}.npz'))
           for b in BETAS):
        print('[evidence] mixed datasets already present, skipping prep')
        return
    policies = {}
    for algo in ('PPO', 'PPOLag'):
        ckpt_tag = os.path.join(WORK, f'behavior-{algo}')
        agent = omnisafe_tpu.Agent(algo, OFFLINE_ENV, custom_cfgs={
            'seed': 0,
            'train_cfgs': {'total_steps': 2_000_000, 'vector_env_nums': 32},
            'algo_cfgs': {'steps_per_epoch': 32_000},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': ckpt_tag,
                            'save_model_freq': 10_000},
        })
        ret, cost, _len = agent.learn()
        print(f'[evidence] behavior {algo}: ret={ret:.2f} cost={cost:.2f}')
        algo_obj = agent.agent
        params = algo_obj._final_state.params  # pylint: disable=protected-access
        ac = algo_obj._actor_critic  # pylint: disable=protected-access

        def policy(obs, key, params=params, ac=ac):
            act, *_ = ac.step(params, obs, key)
            return act

        policies[algo] = policy

    for algo, policy in policies.items():
        path = os.path.join(WORK, f'dataset-{algo}.npz')
        if not os.path.exists(path):
            OfflineDataCollector(OFFLINE_ENV, num_envs=32).collect(
                PER_SOURCE, path, policy=policy, seed=7)
            print(f'[evidence] collected {path}')

    import numpy as np  # noqa: F811
    safe = np.load(os.path.join(WORK, 'dataset-PPOLag.npz'))
    unsafe = np.load(os.path.join(WORK, 'dataset-PPO.npz'))
    rng = np.random.default_rng(0)
    for beta in BETAS:
        path = os.path.join(WORK, f'dataset-beta{beta}.npz')
        if os.path.exists(path):
            continue
        n = min(len(safe['obs']), len(unsafe['obs']))
        n_safe = int(beta * n)
        idx_s = rng.choice(len(safe['obs']), n_safe, replace=False)
        idx_u = rng.choice(len(unsafe['obs']), n - n_safe, replace=False)
        mixed = {k: np.concatenate([safe[k][idx_s], unsafe[k][idx_u]])
                 for k in safe.files}
        perm = rng.permutation(n)
        np.savez(path, **{k: v[perm] for k, v in mixed.items()})
        print(f'[evidence] mixed beta={beta} -> {path} ({n} transitions)')


def run_offline(args) -> None:
    """β-sweep one offline algorithm over the mixed safe/unsafe datasets
    (reference analogue: benchmarks/offline/README.md:117-222 publishes
    VAE-BC / BCQLag / C-CRR / COptiDICE rows per dataset mix)."""
    algo = args.algo
    out_path = os.path.join(EVIDENCE, f'offline-{algo.lower()}.json')
    if os.path.exists(out_path):
        print(f'[evidence] {out_path} exists, skipping')
        return
    import omnisafe_tpu

    results = []
    for beta in BETAS:
        dataset = os.path.join(WORK, f'dataset-beta{beta}.npz')
        log_dir = os.path.join(WORK, f'{algo.lower()}-beta{beta}')
        agent = omnisafe_tpu.Agent(algo, OFFLINE_ENV, custom_cfgs={
            'seed': 0,
            'train_cfgs': {'dataset': dataset, 'total_steps': args.steps},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': log_dir,
                            'save_model_freq': 1000},
        })
        agent.learn()
        runs = sorted(glob.glob(os.path.join(log_dir, '**', 'progress.csv'),
                                recursive=True), key=os.path.getmtime)
        with open(runs[-1], encoding='utf-8') as handle:
            rows = list(csv.DictReader(handle))
        tail = rows[-3:]
        mean = lambda key: sum(float(r[key]) for r in tail) / len(tail)  # noqa: E731
        results.append({'beta': beta, 'eval_ret': mean('Metrics/EpRet'),
                        'eval_cost': mean('Metrics/EpCost')})
        print(f'[evidence] {algo} beta={beta}: '
              f'ret={results[-1]["eval_ret"]:.2f} cost={results[-1]["eval_cost"]:.2f}',
              flush=True)
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump({'algo': algo, 'env': OFFLINE_ENV, 'per_beta': results,
                   'note': 'beta = fraction of SAFE (PPOLag) transitions in '
                           'the mixed dataset; reference analogue: '
                           'benchmarks/offline/README.md:117-222'},
                  handle, indent=2)


def run_offline_one(args) -> None:
    """Single (algo, beta, seed) offline cell — targeted reruns (round-5:
    the CCRR beta=0.5 seed-1 rerun of the multiplier-collapse anomaly)."""
    algo, beta, seed = args.algo, args.beta, args.seed
    out_path = os.path.join(
        EVIDENCE, f'offline-{algo.lower()}-seed{seed}-beta{beta}.json')
    if os.path.exists(out_path):
        print(f'[evidence] {out_path} exists, skipping')
        return
    import omnisafe_tpu

    dataset = os.path.join(WORK, f'dataset-beta{beta}.npz')
    log_dir = os.path.join(WORK, f'{algo.lower()}-beta{beta}-seed{seed}')
    agent = omnisafe_tpu.Agent(algo, OFFLINE_ENV, custom_cfgs={
        'seed': seed,
        'train_cfgs': {'dataset': dataset, 'total_steps': args.steps},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': log_dir,
                        'save_model_freq': 1000},
    })
    agent.learn()
    runs = sorted(glob.glob(os.path.join(log_dir, '**', 'progress.csv'),
                            recursive=True), key=os.path.getmtime)
    with open(runs[-1], encoding='utf-8') as handle:
        rows = list(csv.DictReader(handle))
    tail = rows[-3:]
    mean = lambda key: sum(float(r[key]) for r in tail) / len(tail)  # noqa: E731
    lam_keys = [k for k in rows[-1] if 'Lagrange' in k or 'multiplier' in k.lower()]
    result = {'algo': algo, 'beta': beta, 'seed': seed,
              'eval_ret': mean('Metrics/EpRet'), 'eval_cost': mean('Metrics/EpCost'),
              **{k: float(rows[-1][k]) for k in lam_keys}}
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump(result, handle, indent=2)
    print(f'[evidence] {algo} seed={seed} beta={beta}: '
          f'ret={result["eval_ret"]:.2f} cost={result["eval_cost"]:.2f}', flush=True)


def run_modelbased_physics(args) -> None:
    """Model-based family on REAL MuJoCo physics (VERDICT round-3 item 6):
    PETS / CCEPETS / SafeLOOP on the physics-exact HalfCheetah velocity
    task, with chunked receding-horizon execution (plan_chunk) amortizing
    planner cost.  Expected ordering mirrors the reference's PointGoal
    tables (reference: benchmarks/model-based/README.md:87-160): the
    constrained planners drive cost far below unconstrained PETS at
    comparable reward; the repo's own on-policy parity cells are the
    reward yardstick."""
    suffix = f'-{args.tag}' if args.tag else ''
    out_path = os.path.join(EVIDENCE, f'mbphysics-{args.algo}{suffix}.json')
    if os.path.exists(out_path):
        print(f'[evidence] {out_path} exists, skipping')
        return
    import jax

    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    import omnisafe_tpu

    env_id = 'SafetyHalfCheetahVelocity-v1-mujoco'
    log_dir = os.path.join(WORK, f'mbphys-{args.algo}{suffix}')
    if args.planner == 'reference':
        # the reference YAML planner verbatim (configs/model-based/PETS.yaml:
        # 512 samples, 5 iterations, 20 particles, horizon 7) with chunked
        # execution amortizing the receding horizon on the TPU
        planner_cfgs = {'plan_chunk': 5, 'plan_horizon': 10,
                        'num_iterations': 5, 'num_samples': 512,
                        'num_particles': 20, 'num_elites': 64}
    else:
        # planner sized for 2 CPU cores: LOOP-scale candidate pool; chunk 5
        # of a 10-step horizon => one planning call per 25 env steps
        # (action_repeat 5)
        planner_cfgs = {'plan_chunk': 5, 'plan_horizon': 10,
                        'num_iterations': 3, 'num_samples': 100,
                        'num_particles': 5, 'num_elites': 10}
    cfgs = {
        'seed': 0,
        'train_cfgs': {'total_steps': args.steps},
        'planner_cfgs': planner_cfgs,
        'dynamics_cfgs': {'num_ensemble': 5, 'elite_size': 5},
        'evaluation_cfgs': {'use_eval': False},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': log_dir,
                        'save_model_freq': 5},
    }
    agent = omnisafe_tpu.Agent(args.algo, env_id, custom_cfgs=cfgs)
    ret, cost, _len = agent.learn()
    r_tail, c_tail, rows = _tail_metrics(log_dir)
    curve = [{'epoch': float(r['Train/Epoch']), 'ret': float(r['Metrics/EpRet']),
              'cost': float(r['Metrics/EpCost'])} for r in rows]
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump({'algo': args.algo, 'env': env_id, 'steps': args.steps,
                   'plan_chunk': 5, 'planner': args.planner, 'tpu': args.tpu,
                   'final_window_ret': r_tail,
                   'final_window_cost': c_tail, 'last_ret': ret,
                   'last_cost': cost, 'curve': curve}, handle, indent=2)
    print(f'[evidence] {args.algo} physics: ret={r_tail:.2f} cost={c_tail:.2f}',
          flush=True)


def run_crabs(args) -> None:
    """CRABS acceptance evidence (reference:
    omnisafe/algorithms/off_policy/crabs.py:56-539): on
    SafeInvertedPendulum-v2 the co-trained barrier must keep TRAINING-TIME
    safety violations near zero, where an unconstrained SAC with the same
    budget violates freely.  Each unit of episode cost is one unsafe step
    (envs/classic_control.py cost = violation indicator), so the per-epoch
    EpCost window is violations-per-episode during exploration."""
    out_path = os.path.join(EVIDENCE, 'crabs-vs-sac.json')
    if os.path.exists(out_path):
        print(f'[evidence] {out_path} exists, skipping')
        return
    import omnisafe_tpu

    results = {}
    for algo in ('SAC', 'CRABS'):
        log_dir = os.path.join(WORK, f'crabs-ev-{algo}')
        cfgs = {
            'seed': 0,
            'train_cfgs': {'total_steps': args.steps, 'vector_env_nums': 4,
                           'eval_episodes': 2},
            'algo_cfgs': {'steps_per_epoch': 500},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': log_dir,
                            'save_model_freq': 10_000},
        }
        agent = omnisafe_tpu.Agent(algo, 'SafeInvertedPendulum-v2',
                                   custom_cfgs=cfgs)
        ret, cost, _len = agent.learn()
        runs = sorted(glob.glob(os.path.join(log_dir, '**', 'progress.csv'),
                                recursive=True), key=os.path.getmtime)
        with open(runs[-1], encoding='utf-8') as handle:
            rows = list(csv.DictReader(handle))
        curve = [{'epoch': float(r['Train/Epoch']),
                  'ep_cost': float(r['Metrics/EpCost']),
                  'ep_ret': float(r['Metrics/EpRet'])} for r in rows]
        mean_viol = sum(c['ep_cost'] for c in curve) / max(len(curve), 1)
        results[algo] = {'final_ret': ret, 'final_cost': cost,
                         'mean_violations_per_episode': mean_viol,
                         'curve': curve}
        print(f'[evidence] {algo}: final ret={ret:.2f} cost={cost:.2f} '
              f'mean train violations/episode={mean_viol:.3f}', flush=True)
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump({'env': 'SafeInvertedPendulum-v2', 'steps': args.steps,
                   'results': results,
                   'note': 'cost = unsafe-state steps during TRAINING '
                           'rollouts; CRABS must stay near zero while '
                           'unconstrained SAC violates freely (reference: '
                           'omnisafe/algorithms/off_policy/crabs.py:56-539)'},
                  handle, indent=2)


def run_goal(args) -> None:
    """Structural validation of the analytic Goal surrogate (VERDICT round-2
    ask 9): on SafetyPointGoal1-v0 the constrained learners must reproduce
    the reference's qualitative geometry — reward rises while cost is driven
    to/below the 25.0 limit, where unconstrained PPO saturates the cost
    channel (reference rows: PPO 25.44/55.72, PPOLag 12.96/25.80, CPO
    20.46/28.84 — benchmarks/on-policy/README.md)."""
    out_path = os.path.join(EVIDENCE, f'goal-{args.algo}{args.tag}.json')
    if os.path.exists(out_path):
        print(f'[evidence] {out_path} exists, skipping')
        return
    import omnisafe_tpu

    log_dir = os.path.join(WORK, f'goal-{args.algo}{args.tag}')
    agent = omnisafe_tpu.Agent(args.algo, 'SafetyPointGoal1-v0', custom_cfgs={
        'seed': 0,
        'train_cfgs': {'total_steps': args.steps, 'vector_env_nums': 32},
        'logger_cfgs': {'use_tensorboard': False, 'log_dir': log_dir,
                        'save_model_freq': 100_000},
    })
    agent.learn()
    ret, cost, rows = _tail_metrics(log_dir, n=10)
    stride = max(len(rows) // 60, 1)
    curve = [{'epoch': float(r['Train/Epoch']), 'ret': float(r['Metrics/EpRet']),
              'cost': float(r['Metrics/EpCost'])} for r in rows[::stride]]
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(out_path, 'w', encoding='utf-8') as handle:
        json.dump({'algo': args.algo, 'env': 'SafetyPointGoal1-v0',
                   'steps': args.steps, 'final_window_ret': ret,
                   'final_window_cost': cost, 'curve': curve}, handle, indent=2)
    print(f'[evidence] goal {args.algo}: ret={ret:.2f} cost={cost:.2f}')


def main() -> int:
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest='cmd', required=True)
    mb = sub.add_parser('modelbased')
    mb.add_argument('--algo', default='CCEPETS')
    mb.add_argument('--steps', type=int, default=150_000)
    mb.add_argument('--steps-per-epoch', type=int, default=4000)
    mbp = sub.add_parser('modelbased-physics')
    mbp.add_argument('--algo', default='CCEPETS')
    mbp.add_argument('--steps', type=int, default=60_000)
    mbp.add_argument('--planner', choices=['small', 'reference'], default='small',
                     help='small = 2-core CPU sizing; reference = the reference '
                          'YAML planner (512 samples, 5 iters, 20 particles)')
    mbp.add_argument('--tpu', action='store_true',
                     help='leave the accelerator visible (TPU-resident planner '
                          '+ dynamics training) instead of forcing CPU')
    mbp.add_argument('--tag', default='',
                     help='suffix for the evidence/work dir names')
    goal = sub.add_parser('goal')
    goal.add_argument('--algo', default='PPOLag')
    goal.add_argument('--steps', type=int, default=10_000_000)
    goal.add_argument('--tag', default='')
    sub.add_parser('offline-prep')
    p_off = sub.add_parser('offline-run')
    p_off.add_argument('--algo', default='COptiDICE')
    p_off.add_argument('--steps', type=int, default=300_000)
    p_one = sub.add_parser('offline-one')
    p_one.add_argument('--algo', required=True)
    p_one.add_argument('--beta', type=float, required=True)
    p_one.add_argument('--seed', type=int, required=True)
    p_one.add_argument('--steps', type=int, default=300_000)
    p_crabs = sub.add_parser('crabs')
    p_crabs.add_argument('--steps', type=int, default=30_000)
    args = parser.parse_args()
    if args.cmd == 'modelbased':
        run_modelbased(args)
    elif args.cmd == 'modelbased-physics':
        run_modelbased_physics(args)
    elif args.cmd == 'goal':
        run_goal(args)
    elif args.cmd == 'offline-prep':
        run_offline_prep(args)
    elif args.cmd == 'crabs':
        run_crabs(args)
    elif args.cmd == 'offline-one':
        run_offline_one(args)
    else:
        run_offline(args)
    return 0


if __name__ == '__main__':
    sys.exit(main())
