"""Benchmark-parity training runs on physics-exact (host MuJoCo) envs.

Reproduces the reference's published benchmark protocol
(reference: benchmarks/on-policy/README.md:99-110 — 1e7 steps, default
hyperparameters; benchmarks/off-policy/README.md:39-54 — 1e6 transitions)
on the ``-mujoco`` host-backed velocity envs, which step the same Gymnasium
MuJoCo v4 physics the reference's safety_gymnasium velocity tasks subclass.

Usage:  python benchmarks/parity_run.py --algo PPOLag --seed 0 \
            [--env SafetyHalfCheetahVelocity-v1-mujoco] [--steps 10000000]

Each run trains in-process and writes
``benchmarks/parity/{algo}-{env}-seed{seed}/`` containing the stitched
progress.csv, config.json, and ``summary.json`` with two readings:

* ``final_window_*`` — mean over the last 10 training epochs' episode
  windows (the learning-curve endpoint), and
* ``final_eval_*`` — the reference's table protocol: the FINAL saved policy
  evaluated deterministically for 10 episodes through the Evaluator
  (reference: benchmarks/off-policy/README.md:290 "10 assessment
  iterations"; evaluate_saved_policy.py).

Mid-run resume: checkpoints carry GLOBAL epoch numbers and the trainers
resume the epoch loop at ``start_epoch`` with total_steps unchanged, so
epoch-indexed schedules (linear lr decay, std annealing) continue exactly
and the stitched progress.csv is equivalent to an uninterrupted run.
Completed work dirs (all epochs present) skip training and go straight to
summary assembly, so re-invoking any cell is idempotent.
"""

from __future__ import annotations

import argparse
import csv
import json
import math
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def find_checkpoints(work_dir: str):
    """All (global_epoch, path) train-state checkpoints under work_dir."""
    ckpts = []
    for root, _dirs, files in os.walk(work_dir):
        for name in files:
            m = re.fullmatch(r'epoch-(\d+)\.msgpack', name)
            if m:
                ckpts.append((int(m.group(1)), os.path.join(root, name)))
    return sorted(ckpts)


def eval_run_dir(work_dir: str, run_dirs):
    """Run dir to evaluate the final policy from: the one holding the NEWEST
    checkpoint (an interrupted/stray run dir may sort later yet have no
    save/ directory)."""
    ckpts = find_checkpoints(work_dir)
    if ckpts:
        return os.path.dirname(os.path.dirname(ckpts[-1][1]))
    return run_dirs[-1]


def collect_rows(work_dir: str):
    """All progress rows across the work dir's run dirs, keyed and deduped by
    global Train/Epoch (later run dirs win — they re-ran those epochs)."""
    run_dirs = []
    for root, _dirs, files in os.walk(work_dir):
        if 'progress.csv' in files:
            run_dirs.append(root)
    by_epoch = {}
    fields: list = []
    for run_dir in sorted(run_dirs):  # run-dir names embed launch time
        with open(os.path.join(run_dir, 'progress.csv'), encoding='utf-8') as handle:
            reader = csv.DictReader(handle)
            for row in reader:
                try:
                    epoch = int(float(row['Train/Epoch']))
                except (KeyError, TypeError, ValueError):
                    continue
                by_epoch[epoch] = row
            for name in reader.fieldnames or []:
                if name not in fields:
                    fields.append(name)
    rows = [by_epoch[e] for e in sorted(by_epoch)]
    return rows, fields, sorted(run_dirs)


def main() -> int:  # pylint: disable=too-many-branches,too-many-statements,too-many-locals
    parser = argparse.ArgumentParser()
    parser.add_argument('--algo', required=True)
    parser.add_argument('--seed', type=int, required=True)
    parser.add_argument('--env', default='SafetyHalfCheetahVelocity-v1-mujoco')
    parser.add_argument('--steps', type=int, default=10_000_000)
    parser.add_argument('--vector-env-nums', type=int, default=16)
    parser.add_argument('--off-policy', action='store_true',
                        help='off-policy protocol: 1e6 transitions, UTD 1, '
                             'TPU learner when visible')
    parser.add_argument('--eval-episodes', type=int, default=10)
    parser.add_argument('--cpu', action='store_true',
                        help='force the CPU backend even for off-policy cells '
                             '(e.g. while another run holds the TPU)')
    parser.add_argument('--tag-suffix', default='',
                        help='suffix for the cell tag (e.g. ext15M for an '
                             'extension run seeded from a finished cell\'s '
                             'work dir without overwriting its summary; a '
                             'joining dash is added automatically)')
    parser.add_argument('--reeval', action='store_true',
                        help='augment an existing summary with the final-policy '
                             'evaluation protocol (no training)')
    parser.add_argument('--out', default=os.path.join(os.path.dirname(__file__), 'parity'))
    args = parser.parse_args()

    suffix = args.tag_suffix.lstrip('-')
    tag = f'{args.algo}-{args.env}-seed{args.seed}' + (f'-{suffix}' if suffix else '')
    out_dir = os.path.join(args.out, tag)
    summary_path = os.path.join(out_dir, 'summary.json')
    if os.path.exists(summary_path):
        if not args.reeval:
            print(f'[parity] {tag} already complete, skipping', flush=True)
            return 0
        with open(summary_path, encoding='utf-8') as handle:
            summary = json.load(handle)
        if 'final_eval_ret' in summary:
            print(f'[parity] {tag} already has final_eval, skipping', flush=True)
            return 0
        jax.config.update('jax_platforms', 'cpu')
        import omnisafe_tpu  # pylint: disable=import-outside-toplevel

        work_dir = os.path.join(args.out, '_work', tag)
        _rows, _fields, run_dirs = collect_rows(work_dir)
        if not run_dirs:
            print(f'[parity] {tag}: no work dir to evaluate from', flush=True)
            return 1
        evaluator = omnisafe_tpu.Evaluator()
        evaluator.load_saved(eval_run_dir(work_dir, run_dirs))
        eval_ret, eval_cost, eval_len = evaluator.evaluate(
            num_episodes=args.eval_episodes, seed=10_000 + args.seed
        )
        summary.update(final_eval_ret=eval_ret, final_eval_cost=eval_cost,
                       final_eval_len=eval_len,
                       final_eval_episodes=args.eval_episodes)
        with open(summary_path, 'w', encoding='utf-8') as handle:
            json.dump(summary, handle, indent=2)
        print(f'[parity] {tag}: eval ret={eval_ret:.2f} cost={eval_cost:.2f}',
              flush=True)
        return 0

    if args.off_policy and not args.cpu:
        # CPU default for the actor-side host loop; the TPU (when visible via
        # PYTHONPATH including the axon plugin) hosts the ring + TD updates
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
    else:
        # host physics + tiny MLPs: CPU is the right backend for the whole run
        jax.config.update('jax_platforms', 'cpu')
    import omnisafe_tpu  # pylint: disable=import-outside-toplevel

    work_dir = os.path.join(args.out, '_work', tag)
    steps = args.steps
    if args.off_policy and args.steps == 10_000_000:
        # reference protocol: 1e6 TRANSITIONS total, counted per env
        steps = 1_000_000 // args.vector_env_nums

    if args.off_policy:
        # reference protocol: 1e6 transitions, 1 update per transition.
        # 16 envs x update_cycle=5 -> 80-transition cycles with 80 updates
        # (UTD 1 preserved); lambda_lr is scaled by the cycle size because
        # the lambda Adam step runs once per cycle instead of once per
        # transition (reference: ddpg_lag.py:58-66 ascends every update call).
        # cycle size trades λ-update granularity against per-cycle dispatch
        # overhead: 5 per-env steps at 16 envs (80-transition cycles), 50 at
        # 1 env (the 5-transition cycle paid ~100 dispatches/epoch — 10.6 s
        # vs ~0.1 s of actual compute)
        cycle = 5 if args.vector_env_nums > 1 else 50
        custom = {
            'seed': args.seed,
            'train_cfgs': {'total_steps': steps,
                           'vector_env_nums': args.vector_env_nums,
                           # keep the reference's one-eval-per-2000-transition
                           # cadence regardless of epoch size
                           'eval_epoch_freq': max(2000 // (500 * args.vector_env_nums), 1)},
            'algo_cfgs': {'steps_per_epoch': 500, 'update_cycle': cycle,
                          'update_iters': cycle * args.vector_env_nums,
                          # reference λ warm-up spans 200k transitions
                          # (warmup_epochs 100 x steps_per_epoch 2000,
                          # SACLag.yaml:36,80); our epochs are 500*N
                          # transitions
                          'warmup_epochs': 400 // args.vector_env_nums,
                          # reference ring capacity is 1e6 TRANSITIONS; ours
                          # is per-env slots x num_envs
                          'size': 1_000_000 // args.vector_env_nums},
            # reference λ ascends once PER TRANSITION at lambda_lr=1e-5
            # (update_cycle: 1, configs/off-policy/SACLag.yaml:38,128); the
            # trainer now steps λ once per update ITERATION (= once per
            # transition at UTD 1), so the reference rate applies verbatim —
            # rescaling lr by the cycle size (as earlier rounds did) kept the
            # integrated rate but slowed Adam's β₁/β₂ damping horizons ~50x
            # in env-step time, which is the settle-vs-oscillate difference
            'lagrange_cfgs': {'lambda_lr': 1.0e-5},
            # the reference's λ reads a 10-episode window collected by ONE
            # env = ~10k steps of policy history; with N parallel envs the
            # same smoothing span needs 10*N episodes (window 10 at 16 envs
            # would be fully replaced every episode round, making Jc ~16x
            # noisier than the reference's λ input)
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': work_dir,
                            'save_model_freq': 25,
                            'window_lens': 10 * args.vector_env_nums},
        }
        if args.algo in ('DDPG', 'TD3', 'SAC'):
            custom.pop('lagrange_cfgs')
            custom['algo_cfgs'].pop('warmup_epochs')  # Lagrangian-only knob
        # the off-policy trainer counts epochs in PER-ENV steps:
        # epochs = total_steps // algo_cfgs.steps_per_epoch (ddpg.py), so a
        # 62500-step cell runs 125 epochs of 500 per-env steps each
        steps_per_epoch = custom['algo_cfgs']['steps_per_epoch']
    else:
        custom = {
            'seed': args.seed,
            'train_cfgs': {'total_steps': steps,
                           'vector_env_nums': args.vector_env_nums},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': work_dir,
                            'save_model_freq': 50},
        }
        # resolve steps_per_epoch from the algo's YAML defaults rather than
        # hardcoding 20k: a changed default would otherwise make the resume
        # accounting silently wrong (skipped training / wrong endpoint)
        from omnisafe_tpu.utils.config import get_default_kwargs_yaml  # pylint: disable=import-outside-toplevel
        from omnisafe_tpu.algorithms import ALGORITHM2TYPE  # pylint: disable=import-outside-toplevel

        yaml_cfgs = get_default_kwargs_yaml(args.algo, args.env, ALGORITHM2TYPE[args.algo])
        steps_per_epoch = int(yaml_cfgs.algo_cfgs.steps_per_epoch)
    total_epochs = steps // steps_per_epoch

    # -- mid-run resume ----------------------------------------------------
    ckpts = find_checkpoints(work_dir)
    resume_epoch, resume_ckpt = (ckpts[-1]) if ckpts else (-1, None)
    start_epoch = resume_epoch + 1
    if resume_ckpt is None:
        shutil.rmtree(work_dir, ignore_errors=True)

    if start_epoch >= total_epochs:
        print(f'[parity] {tag}: work dir already trained through epoch '
              f'{resume_epoch}; assembling summary only', flush=True)
        agent = None
        ep_ret = ep_cost = ep_len = float('nan')
    else:
        agent = omnisafe_tpu.Agent(args.algo, args.env, custom_cfgs=custom)
        if resume_ckpt is not None:
            print(f'[parity] {tag}: resuming at global epoch {start_epoch} '
                  f'({resume_ckpt})', flush=True)
            agent.agent.restore(resume_ckpt, start_epoch=start_epoch)
        ep_ret, ep_cost, ep_len = agent.learn()

    # -- stitch progress + summarize --------------------------------------
    rows, fields, run_dirs = collect_rows(work_dir)
    assert rows, f'no progress rows under {work_dir}'
    tail = rows[-10:]

    def window_mean(key: str):
        vals = []
        for row in tail:
            try:
                vals.append(float(row[key]))
            except (KeyError, TypeError, ValueError):
                continue
        return sum(vals) / len(vals) if vals else float('nan')

    final_ret = window_mean('Metrics/EpRet')
    final_cost = window_mean('Metrics/EpCost')
    extra = {}
    if 'Metrics/TestEpRet' in rows[-1]:
        extra['final_window_test_ret'] = window_mean('Metrics/TestEpRet')
        extra['final_window_test_cost'] = window_mean('Metrics/TestEpCost')

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'progress.csv'), 'w',
              encoding='utf-8', newline='') as handle:
        writer = csv.DictWriter(handle, fieldnames=fields, restval='nan',
                                extrasaction='ignore')
        writer.writeheader()
        writer.writerows(rows)
    cfg_src = os.path.join(eval_run_dir(work_dir, run_dirs), 'config.json')
    if os.path.exists(cfg_src):
        shutil.copy(cfg_src, os.path.join(out_dir, 'config.json'))

    # -- reference table protocol: evaluate the final saved policy ---------
    if args.eval_episodes > 0:
        try:
            evaluator = omnisafe_tpu.Evaluator()
            evaluator.load_saved(eval_run_dir(work_dir, run_dirs))  # newest ckpt = final
            eval_ret, eval_cost, eval_len = evaluator.evaluate(
                num_episodes=args.eval_episodes, seed=10_000 + args.seed
            )
            extra.update(final_eval_ret=eval_ret, final_eval_cost=eval_cost,
                         final_eval_len=eval_len,
                         final_eval_episodes=args.eval_episodes)
        except Exception as exc:  # pragma: no cover - keep the run's result
            print(f'[parity] {tag}: final-policy evaluation failed: {exc!r}',
                  flush=True)
            extra.update(final_eval_error=repr(exc))

    summary = {
        'algo': args.algo, 'env': args.env, 'seed': args.seed,
        'total_steps': steps, 'vector_env_nums': args.vector_env_nums,
        'final_window_ret': final_ret, 'final_window_cost': final_cost,
        'last_epoch_ret': ep_ret, 'last_epoch_cost': ep_cost,
        'ep_len': ep_len, **extra,
    }
    summary = {k: (None if isinstance(v, float) and math.isnan(v) else v)
               for k, v in summary.items()}
    with open(summary_path, 'w', encoding='utf-8') as handle:
        json.dump(summary, handle, indent=2)
    print(f'[parity] {tag}: window ret={final_ret:.2f} cost={final_cost:.2f} '
          f'eval ret={extra.get("final_eval_ret", float("nan")):.2f} '
          f'cost={extra.get("final_eval_cost", float("nan")):.2f}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
