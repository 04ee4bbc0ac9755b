"""Benchmark-parity training runs on physics-exact (host MuJoCo) envs.

Reproduces the reference's published on-policy benchmark protocol
(reference: benchmarks/on-policy/README.md:99-110 — 1e7 steps, default
hyperparameters, final performance averaged across seeds) on the
``-mujoco`` host-backed velocity envs, which step the same Gymnasium
MuJoCo v4 physics the reference's safety_gymnasium velocity tasks subclass.

Usage:  python benchmarks/parity_run.py --algo PPOLag --seed 0 \
            [--env SafetyHalfCheetahVelocity-v1-mujoco] [--steps 10000000]

Each run trains in-process and writes
``benchmarks/parity/{algo}-{env}-seed{seed}/`` containing the full run dir
(progress.csv, config.json, checkpoints) plus ``summary.json`` with the
final-window episode return/cost.  Existing completed runs are skipped so a
queue of invocations is resumable.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import sys

import jax


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--algo', required=True)
    parser.add_argument('--seed', type=int, required=True)
    parser.add_argument('--env', default='SafetyHalfCheetahVelocity-v1-mujoco')
    parser.add_argument('--steps', type=int, default=10_000_000)
    parser.add_argument('--vector-env-nums', type=int, default=16)
    parser.add_argument('--off-policy', action='store_true',
                        help='off-policy protocol: 1e6 transitions, UTD 1, '
                             'TPU learner when visible')
    parser.add_argument('--out', default=os.path.join(os.path.dirname(__file__), 'parity'))
    args = parser.parse_args()

    tag = f'{args.algo}-{args.env}-seed{args.seed}'
    out_dir = os.path.join(args.out, tag)
    summary_path = os.path.join(out_dir, 'summary.json')
    if os.path.exists(summary_path):
        print(f'[parity] {tag} already complete, skipping', flush=True)
        return 0

    if args.off_policy:
        # CPU default for the actor-side host loop; the TPU (when visible via
        # PYTHONPATH including the axon plugin) hosts the ring + TD updates
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
    else:
        # host physics + tiny MLPs: CPU is the right backend for the whole run
        jax.config.update('jax_platforms', 'cpu')
    import omnisafe_tpu  # pylint: disable=import-outside-toplevel

    work_dir = os.path.join(args.out, '_work', tag)
    # mid-run resume: if a previous invocation of this exact cell left a
    # train_state checkpoint behind (driver killed mid-queue), continue from
    # it instead of restarting the 1e7-step run.  Epochs after the newest
    # checkpoint are replayed; the old curve up to the checkpoint is stitched
    # onto the new one so the recorded progress.csv stays a single 0..N curve.
    resume_ckpt, resume_epoch, old_rows = None, -1, []
    if not args.off_policy:
        import re  # pylint: disable=import-outside-toplevel

        ckpts = []
        for root, _dirs, files in os.walk(work_dir):
            for name in files:
                m = re.fullmatch(r'epoch-(\d+)\.msgpack', name)
                if m:
                    ckpts.append((int(m.group(1)), os.path.join(root, name)))
        if ckpts:
            resume_epoch, resume_ckpt = max(ckpts)
            old_progress = os.path.join(
                os.path.dirname(os.path.dirname(resume_ckpt)), 'progress.csv')
            with open(old_progress, encoding='utf-8') as handle:
                old_rows = [r for r in csv.DictReader(handle)
                            if float(r.get('Train/Epoch', -1)) <= resume_epoch]
            print(f'[parity] {tag}: resuming from epoch {resume_epoch} '
                  f'({resume_ckpt})', flush=True)
    if resume_ckpt is None:
        shutil.rmtree(work_dir, ignore_errors=True)
    if args.off_policy:
        # reference protocol: 1e6 transitions, 1 update per transition.
        # 16 envs x update_cycle=5 -> 80-transition cycles with 80 updates
        # (UTD 1 preserved); lambda_lr is scaled by the cycle size because
        # the lambda Adam step runs once per cycle instead of once per
        # transition (reference: ddpg_lag.py:58-66 ascends every update call).
        steps = args.steps if args.steps != 10_000_000 else 62_500
        custom = {
            'seed': args.seed,
            'train_cfgs': {'total_steps': steps,
                           'vector_env_nums': args.vector_env_nums},
            'algo_cfgs': {'steps_per_epoch': 500, 'update_cycle': 5,
                          'update_iters': 5 * args.vector_env_nums,
                          'warmup_epochs': 25,
                          # reference ring capacity is 1e6 TRANSITIONS; ours
                          # is per-env slots x num_envs
                          'size': 1_000_000 // args.vector_env_nums},
            'lagrange_cfgs': {'lambda_lr': 8.0e-4},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': work_dir,
                            'save_model_freq': 50},
        }
        if args.algo in ('DDPG', 'TD3', 'SAC'):
            custom.pop('lagrange_cfgs')
    else:
        custom = {
            'seed': args.seed,
            'train_cfgs': {'total_steps': args.steps,
                           'vector_env_nums': args.vector_env_nums},
            'logger_cfgs': {'use_tensorboard': False, 'log_dir': work_dir,
                            'save_model_freq': 100},
        }
    if resume_ckpt is not None:
        old_cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(resume_ckpt)), 'config.json')
        with open(old_cfg_path, encoding='utf-8') as handle:
            old_cfg = json.load(handle)
        per_epoch = int(old_cfg['algo_cfgs']['steps_per_epoch'])
        done_steps = (resume_epoch + 1) * per_epoch
        custom['train_cfgs']['total_steps'] = args.steps - done_steps
    agent = omnisafe_tpu.Agent(args.algo, args.env, custom_cfgs=custom)
    if resume_ckpt is not None:
        agent.agent.restore(resume_ckpt)
    ep_ret, ep_cost, ep_len = agent.learn()

    # final performance = mean over the last 10 epochs' episode windows
    run_dirs = []
    for root, _dirs, files in os.walk(work_dir):
        if 'progress.csv' in files:
            run_dirs.append(root)
    assert run_dirs, f'no progress.csv under {work_dir}'
    run_dir = sorted(run_dirs)[-1]
    with open(os.path.join(run_dir, 'progress.csv'), encoding='utf-8') as handle:
        rows = list(csv.DictReader(handle))
    if old_rows:
        for row in rows:
            row['Train/Epoch'] = str(float(row['Train/Epoch']) + resume_epoch + 1)
        rows = old_rows + rows
    tail = rows[-10:]
    final_ret = sum(float(r['Metrics/EpRet']) for r in tail) / len(tail)
    final_cost = sum(float(r['Metrics/EpCost']) for r in tail) / len(tail)
    extra = {}
    if 'Metrics/TestEpRet' in rows[-1]:
        extra['final_window_test_ret'] = sum(
            float(r['Metrics/TestEpRet']) for r in tail) / len(tail)
        extra['final_window_test_cost'] = sum(
            float(r['Metrics/TestEpCost']) for r in tail) / len(tail)

    os.makedirs(out_dir, exist_ok=True)
    if old_rows:
        fields = list(rows[-1].keys())
        with open(os.path.join(out_dir, 'progress.csv'), 'w',
                  encoding='utf-8', newline='') as handle:
            writer = csv.DictWriter(handle, fieldnames=fields, extrasaction='ignore')
            writer.writeheader()
            writer.writerows(rows)
        shutil.copy(os.path.join(run_dir, 'config.json'),
                    os.path.join(out_dir, 'config.json'))
    else:
        for name in ('progress.csv', 'config.json'):
            src = os.path.join(run_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))
    with open(summary_path, 'w', encoding='utf-8') as handle:
        json.dump({
            'algo': args.algo, 'env': args.env, 'seed': args.seed,
            'total_steps': args.steps, 'vector_env_nums': args.vector_env_nums,
            'final_window_ret': final_ret, 'final_window_cost': final_cost,
            'last_epoch_ret': ep_ret, 'last_epoch_cost': ep_cost,
            'ep_len': ep_len, **extra,
        }, handle, indent=2)
    print(f'[parity] {tag}: ret={final_ret:.2f} cost={final_cost:.2f}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
