"""Run the REFERENCE implementation on shimmed real-physics velocity tasks.

Round-5 VERDICT item 1: instrument a side-by-side of the repo's and the
reference's λ/Jc trajectories on the same physics.  The reference's torch
code runs on CPU in this image; safety_gymnasium is replaced by the shim in
benchmarks/ref_shim (same stock MuJoCo v4 physics + velocity cost the repo's
host envs step).

Usage: python benchmarks/ref_run.py --algo SACLag --seed 0 \
           [--env SafetyHalfCheetahVelocity-v1] [--steps 1000000]

Writes the reference's own run dir (progress.csv with Metrics/EpCost,
Metrics/LagrangeMultiplier, Metrics/TestEpRet/TestEpCost) under
benchmarks/ref_runs/.
"""

from __future__ import annotations

import argparse
import os
import sys
import types

# stub the moviepy-dependent gymnasium helper the reference imports
_stub = types.ModuleType('gymnasium.utils.save_video')
_stub.save_video = lambda *a, **k: None
sys.modules['gymnasium.utils.save_video'] = _stub
# stub wandb (imported unconditionally by the reference logger; unused with
# use_wandb=False)
_wandb = types.ModuleType('wandb')
_wandb.init = lambda *a, **k: None
_wandb.log = lambda *a, **k: None
_wandb.finish = lambda *a, **k: None
sys.modules['wandb'] = _wandb
# stub pytorch_lightning (CRABS-only in the reference; not exercised here,
# but its modules subclass pl.LightningModule at import time)
_pl = types.ModuleType('pytorch_lightning')


class _LightningModule:
    def __init__(self, *a, **k):
        pass

    def save_hyperparameters(self, *a, **k):
        pass


import torch as _torch  # noqa: E402

_pl.LightningModule = type('LightningModule', (_torch.nn.Module,),
                           {'save_hyperparameters': lambda self, *a, **k: None})
_pl.Trainer = lambda *a, **k: types.SimpleNamespace(fit=lambda *a2, **k2: None)
sys.modules['pytorch_lightning'] = _pl
# gdown (offline dataset download helper) — never called here
_gdown = types.ModuleType('gdown')
_gdown.download = lambda *a, **k: None
sys.modules['gdown'] = _gdown
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), 'ref_shim'))
sys.path.insert(0, '/root/reference')


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--algo', default='SACLag')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--env', default='SafetyHalfCheetahVelocity-v1')
    parser.add_argument('--steps', type=int, default=1_000_000)
    parser.add_argument('--torch-threads', type=int, default=2)
    args = parser.parse_args()

    import omnisafe  # noqa: E402  (reference package)

    log_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'ref_runs',
        f'{args.algo}-{args.env}-seed{args.seed}',
    )
    custom_cfgs = {
        'seed': args.seed,
        'train_cfgs': {'total_steps': args.steps,
                       'torch_threads': args.torch_threads},
        'logger_cfgs': {'use_tensorboard': False, 'use_wandb': False,
                        'log_dir': log_dir},
    }
    agent = omnisafe.Agent(args.algo, args.env, custom_cfgs=custom_cfgs)
    ret, cost, length = agent.learn()
    print(f'[ref] {args.algo} seed {args.seed}: ret={ret:.2f} cost={cost:.2f} '
          f'len={length:.1f}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
