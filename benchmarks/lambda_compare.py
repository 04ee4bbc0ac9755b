"""Side-by-side λ/Jc trajectory comparison: our off-policy Lag cell vs the
REFERENCE implementation run on the same physics (VERDICT round-5 item 1).

The reference run comes from ``benchmarks/ref_run.py`` (torch CPU, shimmed
safety_gymnasium over stock MuJoCo v4); ours from a
``benchmarks/parity_run.py --off-policy`` work dir.  Both log
Metrics/LagrangeMultiplier, Metrics/EpCost, Metrics/TestEpRet/TestEpCost per
epoch; this tool aligns the two on TotalEnvSteps and prints matched rows plus
settle diagnostics (λ peak, λ drift rate in the post-safe phase, cost
recrossings of the limit).

Usage: python benchmarks/lambda_compare.py --algo SACLag --seed 0 \
           [--ours-tag SACLag-SafetyHalfCheetahVelocity-v1-mujoco-seed0]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load_rows(pattern: str):
    paths = sorted(glob.glob(pattern))
    if not paths:
        return []
    by_step = {}
    for path in paths:
        with open(path, encoding='utf-8') as handle:
            for row in csv.DictReader(handle):
                try:
                    step = int(float(row['TotalEnvSteps']))
                except (KeyError, TypeError, ValueError):
                    continue
                by_step[step] = row
    return [by_step[s] for s in sorted(by_step)]


def f(row, key, default=float('nan')):
    try:
        return float(row[key])
    except (KeyError, TypeError, ValueError):
        return default


def nearest(rows, step):
    return min(rows, key=lambda r: abs(int(float(r['TotalEnvSteps'])) - step))


def diagnostics(rows, limit: float):
    """λ peak, post-peak drift, and training-cost recrossings of the limit."""
    lam = [(int(float(r['TotalEnvSteps'])), f(r, 'Metrics/LagrangeMultiplier'))
           for r in rows]
    cost = [(int(float(r['TotalEnvSteps'])), f(r, 'Metrics/EpCost')) for r in rows]
    if not lam:
        return {}
    peak_step, peak = max(lam, key=lambda t: t[1])
    tail = [v for s, v in lam if s >= peak_step]
    drift = (tail[-1] - tail[0]) / max(len(tail) - 1, 1) if len(tail) > 1 else 0.0
    # count sign changes of (EpCost - limit) after the first time cost
    # exceeds the limit (ignore the pre-violation ramp)
    started = False
    crossings = 0
    prev_side = None
    for _s, c in cost:
        side = c > limit
        if side:
            started = True
        if started and prev_side is not None and side != prev_side:
            crossings += 1
        if started:
            prev_side = side
    return {
        'lambda_final': lam[-1][1],
        'lambda_peak': peak,
        'lambda_peak_step': peak_step,
        'lambda_drift_per_epoch_after_peak': drift,
        'cost_limit_recrossings': crossings,
        'final_ep_cost': cost[-1][1],
        'final_step': lam[-1][0],
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--algo', default='SACLag')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--env', default='SafetyHalfCheetahVelocity-v1')
    parser.add_argument('--ours-tag', default=None)
    parser.add_argument('--limit', type=float, default=25.0)
    parser.add_argument('--every', type=int, default=50_000)
    parser.add_argument('--json-out', default=None)
    args = parser.parse_args()

    ours_tag = args.ours_tag or f'{args.algo}-{args.env}-mujoco-seed{args.seed}'
    ours = load_rows(os.path.join(
        HERE, 'parity', '_work', ours_tag, '**', 'progress.csv').replace('**', '*/*'))
    ref = load_rows(os.path.join(
        HERE, 'ref_runs', f'{args.algo}-{args.env}-seed{args.seed}', '**',
        'progress.csv'))
    if not ref:
        ref = load_rows(os.path.join(
            HERE, 'ref_runs', f'{args.algo}-{args.env}-seed{args.seed}', '*', '*',
            'progress.csv'))
    if not ours or not ref:
        print(f'missing data: ours={len(ours)} rows, ref={len(ref)} rows')
        return 1

    max_step = min(int(float(ours[-1]['TotalEnvSteps'])),
                   int(float(ref[-1]['TotalEnvSteps'])))
    print(f'{"step":>9} | {"ref λ":>8} {"ref Jc":>8} {"ref TRet":>8} {"ref TCost":>9} '
          f'| {"our λ":>8} {"our Jc":>8} {"our TRet":>8} {"our TCost":>9}')
    for step in range(args.every, max_step + 1, args.every):
        a, b = nearest(ref, step), nearest(ours, step)
        print(f'{step:>9} | {f(a,"Metrics/LagrangeMultiplier"):>8.3f} '
              f'{f(a,"Metrics/EpCost"):>8.1f} {f(a,"Metrics/TestEpRet"):>8.0f} '
              f'{f(a,"Metrics/TestEpCost"):>9.1f} '
              f'| {f(b,"Metrics/LagrangeMultiplier"):>8.3f} '
              f'{f(b,"Metrics/EpCost"):>8.1f} {f(b,"Metrics/TestEpRet"):>8.0f} '
              f'{f(b,"Metrics/TestEpCost"):>9.1f}')

    out = {
        'algo': args.algo, 'seed': args.seed,
        'compared_to_step': max_step,
        'ref': diagnostics(ref, args.limit),
        'ours': diagnostics(ours, args.limit),
    }
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, 'w', encoding='utf-8') as handle:
            json.dump(out, handle, indent=2)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
