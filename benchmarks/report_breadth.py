#!/usr/bin/env python
"""Assemble the parity-cell results table against the reference's published
bands (benchmarks/on-policy/README.md tables at :470/:770/:1070/:1370/:1669,
off-policy README tables 2-3; values parsed from the reference HTML tables).

Usage: python benchmarks/report_breadth.py [--md]
"""

from __future__ import annotations

import glob
import json
import os
import sys

PARITY = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'parity')

# (reward mean, reward std, cost mean, cost std) — reference published rows.
# None => the reference publishes no row for this algo/env.
REF = {
    'SafetyHalfCheetahVelocity-v1-mujoco': {
        'PolicyGradient': (5188.46, 1202.76, 896.55, 184.7),
        'NaturalPG': (5878.28, 2012.24, 847.74, 249.02),
        'TRPO': (6490.76, 2507.18, 734.26, 321.88),
        'PPO': (6921.83, 1721.79, 919.2, 173.08),
        'RCPO': (2440.97, 451.88, 9.02, 9.34),
        'TRPOLag': (2884.68, 77.47, 9.04, 11.83),
        'PPOLag': (2946.15, 306.35, 3.44, 4.77),
        'P3O': (2117.84, 313.55, 27.6, 8.36),
        'CUP': (2850.6, 244.65, 4.27, 4.46),
        'PCPO': (1677.93, 217.31, 19.06, 15.26),
        'FOCOPS': (2965.2, 290.43, 2.37, 3.5),
        'CPO': (2786.48, 173.45, 4.70, 6.72),
        'PPOSaute': (2901.40, 25.49, 16.20, 0.60),
        'TRPOSaute': (2521.80, 477.29, 7.61, 0.39),
        'PPOSimmerPID': (2922.17, 24.84, 16.14, 0.14),
        'TRPOSimmerPID': (2737.79, 37.53, 16.44, 0.21),
        'CPPOPID': (2837.89, 398.52, 8.06, 9.62),
        'TRPOPID': (2796.75, 190.84, 11.16, 9.80),
        'PPOEarlyTerminated': (2447.25, 346.84, 3.47, 4.90),
        'TRPOEarlyTerminated': (2555.70, 368.17, 0.06, 0.08),
        'PDO': None, 'IPO': None, 'OnCRPO': None,
        # off-policy (README tables 2-3, 1e6 transitions)
        'DDPG': (11377.10, 75.29, 980.93, 1.05),
        'TD3': (11246.12, 488.62, 981.27, 0.31),
        'SAC': (11488.86, 513.09, 981.93, 0.33),
        'DDPGLag': (2743.06, 21.77, 0.33, 0.12),
        'TD3Lag': (2741.08, 49.13, 10.47, 14.45),
        'SACLag': (2833.72, 3.62, 0.00, 0.00),
        'DDPGPID': (2737.61, 45.93, 36.10, 11.03),
        'TD3PID': (2695.64, 29.42, 35.93, 14.03),
        'SACPID': (2689.01, 15.46, 21.43, 5.49),
    },
    'SafetyWalker2dVelocity-v1-mujoco': {
        'PolicyGradient': (4832.34, 685.76, 866.59, 93.47),
        'NaturalPG': (5347.35, 436.86, 914.74, 32.61),
        'TRPO': (6096.67, 723.06, 914.46, 27.85),
        'PPO': (6239.52, 879.99, 902.68, 100.93),
        'RCPO': (3064.43, 218.83, 3.02, 1.48),
        'TRPOLag': (3207.10, 7.88, 14.98, 9.27),
        'PPOLag': (2982.27, 681.55, 13.49, 14.55),
        'P3O': (2713.57, 313.2, 20.51, 14.09),
        'CUP': (2466.95, 1114.13, 6.63, 8.25),
        'PCPO': (1802.86, 714.04, 18.82, 5.57),
        'FOCOPS': (3117.05, 53.60, 8.78, 12.38),
        'CPO': (2074.76, 962.45, 21.90, 9.41),
        'PPOSaute': (2410.89, 241.22, 18.88, 2.38),
        'TRPOSaute': (2548.82, 891.65, 13.21, 6.09),
        'PPOSimmerPID': (3187.56, 32.66, 17.10, 0.49),
        'TRPOSimmerPID': (3156.99, 30.93, 17.14, 0.54),
        'CPPOPID': (2183.43, 1300.69, 14.12, 10.28),
        'TRPOPID': (2707.75, 980.56, 9.60, 8.94),
        'PPOEarlyTerminated': (2195.57, 1046.29, 7.63, 10.44),
        'TRPOEarlyTerminated': (2079.64, 1028.73, 13.74, 15.94),
    },
}

COST_LIMIT = 25.0
UNCONSTRAINED = {'PolicyGradient', 'NaturalPG', 'TRPO', 'PPO', 'DDPG', 'TD3', 'SAC'}


def main() -> int:
    rows = []
    for path in sorted(glob.glob(os.path.join(PARITY, '*', 'summary.json'))):
        cell = os.path.basename(os.path.dirname(path))
        if cell.startswith('archive'):
            continue
        with open(path, encoding='utf-8') as handle:
            s = json.load(handle)
        algo, env, seed = s['algo'], s['env'], s['seed']
        ret, cost = s.get('final_eval_ret'), s.get('final_eval_cost')
        if ret is None:
            continue
        ref = (REF.get(env) or {}).get(algo)
        suffix = cell.split(f'seed{seed}', 1)[-1]
        if ref is None:
            verdict = 'no published row'
            band = '—'
        else:
            rm, rs, cm, cs = ref
            band = f'{rm:.2f} ± {rs:.2f} / {cm:.2f} ± {cs:.2f}'
            in_r = abs(ret - rm) <= max(2 * rs, 0.1 * abs(rm))
            ok_c = (cost <= COST_LIMIT + 1e-9) or algo in UNCONSTRAINED
            verdict = ('IN BAND' if in_r and ok_c else
                       'reward out of band' if not in_r else 'cost>limit')
        rows.append((env, algo, seed, suffix, ret, cost, band, verdict))
    rows.sort()
    print('| Env | Algo | Seed | eval reward | eval cost | reference (r/c) | verdict |')
    print('|---|---|---|---|---|---|---|')
    for env, algo, seed, suffix, ret, cost, band, verdict in rows:
        short_env = env.replace('Safety', '').replace('Velocity-v1-mujoco', '')
        print(f'| {short_env} | {algo}{suffix} | {seed} | {ret:.1f} | {cost:.1f} '
              f'| {band} | {verdict} |')
    return 0


if __name__ == '__main__':
    sys.exit(main())
