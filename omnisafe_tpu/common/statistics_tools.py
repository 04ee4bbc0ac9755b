"""Grid-result analysis across hyperparameter values.

Counterpart of the reference's ``StatisticsTools`` (reference:
omnisafe/common/statistics_tools.py:29-433): reads a grid directory's
``grid_config.json`` + per-variant ``progress.csv`` files and compares a
chosen parameter's values on a shared plot.
"""

from __future__ import annotations

import csv
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np


class StatisticsTools:
    """Compare grid variants along one parameter."""

    def __init__(self) -> None:
        self._exp_dir: Optional[str] = None
        self.grid_config: Optional[Dict] = None

    def load_source(self, exp_dir: str) -> None:
        """(reference: statistics_tools.py:54-92)."""
        path = os.path.join(exp_dir, 'grid_config.json')
        if not os.path.exists(path):
            raise FileNotFoundError(f'no grid_config.json under {exp_dir}')
        with open(path, encoding='utf-8') as f:
            self.grid_config = json.load(f)
        self._exp_dir = exp_dir

    def _collect_runs(self) -> List[Tuple[str, List[Dict[str, str]]]]:
        runs = []
        for root, _, files in os.walk(self._exp_dir):
            if 'progress.csv' in files:
                with open(os.path.join(root, 'progress.csv'), encoding='utf-8') as f:
                    rows = list(csv.DictReader(f))
                runs.append((os.path.relpath(root, self._exp_dir), rows))
        return runs

    # pylint: disable-next=too-many-locals
    def draw_graph(
        self,
        parameter: str,
        values: Optional[List] = None,
        compare_num: Optional[int] = None,
        costs: bool = True,
        cost_limit: Optional[float] = None,
        save_name: str = 'compare.png',
        smooth: int = 1,
    ) -> str:
        """Compare runs grouped by the chosen parameter's values
        (reference: statistics_tools.py:94-170).

        ``values`` filters to specific values; ``compare_num`` compares only
        the first N grid values (mutually exclusive, like the reference's
        ``values``/``compare_num`` arguments).
        """
        assert self.grid_config is not None, 'call load_source first'
        assert values is None or compare_num is None, (
            'values and compare_num are mutually exclusive '
            '(reference: statistics_tools.py:106-118)'
        )
        keys = self.grid_config['keys']
        vals = self.grid_config['vals']
        if parameter not in keys:
            raise KeyError(f'{parameter} not in grid keys {keys}')
        param_vals = values or vals[keys.index(parameter)]
        if compare_num is not None:
            assert compare_num <= len(param_vals), (
                f'compare_num ({compare_num}) exceeds the {len(param_vals)} '
                f'grid values of {parameter}'
            )
            param_vals = param_vals[:compare_num]

        # group run dirs by which value appears in the variant name
        short = ''.join(w[:3] for w in parameter.split(':')[-1].split('_'))
        groups: Dict[str, List] = defaultdict(list)
        for rel, rows in self._collect_runs():
            for val in param_vals:
                sval = str(val).replace(' ', '').replace('[', '').replace(']', '').replace(',', '-')
                if f'{short}_{sval}' in rel:
                    groups[str(val)].append(rows)
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt  # pylint: disable=import-outside-toplevel

        ncols = 2 if costs else 1
        fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 4.5), squeeze=False)
        def smoothed(curve: List[float]) -> np.ndarray:
            arr = np.asarray(curve, dtype=np.float64)
            if smooth > 1 and arr.size:
                kernel = np.ones(smooth)
                den = np.convolve(np.ones_like(arr), kernel, mode='same')
                arr = np.convolve(arr, kernel, mode='same') / den
            return arr

        for val, runs in sorted(groups.items()):
            curves_r, curves_c = [], []
            for rows in runs:
                curves_r.append([float(r.get('Metrics/EpRet', 0.0)) for r in rows])
                if costs:
                    curves_c.append([float(r.get('Metrics/EpCost', 0.0)) for r in rows])
            n = min(map(len, curves_r))
            mean_r = smoothed(np.mean([c[:n] for c in curves_r], axis=0))
            axes[0][0].plot(mean_r, label=f'{parameter}={val}')
            if costs and curves_c:
                mean_c = smoothed(np.mean([c[:n] for c in curves_c], axis=0))
                axes[0][1].plot(mean_c, label=f'{parameter}={val}')
        axes[0][0].set_title('Metrics/EpRet')
        axes[0][0].legend(fontsize=7)
        if costs:
            if cost_limit is not None:
                axes[0][1].axhline(cost_limit, color='k', ls='--', lw=1,
                                   label=f'cost_limit={cost_limit}')
            axes[0][1].set_title('Metrics/EpCost')
            axes[0][1].legend(fontsize=7)
        path = os.path.join(self._exp_dir, save_name)
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def draw_all(self, costs: bool = True, cost_limit: Optional[float] = None,
                 smooth: int = 1) -> List[str]:
        """One comparison figure per swept parameter — the grid-config-driven
        draw path (reference: statistics_tools.py:70-92 walks the grid config
        to decide what to draw)."""
        assert self.grid_config is not None, 'call load_source first'
        out = []
        for key, vals in zip(self.grid_config['keys'], self.grid_config['vals']):
            if key in ('algo', 'env_id') or len(vals) < 2:
                continue
            safe = key.replace(':', '_')
            out.append(self.draw_graph(
                parameter=key, costs=costs, cost_limit=cost_limit,
                smooth=smooth, save_name=f'compare_{safe}.png',
            ))
        return out


__all__ = ['StatisticsTools']
