"""Training-curve plotting from progress.csv files.

Counterpart of the reference Plotter (reference:
omnisafe/utils/plotter.py:31-389): smoothed reward/cost curves with an
optional cost-limit line, aggregated across seeds into mean ± std bands
(the reference uses seaborn's tsplot/lineplot styling with
``estimator=mean`` + std error band; same content via matplotlib, no
extra dep).  Each entry of ``all_logdirs`` is one *condition* — every
``progress.csv`` found beneath it is one seed of that condition.
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional, Tuple

import numpy as np


def _smooth(values: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 1 or len(values) < radius:
        return values
    kernel = np.ones(radius) / radius
    return np.convolve(values, kernel, mode='valid')


def _load_runs(logdir: str, xaxis: str, keys: List[str], smooth: int
               ) -> List[Tuple[np.ndarray, List[np.ndarray]]]:
    """One ``(x, [series per key])`` tuple per progress.csv under logdir."""
    csv_paths = []
    for root, _, files in os.walk(logdir):
        if 'progress.csv' in files:
            csv_paths.append(os.path.join(root, 'progress.csv'))
    if not csv_paths:
        raise FileNotFoundError(f'no progress.csv under {logdir}')
    runs = []
    for path in sorted(csv_paths):
        with open(path, encoding='utf-8') as f:
            rows = list(csv.DictReader(f))
        if not rows:
            continue
        x = np.asarray([float(r.get(xaxis, i)) for i, r in enumerate(rows)])
        series = []
        for key in keys:
            vals = _smooth(
                np.asarray([float(r.get(key, 0.0) or 0.0) for r in rows]), smooth
            )
            series.append(vals)
        n = min(len(s) for s in series)
        runs.append((x[:n], [s[:n] for s in series]))
    return runs


def _band(runs: List[Tuple[np.ndarray, List[np.ndarray]]], key_idx: int
          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Interpolate every seed onto a shared x grid; return (x, mean, std).

    The reference hands seaborn long-form data and lets ``sns.lineplot``
    aggregate rows sharing an x value (reference: plotter.py:95-118); with
    differing step grids across resumes we interpolate instead.
    """
    lo = max(float(r[0][0]) for r in runs)
    hi = min(float(r[0][-1]) for r in runs)
    grid = np.linspace(lo, hi, 256)
    mat = np.stack([np.interp(grid, r[0], r[1][key_idx]) for r in runs])
    return grid, mat.mean(axis=0), mat.std(axis=0)


class Plotter:
    """Plot one or many conditions (each possibly multi-seed) onto shared axes."""

    # pylint: disable-next=too-many-arguments,too-many-locals
    def make_plots(
        self,
        all_logdirs: List[str],
        legend: Optional[List[str]] = None,
        xaxis: str = 'TotalEnvSteps',
        value: str = 'Metrics/EpRet',
        cost_limit: Optional[float] = None,
        smooth: int = 1,
        save_name: str = 'plot.png',
    ) -> str:
        """(reference: plotter.py:60-200)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt  # pylint: disable=import-outside-toplevel

        fig, (ax_r, ax_c) = plt.subplots(1, 2, figsize=(12, 4.5))
        labels = legend or [os.path.basename(os.path.normpath(d)) for d in all_logdirs]
        for logdir, label in zip(all_logdirs, labels):
            runs = _load_runs(logdir, xaxis, [value, 'Metrics/EpCost'], smooth)
            if not runs:
                continue
            if len(runs) == 1:
                x, (rew, cost) = runs[0]
                ax_r.plot(x, rew, label=label)
                ax_c.plot(x, cost, label=label)
                continue
            for ax, idx in ((ax_r, 0), (ax_c, 1)):
                grid, mean, std = _band(runs, idx)
                line, = ax.plot(grid, mean, label=f'{label} (n={len(runs)})')
                ax.fill_between(grid, mean - std, mean + std,
                                color=line.get_color(), alpha=0.2, linewidth=0)
        if cost_limit is not None:
            ax_c.axhline(cost_limit, color='k', ls='--', label='cost limit')
        ax_r.set_xlabel(xaxis)
        ax_r.set_ylabel(value)
        ax_r.set_title('Episode Reward')
        ax_c.set_xlabel(xaxis)
        ax_c.set_ylabel('Metrics/EpCost')
        ax_c.set_title('Episode Cost')
        ax_r.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(save_name, dpi=120)
        plt.close(fig)
        return save_name


__all__ = ['Plotter']
