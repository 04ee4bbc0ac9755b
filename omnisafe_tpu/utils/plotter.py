"""Training-curve plotting from progress.csv files.

Counterpart of the reference Plotter (reference:
omnisafe/utils/plotter.py:31-389): smoothed reward/cost curves with an
optional cost-limit line, aggregated over seeds, via matplotlib (the
reference uses seaborn's tsplot styling; same content, no extra dep).
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional

import numpy as np


def _smooth(values: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 1 or len(values) < radius:
        return values
    kernel = np.ones(radius) / radius
    return np.convolve(values, kernel, mode='valid')


class Plotter:
    """Plot one or many run directories onto shared axes."""

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
            csv_paths = []
            for root, _, files in os.walk(logdir):
                if 'progress.csv' in files:
                    csv_paths.append(os.path.join(root, 'progress.csv'))
            if not csv_paths:
                raise FileNotFoundError(f'no progress.csv under {logdir}')
            for path in csv_paths:
                with open(path, encoding='utf-8') as f:
                    rows = list(csv.DictReader(f))
                if not rows:
                    continue
                x = np.asarray([float(r.get(xaxis, i)) for i, r in enumerate(rows)])
                rew = _smooth(np.asarray([float(r[value]) for r in rows]), smooth)
                cost = _smooth(
                    np.asarray([float(r.get('Metrics/EpCost', 0.0)) for r in rows]), smooth
                )
                n = len(rew)
                ax_r.plot(x[:n], rew, label=label)
                ax_c.plot(x[:n], cost, label=label)
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
