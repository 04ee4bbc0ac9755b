"""Key-registry logger: register → store → dump cycle.

Counterpart of the reference Logger (reference: omnisafe/common/logger.py:
52-389): registered keys with windowed statistics, a printed table per epoch,
``progress.csv``, optional TensorBoard scalars, a ``config.json`` snapshot,
and checkpointing.  Differences: checkpoints are orbax/msgpack pytrees instead
of ``torch_save/epoch-N.pt``, and there is no rank gating — in the TPU design
a multi-host launcher runs one logger on process 0 only.
"""

from __future__ import annotations

import csv
import json
import os
import time
from collections import deque
from typing import Any, Deque, Dict, List, Optional, Tuple

import numpy as np


class Logger:
    """Windowed-statistics logger with csv/tensorboard sinks."""

    def __init__(
        self,
        output_dir: str,
        exp_name: str,
        seed: int = 0,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_project: str = 'omnisafe_tpu',
        verbose: bool = False,
        use_profiler: bool = False,
        config: Any = None,
    ) -> None:
        self._log_dir = os.path.join(output_dir, exp_name, f'seed-{seed:03d}-{int(time.time())}')
        try:  # one run dir per process under multi-process launch
            import jax  # pylint: disable=import-outside-toplevel
        except ImportError:  # pragma: no cover - jax optional at this layer
            pass
        else:
            # a real failure here (e.g. broken distributed init) must
            # surface — swallowing it would let ranks share one run dir
            if jax.process_count() > 1:
                self._log_dir = os.path.join(self._log_dir, f'rank{jax.process_index()}')
        os.makedirs(self._log_dir, exist_ok=True)
        self._epoch = 0
        self._first_row = True
        self._what_to_save: Optional[Dict[str, Any]] = None
        self._data: Dict[str, Deque[float] | List[float]] = {}
        self._headers_windows: Dict[str, Optional[int]] = {}
        self._headers_minmax: Dict[str, bool] = {}
        self._headers_delta: Dict[str, bool] = {}
        self._current_row: Dict[str, float] = {}
        self._csv_file = open(os.path.join(self._log_dir, 'progress.csv'), 'w', newline='')
        self._csv_writer = csv.writer(self._csv_file)

        if config is not None:
            with open(os.path.join(self._log_dir, 'config.json'), 'w', encoding='utf-8') as f:
                if hasattr(config, 'tojson'):
                    f.write(config.tojson())
                else:
                    json.dump(config, f, indent=2, default=str)

        self._tb_writer = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # pylint: disable=import-outside-toplevel

                self._tb_writer = SummaryWriter(log_dir=os.path.join(self._log_dir, 'tb'))
            except Exception:  # pragma: no cover - tensorboard optional
                self._tb_writer = None
        # optional wandb sink: used when the package is importable (this image
        # has no egress, so absence is the normal case and is only warned once)
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # pylint: disable=import-outside-toplevel

                self._wandb = wandb.init(
                    project=wandb_project,
                    name=f'{exp_name}-seed{seed}',
                    dir=self._log_dir,
                    config=config.todict() if hasattr(config, 'todict') else config,
                )
            except Exception as exc:  # pragma: no cover - wandb optional
                print(f'[logger] wandb requested but unavailable ({exc!r}); '
                      'continuing with csv/tensorboard only', flush=True)
        self._verbose = verbose
        self._use_profiler = use_profiler
        self._profiling = False

    @property
    def log_dir(self) -> str:
        return self._log_dir

    def set_epoch(self, epoch: int) -> None:
        """Seed the epoch counter for mid-training resume so checkpoint names
        (``epoch-N``) and TB/wandb step axes continue the GLOBAL epoch
        numbering instead of restarting at 0."""
        self._epoch = int(epoch)

    # -- key registry -----------------------------------------------------
    def register_key(
        self,
        key: str,
        window_length: Optional[int] = None,
        min_and_max: bool = False,
        delta: bool = False,
    ) -> None:
        """(reference: logger.py:196-252)."""
        assert key not in self._headers_windows, f'key {key} already registered'
        self._data[key] = deque(maxlen=window_length) if window_length else []
        self._headers_windows[key] = window_length
        self._headers_minmax[key] = min_and_max
        self._headers_delta[key] = delta

    def store(self, **kwargs: Any) -> None:
        for key, val in kwargs.items():
            assert key in self._data, f'key {key} was not registered'
            arr = np.asarray(val, dtype=np.float64).reshape(-1)
            self._data[key].extend(arr.tolist())

    def get_stats(self, key: str) -> Tuple[float, float, float, float]:
        """mean/std/min/max over the current window (reference: logger.py:344-374)."""
        vals = np.asarray(self._data[key], dtype=np.float64)
        if vals.size == 0:
            return 0.0, 0.0, 0.0, 0.0
        return float(vals.mean()), float(vals.std()), float(vals.min()), float(vals.max())

    # -- epoch dump ---------------------------------------------------------
    def _print_table(self, row: Dict[str, float]) -> None:
        """Rich console table like the reference's per-epoch dump
        (reference: logger.py:284-319); falls back to plain text."""
        try:
            from rich.console import Console  # pylint: disable=import-outside-toplevel
            from rich.table import Table  # pylint: disable=import-outside-toplevel

            table = Table(title=f'Epoch {self._epoch}', show_header=True,
                          header_style='bold')
            table.add_column('Metrics', style='cyan')
            table.add_column('Value', justify='right')
            for key, val in row.items():
                table.add_row(key, f'{val:.6g}')
            Console().print(table)
        except Exception:  # pragma: no cover - rich optional
            width = max((len(k) for k in row), default=10)
            lines = [f'{"-" * (width + 18)}']
            for key, val in row.items():
                lines.append(f'| {key:<{width}} | {val:13.6g} |')
            lines.append(f'{"-" * (width + 18)}')
            print('\n'.join(lines), flush=True)

    def _profiler_hook(self) -> None:
        """Capture a jax profiler trace of epochs 2-3 into the run dir
        (SURVEY §5: the reference has wall-clock timers only; a real trace
        is the TPU-native upgrade)."""
        import jax  # pylint: disable=import-outside-toplevel

        if self._epoch == 1 and not self._profiling:
            jax.profiler.start_trace(os.path.join(self._log_dir, 'profile'))
            self._profiling = True
        elif self._epoch == 3 and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False

    def dump_tabular(self, verbose: Optional[bool] = None) -> Dict[str, float]:
        row: Dict[str, float] = {}
        for key in self._headers_windows:
            mean, std, vmin, vmax = self.get_stats(key)
            row[key] = mean
            if self._headers_minmax[key]:
                row[f'{key}/Min'] = vmin
                row[f'{key}/Max'] = vmax
                row[f'{key}/Std'] = std
        self._epoch += 1
        if self._first_row:
            self._csv_writer.writerow(list(row))
            self._first_row = False
        self._csv_writer.writerow([row[k] for k in row])
        self._csv_file.flush()
        if self._tb_writer is not None:
            for key, val in row.items():
                self._tb_writer.add_scalar(key, val, self._epoch)
            self._tb_writer.flush()
        if self._wandb is not None:
            self._wandb.log(row, step=self._epoch)
        if self._verbose if verbose is None else verbose:
            self._print_table(row)
        if self._use_profiler:
            self._profiler_hook()
        # windowed keys persist across epochs; unwindowed keys reset
        for key in self._data:
            if self._headers_windows[key] is None:
                self._data[key] = []
        return row

    # -- checkpointing ------------------------------------------------------
    def setup_saver(self, what_to_save: Dict[str, Any]) -> None:
        """(reference: logger.py:175-182)."""
        self._what_to_save = what_to_save

    def save(self, tag: Optional[str] = None) -> str:
        """Serialize registered pytrees with flax msgpack
        (reference: logger.py:184-194 — torch_save/epoch-N.pt)."""
        assert self._what_to_save is not None, 'call setup_saver first'
        from flax import serialization  # pylint: disable=import-outside-toplevel
        import jax  # pylint: disable=import-outside-toplevel

        save_dir = os.path.join(self._log_dir, 'save')
        os.makedirs(save_dir, exist_ok=True)
        tag = tag if tag is not None else f'epoch-{self._epoch}'
        path = os.path.join(save_dir, f'{tag}.msgpack')
        def materialize(val):
            val = val() if callable(val) else val
            # PRNG keys can't serialize; store their raw uint32 data
            val = jax.tree.map(
                lambda leaf: jax.random.key_data(leaf)
                if hasattr(leaf, 'dtype') and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
                else leaf,
                val,
            )
            return serialization.to_state_dict(jax.device_get(val))

        payload = {key: materialize(val) for key, val in self._what_to_save.items()}
        with open(path, 'wb') as f:
            f.write(serialization.msgpack_serialize(payload))
        return path

    def close(self) -> None:
        if self._profiling:  # trace still open (run shorter than 3 epochs)
            import jax  # pylint: disable=import-outside-toplevel

            jax.profiler.stop_trace()
            self._profiling = False
        self._csv_file.close()
        if self._tb_writer is not None:
            self._tb_writer.close()
        if self._wandb is not None:
            self._wandb.finish()


__all__ = ['Logger']
