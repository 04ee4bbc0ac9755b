"""Offline dataset: device-resident npz transitions.

Counterpart of the reference's ``OfflineDataset``/``OfflineDatasetWithInit``
(reference: omnisafe/common/offline/dataset.py:33-449).  The reference
auto-downloads hashed datasets with gdown; this environment has no egress, so
datasets are local ``.npz`` files — either collected with
:class:`omnisafe_tpu.common.offline.data_collector.OfflineDataCollector` or
provided by the user.  All fields live on device; sampling is a uniform
gather inside the jitted train step.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

FIELDS = ('obs', 'action', 'reward', 'cost', 'next_obs', 'done')


def validate_dataset(path: str) -> Dict[str, np.ndarray]:
    """Load + validate a transition ``.npz`` against the reference schema
    (field names/dtypes/shapes — reference: omnisafe/common/offline/
    dataset.py:160-180), raising with a precise message on any mismatch.

    The reference's published datasets use the SAME field names
    (``obs/action/reward/cost/next_obs/done``), so its files load directly;
    per-step scalar fields stored as ``(N, 1)`` are squeezed to ``(N,)``.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(
            f'dataset {path!r} not found; collect one with OfflineDataCollector '
            'or convert a reference npz (see README "Offline datasets")'
        )
    try:
        raw = np.load(path)
    except (ValueError, OSError) as exc:
        raise ValueError(f'{path!r} is not a readable .npz archive: {exc}') from exc
    missing = [f for f in FIELDS if f not in raw]
    if missing:
        raise ValueError(
            f'dataset {path!r} missing fields {missing}; required schema is '
            f'{list(FIELDS)} (reference: omnisafe/common/offline/dataset.py:160-166)'
        )
    out: Dict[str, np.ndarray] = {}
    n = None
    for field in FIELDS:
        arr = np.asarray(raw[field])
        if not np.issubdtype(arr.dtype, np.number) and not np.issubdtype(arr.dtype, np.bool_):
            raise ValueError(
                f'dataset field {field!r} has non-numeric dtype {arr.dtype}'
            )
        arr = arr.astype(np.float32)
        if field in ('reward', 'cost', 'done'):
            if arr.ndim == 2 and arr.shape[1] == 1:
                arr = arr[:, 0]
            if arr.ndim != 1:
                raise ValueError(
                    f'dataset field {field!r} must be (N,) or (N, 1), got {arr.shape}'
                )
        else:
            if arr.ndim != 2:
                raise ValueError(
                    f'dataset field {field!r} must be (N, dim), got shape {arr.shape}'
                )
        if n is None:
            n = arr.shape[0]
        elif arr.shape[0] != n:
            raise ValueError(
                f'dataset field {field!r} has {arr.shape[0]} transitions, '
                f'but {FIELDS[0]!r} has {n} — all fields must align'
            )
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise ValueError(f'dataset field {field!r} contains {bad} non-finite values')
        out[field] = arr
    if out['obs'].shape != out['next_obs'].shape:
        raise ValueError(
            f"obs {out['obs'].shape} and next_obs {out['next_obs'].shape} shapes differ"
        )
    if n == 0:
        raise ValueError(f'dataset {path!r} is empty')
    return out


class OfflineDataset:
    """npz-backed transition dataset."""

    def __init__(self, dataset: str, batch_size: int = 256) -> None:
        path = dataset if dataset.endswith('.npz') else f'{dataset}.npz'
        arrays = validate_dataset(path)
        self.data: Dict[str, Array] = {f: jnp.asarray(a) for f, a in arrays.items()}
        self.size = int(self.data['obs'].shape[0])
        self.batch_size = batch_size
        self.obs_dim = int(self.data['obs'].shape[-1])
        self.act_dim = int(self.data['action'].shape[-1])

    def sample(self, key: Array) -> Tuple[Array, ...]:
        """Uniform batch: (obs, action, reward, cost, next_obs, done)
        (reference: dataset.py:230-260)."""
        idx = jax.random.randint(key, (self.batch_size,), 0, self.size)
        return tuple(self.data[f][idx] for f in FIELDS)


class OfflineDatasetWithInit(OfflineDataset):
    """Adds per-sample episode-initial observations for COptiDICE
    (reference: dataset.py:300-449).  If the npz lacks ``init_obs`` it is
    reconstructed from episode boundaries (done flags)."""

    def __init__(self, dataset: str, batch_size: int = 256) -> None:
        super().__init__(dataset, batch_size)
        path = dataset if dataset.endswith('.npz') else f'{dataset}.npz'
        raw = np.load(path)
        if 'init_obs' in raw:
            init_obs = np.asarray(raw['init_obs'], np.float32)
        else:
            obs = np.asarray(raw['obs'], np.float32)
            done = np.asarray(raw['done'], np.float32).reshape(-1)
            init_obs = np.empty_like(obs)
            current = obs[0]
            for i in range(obs.shape[0]):
                init_obs[i] = current
                if done[i] > 0.5 and i + 1 < obs.shape[0]:
                    current = obs[i + 1]
        self.data['init_obs'] = jnp.asarray(init_obs)

    def sample(self, key: Array) -> Tuple[Array, ...]:
        idx = jax.random.randint(key, (self.batch_size,), 0, self.size)
        fields = FIELDS + ('init_obs',)
        return tuple(self.data[f][idx] for f in fields)


__all__ = ['OfflineDataset', 'OfflineDatasetWithInit', 'FIELDS', 'validate_dataset']
