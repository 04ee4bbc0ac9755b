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


class OfflineDataset:
    """npz-backed transition dataset."""

    def __init__(self, dataset: str, batch_size: int = 256) -> None:
        path = dataset if dataset.endswith('.npz') else f'{dataset}.npz'
        if not os.path.exists(path):
            raise FileNotFoundError(
                f'dataset {path!r} not found; collect one with OfflineDataCollector'
            )
        raw = np.load(path)
        missing = [f for f in FIELDS if f not in raw]
        if missing:
            raise ValueError(f'dataset {path!r} missing fields {missing}')
        self.data: Dict[str, Array] = {
            f: jnp.asarray(raw[f], jnp.float32) for f in FIELDS
        }
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


__all__ = ['OfflineDataset', 'OfflineDatasetWithInit', 'FIELDS']
