"""Offline dataset schema validation (reference analogue:
omnisafe/common/offline/dataset.py:160-180 + tests/test_offline_data.py)."""

import numpy as np
import pytest

from omnisafe_tpu.common.offline.dataset import (
    FIELDS,
    OfflineDataset,
    OfflineDatasetWithInit,
    validate_dataset,
)


def _good(n=32, obs_dim=3, act_dim=2):
    return {
        'obs': np.random.randn(n, obs_dim).astype(np.float32),
        'action': np.random.randn(n, act_dim).astype(np.float32),
        'reward': np.random.randn(n).astype(np.float32),
        'cost': np.abs(np.random.randn(n)).astype(np.float32),
        'next_obs': np.random.randn(n, obs_dim).astype(np.float32),
        'done': (np.random.rand(n) < 0.1).astype(np.float32),
    }


def _save(tmp_path, arrays, name='ds.npz'):
    path = str(tmp_path / name)
    np.savez(path, **arrays)
    return path


def test_valid_dataset_loads(tmp_path):
    ds = OfflineDataset(_save(tmp_path, _good()), batch_size=8)
    assert ds.size == 32 and ds.obs_dim == 3 and ds.act_dim == 2
    import jax
    batch = ds.sample(jax.random.key(0))
    assert len(batch) == len(FIELDS) and batch[0].shape == (8, 3)


def test_reference_shape_convention_squeezed(tmp_path):
    """Reference datasets store per-step scalars as (N, 1); they must load."""
    arrays = _good()
    for f in ('reward', 'cost', 'done'):
        arrays[f] = arrays[f][:, None]
    ds = OfflineDataset(_save(tmp_path, arrays))
    assert ds.data['reward'].ndim == 1


@pytest.mark.parametrize(
    ('mutate', 'match'),
    [
        (lambda a: a.pop('cost'), "missing fields \\['cost'\\]"),
        (lambda a: a.update(reward=a['reward'][:10]), 'must align'),
        (lambda a: a.update(obs=a['obs'][:, 0]), r"'obs' must be \(N, dim\)"),
        (lambda a: a.update(done=np.zeros((32, 2), np.float32)),
         r"'done' must be \(N,\) or \(N, 1\)"),
        (lambda a: a['reward'].__setitem__(3, np.nan), 'non-finite'),
        (lambda a: a.update(action=a['action'].astype('U4')), 'non-numeric dtype'),
    ],
)
def test_malformed_dataset_raises_precisely(tmp_path, mutate, match):
    arrays = _good()
    mutate(arrays)
    path = _save(tmp_path, arrays)
    with pytest.raises(ValueError, match=match):
        validate_dataset(path)


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match='OfflineDataCollector'):
        validate_dataset(str(tmp_path / 'nope.npz'))


def test_empty_dataset_raises(tmp_path):
    path = _save(tmp_path, _good(n=0))
    with pytest.raises(ValueError, match='empty'):
        validate_dataset(path)


def test_with_init_reconstructs_init_obs(tmp_path):
    arrays = _good()
    arrays['done'][:] = 0.0
    arrays['done'][9] = 1.0  # episode boundary after index 9
    ds = OfflineDatasetWithInit(_save(tmp_path, arrays))
    init = np.asarray(ds.data['init_obs'])
    np.testing.assert_array_equal(init[0], arrays['obs'][0])
    np.testing.assert_array_equal(init[9], arrays['obs'][0])
    np.testing.assert_array_equal(init[10], arrays['obs'][10])
    np.testing.assert_array_equal(init[31], arrays['obs'][10])
