"""Config system tests (reference analogue: tests/test_utils.py:118-231)."""

import glob
import os

import pytest

from omnisafe_tpu.utils.config import Config, check_all_configs, get_default_kwargs_yaml

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'omnisafe_tpu', 'configs')


def test_attribute_access_and_update():
    cfg = Config(a=1, b={'c': 2})
    assert cfg.a == 1 and cfg.b.c == 2
    cfg.recursive_update({'b': {'c': 3}})
    assert cfg.b.c == 3
    with pytest.raises(KeyError):
        cfg.recursive_update({'bogus': 1})


def test_ignored_torch_keys_accepted():
    cfg = Config(train_cfgs={'total_steps': 10})
    cfg.recursive_update({'train_cfgs': {'device': 'cpu', 'torch_threads': 4}})
    assert 'device' not in cfg.train_cfgs


@pytest.mark.parametrize(
    'path', sorted(glob.glob(os.path.join(_CONFIG_DIR, '*', '*.yaml')))
)
def test_all_default_configs_load_and_validate(path):
    family = os.path.basename(os.path.dirname(path))
    algo = os.path.basename(path)[:-5]
    cfgs = get_default_kwargs_yaml(algo, 'Test-v0', family)
    assert 'train_cfgs' in cfgs and 'algo_cfgs' in cfgs
    check_all_configs(cfgs, family)


def test_missing_config_raises():
    with pytest.raises(FileNotFoundError):
        get_default_kwargs_yaml('Nonexistent', 'Test-v0', 'on-policy')
