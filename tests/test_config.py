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


# --- type/range validation (reference: omnisafe/utils/config.py:265-409) ---

from omnisafe_tpu.utils.config import ConfigError  # noqa: E402


def _violation(family='on-policy', algo='PPOLag', **overrides):
    cfgs = get_default_kwargs_yaml(algo, 'Test-v0', family)
    cfgs.recursive_update(overrides, allow_new=True)
    return cfgs, family


@pytest.mark.parametrize(
    'overrides, family',
    [
        # wrong types
        ({'algo_cfgs': {'update_iters': 2.5}}, 'on-policy'),
        ({'algo_cfgs': {'gamma': 'high'}}, 'on-policy'),
        ({'algo_cfgs': {'obs_normalize': 'yes'}}, 'on-policy'),
        ({'algo_cfgs': {'steps_per_epoch': True}}, 'on-policy'),
        ({'train_cfgs': {'total_steps': 1e6}}, 'on-policy'),  # float, must be int
        ({'logger_cfgs': {'save_model_freq': 'often'}}, 'on-policy'),
        # out of range
        ({'algo_cfgs': {'gamma': 1.5}}, 'on-policy'),
        ({'algo_cfgs': {'lam': -0.1}}, 'on-policy'),
        ({'algo_cfgs': {'entropy_coef': 2.0}}, 'on-policy'),
        ({'algo_cfgs': {'update_iters': 0}}, 'on-policy'),
        ({'train_cfgs': {'vector_env_nums': -4}}, 'on-policy'),
        ({'lagrange_cfgs': {'lambda_lr': 0.0}}, 'on-policy'),
        ({'lagrange_cfgs': {'cost_limit': -25.0}}, 'on-policy'),
        ({'algo_cfgs': {'adv_estimation_method': 'monte-carlo'}}, 'on-policy'),
        # model heads
        ({'model_cfgs': {'actor': {'hidden_sizes': [64, -64]}}}, 'on-policy'),
        ({'model_cfgs': {'actor': {'activation': 'swishh'}}}, 'on-policy'),
        ({'model_cfgs': {'actor_type': 'transformer'}}, 'on-policy'),
    ],
)
def test_invalid_config_value_raises(overrides, family):
    cfgs, family = _violation(family=family, **overrides)
    with pytest.raises(ConfigError):
        check_all_configs(cfgs, family)


def test_divisibility_violation_raises():
    cfgs = get_default_kwargs_yaml('PPO', 'Test-v0', 'on-policy')
    cfgs.algo_cfgs.steps_per_epoch = 100
    cfgs.train_cfgs.vector_env_nums = 3
    with pytest.raises(ConfigError):
        check_all_configs(cfgs, 'on-policy')


def test_off_policy_parallel_violation_raises():
    cfgs = get_default_kwargs_yaml('SAC', 'Test-v0', 'off-policy')
    cfgs.train_cfgs.recursive_update({'parallel': 2}, allow_new=True)
    with pytest.raises(ConfigError):
        check_all_configs(cfgs, 'off-policy')


def test_int_accepted_where_float_expected():
    # YAML loads `entropy_coef: 0` as int; validation must accept it.
    cfgs = get_default_kwargs_yaml('PPO', 'Test-v0', 'on-policy')
    cfgs.algo_cfgs.entropy_coef = 0
    cfgs.algo_cfgs.gamma = 1
    check_all_configs(cfgs, 'on-policy')


def test_configured_cost_limit_locations():
    from omnisafe_tpu.utils.config import configured_cost_limit

    # Lagrangian: lagrange_cfgs wins
    assert configured_cost_limit(
        get_default_kwargs_yaml('PPOLag', 'Test-v0', 'on-policy')) == 25.0
    # trust-region: algo_cfgs
    assert configured_cost_limit(
        get_default_kwargs_yaml('CPO', 'Test-v0', 'on-policy')) == 25.0
    # unconstrained: none
    assert configured_cost_limit(
        get_default_kwargs_yaml('PPO', 'Test-v0', 'on-policy')) is None
