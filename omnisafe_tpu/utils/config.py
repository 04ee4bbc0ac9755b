"""Config system: attr-accessible nested dicts loaded from per-algorithm YAML.

Mirrors the reference's config surface (reference: omnisafe/utils/config.py:
27-409): per-algorithm defaults live in ``omnisafe_tpu/configs/{algo_type}/
{Algo}.yaml`` with a ``defaults:`` block plus optional per-env-id override
blocks; precedence is YAML defaults < env block < ``custom_cfgs`` < terminal
cfgs, and unknown keys are rejected against the YAML schema (reference:
omnisafe/utils/tools.py:246-271).

Differences from the reference are deliberate: torch-only knobs
(``device``/``torch_threads``) are ignored if present, and TPU-specific knobs
live under ``train_cfgs`` (``num_devices`` — the data-parallel mesh size that
replaces ``parallel`` process forking).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'configs')

# keys the torch reference needs but the TPU build ignores (accepted for
# drop-in config compatibility).
_IGNORED_KEYS = {'device', 'torch_threads'}


class Config(dict):
    """Nested dict with attribute access and recursive update
    (reference: omnisafe/utils/config.py:27-218)."""

    def __init__(self, **kwargs: Any) -> None:
        super().__init__()
        for key, value in kwargs.items():
            self[key] = Config(**value) if isinstance(value, dict) else value

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = Config(**value) if isinstance(value, dict) and not isinstance(value, Config) else value

    def recursive_update(self, update_args: Dict[str, Any], allow_new: bool = False) -> None:
        """Update nested keys in-place; unknown keys are rejected unless
        ``allow_new`` (reference: config.py:118-166, tools.py:246-271)."""
        for key, value in update_args.items():
            if key not in self and not allow_new and key not in _IGNORED_KEYS:
                raise KeyError(f'invalid config key {key!r}; known: {sorted(self)}')
            if isinstance(value, dict) and isinstance(self.get(key), Config):
                self[key].recursive_update(value, allow_new=allow_new)
            elif key not in _IGNORED_KEYS:
                self[key] = Config(**value) if isinstance(value, dict) else value

    def todict(self) -> Dict[str, Any]:
        return {
            key: value.todict() if isinstance(value, Config) else value
            for key, value in self.items()
        }

    def tojson(self) -> str:
        return json.dumps(self.todict(), indent=2, default=str)


def get_default_kwargs_yaml(algo: str, env_id: str, algo_type: str) -> Config:
    """Load per-algorithm YAML defaults with per-env override blocks
    (reference: omnisafe/utils/config.py:235-262)."""
    path = os.path.join(_CONFIG_DIR, algo_type, f'{algo}.yaml')
    if not os.path.exists(path):
        raise FileNotFoundError(f'no default config for {algo} ({algo_type}) at {path}')
    with open(path, encoding='utf-8') as handle:
        raw = yaml.safe_load(handle)
    cfgs = Config(**raw['defaults'])
    if env_id in raw:
        cfgs.recursive_update(raw[env_id], allow_new=True)
    return cfgs


class ConfigError(ValueError):
    """A config value failed type/range validation."""


def _check(group: Config, group_name: str, key: str, types, pred=None, want: str = '') -> None:
    """Validate one optional config entry; absent keys are skipped (YAMLs own
    the key inventory, ``recursive_update`` already rejects unknown keys)."""
    if not isinstance(group, dict) or key not in group:
        return
    value = group[key]
    # YAML loads whole numbers as int even for float knobs; accept int where
    # float is expected (the reference's isinstance(float) is stricter than
    # its own YAMLs — e.g. `entropy_coef: 0` — so widen deliberately).
    if float in types and isinstance(value, bool) is False and isinstance(value, int):
        value = float(value)
    if not isinstance(value, types) or (isinstance(value, bool) and bool not in types):
        names = '/'.join(t.__name__ for t in types)
        raise ConfigError(
            f'{group_name}.{key} must be {names}, got {type(group[key]).__name__} '
            f'({group[key]!r})'
        )
    if pred is not None and not pred(value):
        raise ConfigError(f'{group_name}.{key}={group[key]!r} out of range: must be {want}')


_POS = (lambda v: v > 0, '> 0')
_NONNEG = (lambda v: v >= 0, '>= 0')
_UNIT = (lambda v: 0.0 <= v <= 1.0, 'in [0, 1]')

# (group, key, allowed types, (predicate, description) or None) — the
# declarative form of the reference's assert list
# (reference: omnisafe/utils/config.py:298-393).
_ALGO_CFGS_SPEC = [
    ('update_iters', (int,), _POS),
    ('steps_per_epoch', (int,), _POS),
    ('batch_size', (int,), _POS),
    ('update_cycle', (int,), _POS),
    ('size', (int,), _POS),
    ('start_learning_steps', (int,), _NONNEG),
    ('target_kl', (float,), _NONNEG),
    ('entropy_coef', (float,), _UNIT),
    ('gamma', (float,), _UNIT),
    ('cost_gamma', (float,), _UNIT),
    ('lam', (float,), _UNIT),
    ('lam_c', (float,), _UNIT),
    ('clip', (float,), _NONNEG),
    ('penalty_coef', (float,), _UNIT),
    ('max_grad_norm', (float,), _POS),
    ('critic_norm_coef', (float,), _NONNEG),
    ('polyak', (float,), _UNIT),
    ('cost_limit', (float,), _NONNEG),
    ('reward_normalize', (bool,), None),
    ('cost_normalize', (bool,), None),
    ('obs_normalize', (bool,), None),
    ('kl_early_stop', (bool,), None),
    ('use_max_grad_norm', (bool,), None),
    ('use_critic_norm', (bool,), None),
    ('use_cost', (bool,), None),
    ('standardized_rew_adv', (bool,), None),
    ('standardized_cost_adv', (bool,), None),
    (
        'adv_estimation_method',
        (str,),
        (lambda v: v in {'gae', 'gae-rtg', 'vtrace', 'plain'},
         "one of ['gae', 'gae-rtg', 'vtrace', 'plain']"),
    ),
]

_TRAIN_CFGS_SPEC = [
    ('total_steps', (int,), _POS),
    ('vector_env_nums', (int,), _POS),
    ('num_devices', (int,), _POS),
    ('parallel', (int,), _POS),
    ('eval_episodes', (int,), _NONNEG),
    ('learner_device', (str,), (lambda v: v in {'auto', 'cpu', 'tpu'},
                                "one of ['auto', 'cpu', 'tpu']")),
]

_LAGRANGE_CFGS_SPEC = [
    ('cost_limit', (float,), _NONNEG),
    ('lagrangian_multiplier_init', (float,), _NONNEG),
    ('lambda_lr', (float,), _POS),
    ('lagrangian_upper_bound', (float,), _POS),
]

_LOGGER_CFGS_SPEC = [
    ('use_wandb', (bool,), None),
    ('wandb_project', (str,), None),
    ('use_tensorboard', (bool,), None),
    ('save_model_freq', (int,), _POS),
    ('window_lens', (int,), _POS),
    ('log_dir', (str,), None),
    ('verbose', (bool,), None),
    ('use_profiler', (bool,), None),
]

_MODEL_HEAD_SPEC = [
    ('hidden_sizes', (list,), (lambda v: all(isinstance(h, int) and h > 0 for h in v),
                               'a list of positive ints')),
    ('activation', (str,), (lambda v: v in {'tanh', 'relu', 'elu', 'gelu', 'sigmoid',
                                            'identity', 'softplus'},
                            'a known activation name')),
    ('lr', (float, type(None)), (lambda v: v is None or v > 0, '> 0 or null')),
]


def _apply_spec(group: Any, group_name: str, spec) -> None:
    for key, types, pred in spec:
        if pred is None:
            _check(group, group_name, key, types)
        else:
            _check(group, group_name, key, types, pred[0], pred[1])


def check_all_configs(cfgs: Config, algo_type: str) -> None:
    """Type/range-validate every config group before training so a typo'd
    value raises instead of silently training
    (reference: omnisafe/utils/config.py:265-409)."""
    _apply_spec(cfgs.get('algo_cfgs'), 'algo_cfgs', _ALGO_CFGS_SPEC)
    _apply_spec(cfgs.get('train_cfgs'), 'train_cfgs', _TRAIN_CFGS_SPEC)
    _apply_spec(cfgs.get('lagrange_cfgs'), 'lagrange_cfgs', _LAGRANGE_CFGS_SPEC)
    _apply_spec(cfgs.get('logger_cfgs'), 'logger_cfgs', _LOGGER_CFGS_SPEC)
    model_cfgs = cfgs.get('model_cfgs')
    if isinstance(model_cfgs, dict):
        for head in ('actor', 'critic'):
            _apply_spec(model_cfgs.get(head), f'model_cfgs.{head}', _MODEL_HEAD_SPEC)
        _check(model_cfgs, 'model_cfgs', 'actor_type', (str,),
               lambda v: v in {'gaussian_learning', 'gaussian_sac', 'mlp', 'vae',
                               'perturbation'},
               'a registered actor type')

    # structural / cross-field checks (reference: config.py:279-296)
    if algo_type == 'on-policy':
        steps = cfgs.algo_cfgs.steps_per_epoch
        denom = cfgs.train_cfgs.vector_env_nums * cfgs.train_cfgs.get('num_devices', 1)
        if steps % denom != 0:
            raise ConfigError(
                f'steps_per_epoch ({steps}) must divide by vector_env_nums * '
                f'num_devices ({denom})'
            )
    if algo_type == 'off-policy':
        # the reference asserts parallel == 1 here; the TPU build removes
        # the device-mesh half of that restriction — the on-device replay
        # ring shards its env-stream axis over dp (parallel/offpolicy.py).
        # Process-parallelism (`parallel`) remains on-policy-only.
        if int(cfgs.train_cfgs.get('parallel', 1)) != 1:
            raise ConfigError(
                'off-policy supports parallel == 1 only '
                '(reference: omnisafe/utils/config.py:288-291)'
            )
    if algo_type in {'model-based', 'offline'}:
        if int(cfgs.train_cfgs.get('parallel', 1)) != 1 or int(
            cfgs.train_cfgs.get('num_devices', 1)
        ) != 1:
            raise ConfigError(
                f'{algo_type} supports parallel == num_devices == 1 only '
                '(reference: omnisafe/utils/config.py:288-291)'
            )
    if cfgs.get('algo') in {'PPOEarlyTerminated', 'TRPOEarlyTerminated'}:
        if int(cfgs.train_cfgs.get('vector_env_nums', 1)) != 1:
            # the TPU build vectorizes the early-termination wrapper, so this
            # reference restriction (config.py:292-296) is lifted — but warn
            # via validation only if envs would starve the epoch
            pass


def configured_cost_limit(cfgs: Config) -> 'float | None':
    """The run's episodic cost limit, wherever the algorithm keeps it.

    Lagrangian/PID algorithms carry it in ``lagrange_cfgs``; trust-region,
    penalty, and model-based algorithms in ``algo_cfgs``.  Unconstrained
    baselines (PPO, TRPO, ...) have none — returns ``None``.
    """
    for group_name in ('lagrange_cfgs', 'algo_cfgs'):
        group = cfgs.get(group_name)
        if isinstance(group, dict) and group.get('cost_limit') is not None:
            return float(group['cost_limit'])
    return None


__all__ = [
    'Config',
    'ConfigError',
    'get_default_kwargs_yaml',
    'check_all_configs',
    'configured_cost_limit',
]
