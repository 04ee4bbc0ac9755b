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


def check_all_configs(cfgs: Config, algo_type: str) -> None:
    """Sanity checks mirrored from the reference
    (reference: omnisafe/utils/config.py:265-409)."""
    if algo_type == 'on-policy':
        steps = cfgs.algo_cfgs.steps_per_epoch
        denom = cfgs.train_cfgs.vector_env_nums * cfgs.train_cfgs.get('num_devices', 1)
        assert steps % denom == 0, (
            f'steps_per_epoch ({steps}) must divide by vector_env_nums * num_devices ({denom})'
        )
        if cfgs.algo_cfgs.get('use_cost') is False and 'lagrange_cfgs' in cfgs:
            pass  # lagrange algorithms may still track cost stats
    if 'lagrange_cfgs' in cfgs and 'cost_limit' in cfgs.lagrange_cfgs:
        assert cfgs.lagrange_cfgs.cost_limit >= 0, 'cost_limit must be non-negative'


__all__ = ['Config', 'get_default_kwargs_yaml', 'check_all_configs']
