"""Algorithm layer: registry + families (reference layer: omnisafe/algorithms/**)."""

from omnisafe_tpu.algorithms import model_based, off_policy, offline, on_policy  # noqa: F401  (registration)
from omnisafe_tpu.algorithms.registry import registry

ALGORITHM2TYPE = {
    name: registry.get(name)._algo_type  # pylint: disable=protected-access
    for name in registry.keys()
}

ALGORITHMS = {
    'on-policy': tuple(n for n, t in ALGORITHM2TYPE.items() if t == 'on-policy'),
    'off-policy': tuple(n for n, t in ALGORITHM2TYPE.items() if t == 'off-policy'),
    'model-based': tuple(n for n, t in ALGORITHM2TYPE.items() if t == 'model-based'),
    'offline': tuple(n for n, t in ALGORITHM2TYPE.items() if t == 'offline'),
    'all': tuple(ALGORITHM2TYPE),
}

__all__ = ['registry', 'ALGORITHMS', 'ALGORITHM2TYPE']
