"""Environment layer: pure-functional CMDPs + registry + wrappers
(reference layer: omnisafe/envs/**)."""

from omnisafe_tpu.envs import (  # noqa: F401  (registration)
    classic_control,
    host_gym,
    host_mujoco,
    isaac_gym,
    meta_drive,
    navigation,
    simple_env,
    velocity,
)
from omnisafe_tpu.envs.core import CMDP, TimeStep, Wrapper, env_register, make, support_envs
from omnisafe_tpu.envs.spaces import Box
from omnisafe_tpu.envs.wrappers import (
    ActionScale,
    AutoReset,
    CostNormalize,
    ObsNormalize,
    RewardNormalize,
    TimeLimit,
    Vectorize,
)

__all__ = [
    'CMDP',
    'TimeStep',
    'Wrapper',
    'env_register',
    'make',
    'support_envs',
    'Box',
    'TimeLimit',
    'AutoReset',
    'Vectorize',
    'ObsNormalize',
    'RewardNormalize',
    'CostNormalize',
    'ActionScale',
]
