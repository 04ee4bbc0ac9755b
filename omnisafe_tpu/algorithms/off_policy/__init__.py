"""Off-policy algorithm family (reference layer: omnisafe/algorithms/off_policy/**)."""

from omnisafe_tpu.algorithms.off_policy.ddpg import DDPG
from omnisafe_tpu.algorithms.off_policy.td3 import TD3
from omnisafe_tpu.algorithms.off_policy.sac import SAC
from omnisafe_tpu.algorithms.off_policy.lagrange_variants import (
    DDPGLag,
    DDPGPID,
    SACLag,
    SACPID,
    TD3Lag,
    TD3PID,
)
from omnisafe_tpu.algorithms.off_policy.crabs import CRABS

__all__ = ['DDPG', 'TD3', 'SAC', 'DDPGLag', 'TD3Lag', 'SACLag', 'DDPGPID', 'TD3PID',
           'SACPID', 'CRABS']
