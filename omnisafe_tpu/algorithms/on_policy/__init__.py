"""On-policy algorithm family (reference layer: omnisafe/algorithms/on_policy/**).

23 registered algorithms mirroring the reference's on-policy roster
(reference: omnisafe/algorithms/__init__.py:23-66).
"""

from omnisafe_tpu.algorithms.on_policy.policy_gradient import PolicyGradient
from omnisafe_tpu.algorithms.on_policy.natural_pg import NaturalPG
from omnisafe_tpu.algorithms.on_policy.trpo import TRPO
from omnisafe_tpu.algorithms.on_policy.ppo import PPO
from omnisafe_tpu.algorithms.on_policy.ppo_lag import PPOLag
from omnisafe_tpu.algorithms.on_policy.naive_lagrange import PDO, RCPO, TRPOLag
from omnisafe_tpu.algorithms.on_policy.cpo import CPO
from omnisafe_tpu.algorithms.on_policy.pcpo import PCPO
from omnisafe_tpu.algorithms.on_policy.cup import CUP
from omnisafe_tpu.algorithms.on_policy.focops import FOCOPS
from omnisafe_tpu.algorithms.on_policy.penalty_function import IPO, P3O
from omnisafe_tpu.algorithms.on_policy.pid_lagrange import CPPOPID, TRPOPID
from omnisafe_tpu.algorithms.on_policy.crpo import OnCRPO
from omnisafe_tpu.algorithms.on_policy.saute import PPOSaute, TRPOSaute
from omnisafe_tpu.algorithms.on_policy.simmer import PPOSimmerPID, TRPOSimmerPID
from omnisafe_tpu.algorithms.on_policy.early_terminated import (
    PPOEarlyTerminated,
    TRPOEarlyTerminated,
)

__all__ = [
    'PolicyGradient', 'NaturalPG', 'TRPO', 'PPO',
    'PDO', 'RCPO', 'PPOLag', 'TRPOLag',
    'CPO', 'PCPO',
    'CUP', 'FOCOPS',
    'IPO', 'P3O',
    'CPPOPID', 'TRPOPID',
    'PPOSaute', 'TRPOSaute',
    'PPOSimmerPID', 'TRPOSimmerPID',
    'OnCRPO',
    'PPOEarlyTerminated', 'TRPOEarlyTerminated',
]
