"""Offline algorithm family (reference layer: omnisafe/algorithms/offline/**)."""

from omnisafe_tpu.algorithms.offline.bcq import BCQ, BCQLag
from omnisafe_tpu.algorithms.offline.coptidice import COptiDICE
from omnisafe_tpu.algorithms.offline.crr import CCRR, CRR
from omnisafe_tpu.algorithms.offline.vae_bc import VAEBC

__all__ = ['VAEBC', 'BCQ', 'BCQLag', 'CRR', 'CCRR', 'COptiDICE']
