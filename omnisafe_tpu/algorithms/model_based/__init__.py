"""Model-based algorithm family (reference layer: omnisafe/algorithms/model_based/**)."""

from omnisafe_tpu.algorithms.model_based.pets import CAPPETS, CCEPETS, PETS, RCEPETS
from omnisafe_tpu.algorithms.model_based.loop import LOOP, SafeLOOP

__all__ = ['PETS', 'CCEPETS', 'RCEPETS', 'CAPPETS', 'LOOP', 'SafeLOOP']
