"""Model layer: actors, critics, composites (reference layer: omnisafe/models/**)."""

from omnisafe_tpu.models.actor import GaussianLearningActor, GaussianSACActor, MLPActor, build_actor
from omnisafe_tpu.models.actor_critic import (
    ACParams,
    ACQParams,
    ConstraintActorCritic,
    ConstraintActorQCritic,
)
from omnisafe_tpu.models.critic import QCritic, VCritic, build_critic
from omnisafe_tpu.models.mlp import MLP

__all__ = [
    'MLP',
    'GaussianLearningActor',
    'GaussianSACActor',
    'MLPActor',
    'build_actor',
    'VCritic',
    'QCritic',
    'build_critic',
    'ACParams',
    'ACQParams',
    'ConstraintActorCritic',
    'ConstraintActorQCritic',
]
