"""Algorithm template base class.

Counterpart of the reference's ``BaseAlgo`` (reference:
omnisafe/algorithms/base_algo.py:29-83): seeds, config, and the
``_init_env/_init_model/_init/_init_log/learn`` template hooks.  The torch
version calls ``distributed.setup_distributed()``; here the data-parallel
dimension is a ``jax.sharding.Mesh`` owned by the trainer and threaded through
``shard_map``-wrapped step functions (see omnisafe_tpu/parallel).
"""

from __future__ import annotations

import abc
from typing import Any, Optional, Tuple

import jax

from omnisafe_tpu.utils.config import Config


class BaseAlgo(abc.ABC):
    """Template: constructor drives the init hooks, ``learn`` runs training."""

    _algo_type: str = 'on-policy'

    def __init__(self, env_id: str, cfgs: Config) -> None:
        self._env_id = env_id
        self._cfgs = cfgs
        self._seed = int(cfgs.seed)
        self._key = jax.random.key(self._seed)
        # mesh axis name for data-parallel collectives; None = single-program
        self._axis_name: Optional[str] = None

        self._init_env()
        self._init_model()
        self._init()
        self._init_log()

    @classmethod
    def for_evaluation(cls, env_id: str, cfgs: Config) -> 'BaseAlgo':
        """Construct the algorithm's env + model stack WITHOUT logging or
        datasets, for checkpoint reconstruction by the Evaluator
        (reference analogue: omnisafe/evaluator.py:134-307 rebuilds models and
        planners from config.json)."""
        self = cls.__new__(cls)
        self._env_id = env_id
        self._cfgs = cfgs
        self._seed = int(cfgs.seed)
        self._key = jax.random.key(self._seed)
        self._axis_name = None
        self._init_env()
        self._init_model()
        if cls._algo_type != 'offline':  # offline's _init loads the dataset
            self._init()
        return self

    @property
    def cfgs(self) -> Config:
        return self._cfgs

    @property
    def logger(self):
        return self._logger

    def _pmean(self, x):
        """Cross-device mean — the TPU-native ``distributed.dist_avg``
        (reference: omnisafe/utils/distributed.py:259-303)."""
        if self._axis_name is None:
            return x
        return jax.lax.pmean(x, self._axis_name)

    @abc.abstractmethod
    def _init_env(self) -> None:
        ...

    @abc.abstractmethod
    def _init_model(self) -> None:
        ...

    @abc.abstractmethod
    def _init(self) -> None:
        ...

    @abc.abstractmethod
    def _init_log(self) -> None:
        ...

    @abc.abstractmethod
    def learn(self) -> Tuple[float, float, float]:
        """Train; returns (ep_ret, ep_cost, ep_len) like the reference."""


__all__ = ['BaseAlgo']
