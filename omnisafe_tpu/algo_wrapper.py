"""User-facing ``Agent`` wrapper.

Counterpart of the reference's ``AlgoWrapper`` (reference:
omnisafe/algorithms/algo_wrapper.py:56-269): resolves the algorithm name to a
type, merges YAML defaults with ``custom_cfgs``/terminal overrides, validates,
instantiates, and exposes ``learn``/``evaluate``.  The reference's
``distributed.fork`` torchrun self-relaunch (algo_wrapper.py:149-170) has no
TPU counterpart: data parallelism is an in-program mesh dimension
(``train_cfgs.num_devices``), not a process boundary.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from omnisafe_tpu.algorithms import ALGORITHM2TYPE, registry
from omnisafe_tpu.envs import support_envs
from omnisafe_tpu.utils.config import Config, check_all_configs, get_default_kwargs_yaml


class AlgoWrapper:
    """Resolve config + instantiate + run an algorithm."""

    def __init__(
        self,
        algo: str,
        env_id: str,
        train_terminal_cfgs: Optional[Dict[str, Any]] = None,
        custom_cfgs: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.algo = algo
        self.env_id = env_id
        self.algo_type = ALGORITHM2TYPE.get(algo)
        if self.algo_type is None:
            raise NotImplementedError(f'{algo} is not a registered algorithm')
        self.cfgs = self._init_config(custom_cfgs, train_terminal_cfgs)
        self._init_checks()
        parallel = int(self.cfgs.train_cfgs.get('parallel', 1))
        if parallel > 1:
            # the torchrun-equivalent process boundary (reference:
            # algo_wrapper.py:149-170 + utils/distributed.py:83-139): the
            # parent re-launches sys.argv as N coordinated processes and
            # exits inside fork(); children join the JAX runtime here and
            # run the same shard_map programs over the global mesh.
            from omnisafe_tpu.parallel.launch import fork, maybe_initialize  # pylint: disable=import-outside-toplevel

            fork(parallel)
            maybe_initialize()
        self.agent = registry.get(algo)(env_id=env_id, cfgs=self.cfgs)

    def _init_config(self, custom_cfgs, train_terminal_cfgs) -> Config:
        """YAML defaults < custom < terminal (reference: algo_wrapper.py:75-138)."""
        cfgs = get_default_kwargs_yaml(self.algo, self.env_id, self.algo_type)
        if custom_cfgs:
            cfgs.recursive_update(custom_cfgs)
        if train_terminal_cfgs:
            cfgs.recursive_update({'train_cfgs': train_terminal_cfgs})
        # self-describing config snapshot so the Evaluator can reconstruct the
        # stack without parsing directory names (reference: evaluator.py:134-150)
        cfgs['algo'] = self.algo
        cfgs['env_id'] = self.env_id
        check_all_configs(cfgs, self.algo_type)
        return cfgs

    def _init_checks(self) -> None:
        """(reference: algo_wrapper.py:140-147)."""
        assert isinstance(self.algo, str), 'algo must be a string'
        if self.env_id not in support_envs():
            raise NotImplementedError(f'{self.env_id} is not a supported environment')

    def learn(self) -> Tuple[float, float, float]:
        """(reference: algo_wrapper.py:172-184)."""
        return self.agent.learn()

    @property
    def logger(self):
        return self.agent.logger


Agent = AlgoWrapper

__all__ = ['AlgoWrapper', 'Agent']
