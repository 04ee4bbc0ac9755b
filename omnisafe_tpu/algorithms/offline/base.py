"""Offline training template.

Counterpart of the reference ``BaseOffline`` (reference:
omnisafe/algorithms/offline/base.py:32-150): gradient steps over dataset
batches with per-epoch evaluation on the real environment.  One epoch
(``steps_per_epoch`` updates) is a single jitted ``lax.scan``; evaluation is
the jitted OfflineAdapter episode scan.
"""

from __future__ import annotations

import abc
import time
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.adapter.offline import OfflineAdapter
from omnisafe_tpu.algorithms.base_algo import BaseAlgo
from omnisafe_tpu.common.logger import Logger
from omnisafe_tpu.common.offline.dataset import OfflineDataset

Array = jax.Array


class BaseOffline(BaseAlgo):
    """Dataset-driven trainer."""

    _algo_type = 'offline'
    _dataset_cls = OfflineDataset

    def _init_env(self) -> None:
        num_eval = int(self._cfgs.train_cfgs.get('evaluate_epoisodes', 1))
        self._adapter = OfflineAdapter(self._env_id, num_envs=max(num_eval, 1))

    def _init(self) -> None:
        self._dataset = self._dataset_cls(
            str(self._cfgs.train_cfgs.dataset),
            batch_size=int(self._cfgs.algo_cfgs.batch_size),
        )

    def _init_log(self) -> None:
        cfgs = self._cfgs
        self._logger = Logger(
            output_dir=cfgs.logger_cfgs.log_dir,
            exp_name=f'{self._env_id}---{type(self).__name__}',
            seed=self._seed,
            use_tensorboard=bool(cfgs.logger_cfgs.use_tensorboard),
            use_wandb=bool(cfgs.logger_cfgs.use_wandb),
            wandb_project=str(cfgs.logger_cfgs.get('wandb_project', 'omnisafe_tpu')),
            verbose=bool(cfgs.logger_cfgs.get('verbose', False)),
            use_profiler=bool(cfgs.logger_cfgs.get('use_profiler', False)),
            config=cfgs,
        )
        log = self._logger
        log.register_key('Metrics/EpRet')
        log.register_key('Metrics/EpCost')
        log.register_key('Metrics/EpLen')
        log.register_key('Time/Total')
        log.register_key('Time/Epoch')
        log.register_key('Time/Update')
        log.register_key('Time/Evaluate')
        log.register_key('Train/Epoch')
        log.register_key('TotalSteps')
        self._register_extra_keys(log)

    def _register_extra_keys(self, log: Logger) -> None:
        """Subclass hook."""

    # --------------------------------------------------------------- hooks
    @abc.abstractmethod
    def _init_state(self) -> Any:
        """Build the algorithm's train-state pytree."""

    @abc.abstractmethod
    def _train_step(self, state: Any, batch: Tuple[Array, ...], key: Array
                    ) -> Tuple[Any, Dict[str, Array]]:
        """One gradient step on one batch."""

    # identity on a single device; parallel/offline.py rebinds it to a
    # pmean over the dp mesh axis so every gradient site in the offline
    # train steps becomes a cross-device reduction (same pattern as the
    # on/off-policy programs' self._pmean)
    _pmean = staticmethod(lambda tree: tree)

    def _epoch_program(self, state: Any, key: Array, steps_per_epoch: int):
        """One epoch = ``steps_per_epoch`` scanned (sample, train) steps;
        shared by the single-device jit in :meth:`learn` and the dp
        shard_map in ``parallel/offline.py``."""

        def step(state, k):
            k_sample, k_train = jax.random.split(k)
            batch = self._dataset.sample(k_sample)
            return self._train_step(state, batch, k_train)

        keys = jax.random.split(key, steps_per_epoch)
        state, metrics = jax.lax.scan(step, state, keys)
        return state, jax.tree.map(jnp.mean, metrics)

    @abc.abstractmethod
    def _predict(self, state: Any, obs: Array, key: Array) -> Array:
        """Deterministic-ish policy for evaluation."""

    def restore(self, checkpoint_path: str) -> None:
        """Arm mid-training resume from a saved full-state checkpoint (the
        reference is save-only, omnisafe/common/logger.py:175-194)."""
        self._restore_path = checkpoint_path

    # ------------------------------------------------------------ training
    def learn(self) -> Tuple[float, float, float]:
        """(reference: offline/base.py:95-150)."""
        start = time.time()
        state = self._init_state()
        restore_path = getattr(self, '_restore_path', None)
        if restore_path:
            from omnisafe_tpu.utils.checkpoint import (  # pylint: disable=import-outside-toplevel
                load_checkpoint,
                restore_into,
            )

            payload = load_checkpoint(restore_path)
            if 'state' not in payload:
                raise KeyError(f'checkpoint {restore_path} has no state payload')
            state = restore_into(state, payload['state'])
        steps_per_epoch = int(self._cfgs.algo_cfgs.steps_per_epoch)
        epochs = int(self._cfgs.train_cfgs.total_steps) // steps_per_epoch

        epoch_jit = jax.jit(
            lambda state, key: self._epoch_program(state, key, steps_per_epoch)
        )
        eval_jit = jax.jit(
            lambda state, key: self._adapter.evaluate(
                lambda obs, k: self._predict(state, obs, k), key
            )
        )

        for epoch in range(epochs):
            epoch_start = time.time()
            self._key, epoch_key, eval_key = jax.random.split(self._key, 3)
            state, metrics = epoch_jit(state, epoch_key)
            jax.block_until_ready(jax.tree.leaves(metrics)[0])
            update_time = time.time() - epoch_start

            t0 = time.time()
            ep_ret, ep_cost, ep_len = eval_jit(state, eval_key)
            self._logger.store(
                **{
                    'Metrics/EpRet': np.asarray(ep_ret),
                    'Metrics/EpCost': np.asarray(ep_cost),
                    'Metrics/EpLen': np.asarray(ep_len),
                }
            )
            eval_time = time.time() - t0

            self._logger.store(**{k: float(v) for k, v in metrics.items()})
            self._logger.store(
                **{
                    'Train/Epoch': epoch,
                    'TotalSteps': (epoch + 1) * steps_per_epoch,
                    'Time/Update': update_time,
                    'Time/Evaluate': eval_time,
                    'Time/Epoch': time.time() - epoch_start,
                    'Time/Total': time.time() - start,
                }
            )
            self._logger.setup_saver({'state': jax.device_get(state),
                                      'config': self._cfgs.todict()})
            if (epoch + 1) % int(self._cfgs.logger_cfgs.save_model_freq) == 0:
                self._logger.save()
            row = self._logger.dump_tabular()

        ret = row.get('Metrics/EpRet', 0.0)
        cost = row.get('Metrics/EpCost', 0.0)
        length = row.get('Metrics/EpLen', 0.0)
        self._logger.save(tag='final')
        self._logger.close()
        self._final_state = state
        return ret, cost, length


__all__ = ['BaseOffline']
