"""VAE-BC — behavior cloning with a conditional VAE.

Counterpart of the reference VAEBC (reference:
omnisafe/algorithms/offline/vae_bc.py:30-120).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omnisafe_tpu.algorithms.offline.base import BaseOffline
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.models.actor import VAE

Array = jax.Array


@struct.dataclass
class VAEBCState:
    vae: Any
    opt: Any


@registry.register
class VAEBC(BaseOffline):
    """Offline behavior cloning via VAE reconstruction."""

    def _init_model(self) -> None:
        cfgs = self._cfgs.model_cfgs
        self._vae = VAE(
            act_dim=self._adapter.action_space.shape[0],
            hidden_sizes=tuple(cfgs.hidden_sizes),
            activation=cfgs.activation,
            weight_initialization_mode=cfgs.weight_initialization_mode,
        )
        self._tx = optax.adam(float(cfgs.learning_rate))

    def _register_extra_keys(self, log) -> None:
        log.register_key('Loss/Loss_vae')
        log.register_key('Loss/Loss_recon')
        log.register_key('Loss/Loss_kl')

    def _init_state(self) -> VAEBCState:
        self._key, init_key = jax.random.split(self._key)
        obs_dim = self._adapter.observation_space.shape[0]
        act_dim = self._adapter.action_space.shape[0]
        params = self._vae.init(
            init_key, jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim)), jax.random.key(0)
        )
        return VAEBCState(vae=params, opt=self._tx.init(params))

    def _train_step(self, state: VAEBCState, batch, key: Array
                    ) -> Tuple[VAEBCState, Dict[str, Array]]:
        obs, act = batch[0], batch[1]

        def loss_fn(params):
            recon, kl = self._vae.apply(params, obs, act, key, method=VAE.loss)
            return recon + kl, (recon, kl)

        (loss, (recon, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.vae)
        grads = self._pmean(grads)
        updates, opt = self._tx.update(grads, state.opt, state.vae)
        params = optax.apply_updates(state.vae, updates)
        metrics = {'Loss/Loss_vae': loss, 'Loss/Loss_recon': recon, 'Loss/Loss_kl': kl}
        return state.replace(vae=params, opt=opt), metrics

    def _predict(self, state: VAEBCState, obs: Array, key: Array) -> Array:
        return self._vae.apply(state.vae, obs, key, method=VAE.predict)


__all__ = ['VAEBC', 'VAEBCState']
