"""Probabilistic dynamics ensemble for model-based algorithms.

Counterpart of the reference's ``EnsembleDynamicsModel``/``EnsembleModel``
(reference: omnisafe/algorithms/model_based/base/ensemble.py:152-916):
Gaussian next-state/reward predictions with learnable log-variance bounds,
bootstrapped per-model training batches, holdout early stopping with
per-model snapshots, elite selection by holdout MSE, and particle-based
``imagine`` rollouts.

TPU-native structure: the ensemble axis is an ``nn.vmap`` batch dimension
(one batched matmul evaluates every model), the train epoch is a
``lax.scan`` over a bootstrapped index matrix, and imagination is a
``lax.scan`` over the horizon — the reference's chunked 1024-row prediction
loop (ensemble.py:731-781) disappears into a single compiled pass.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

Array = jax.Array


class EnsembleModel(nn.Module):
    """Vmapped Gaussian-output MLP ensemble.

    Output is ``[reward (reward_size), delta_state (state_dim)]`` mean and
    log-variance, with learnable clamped bounds
    (reference: ensemble.py:215-443).
    """

    state_dim: int
    action_dim: int
    reward_size: int
    num_ensemble: int
    hidden_size: int = 200
    gated: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        """x: (E, B, state+action) -> mean/logvar (E, B, out)."""
        out_dim = self.state_dim + self.reward_size
        Vmapped = nn.vmap(
            _EnsembleCore,
            in_axes=0,
            out_axes=0,
            axis_size=self.num_ensemble,
            variable_axes={'params': 0},
            split_rngs={'params': True},
        )
        raw = Vmapped(hidden_size=self.hidden_size, out_dim=out_dim,
                      gated=self.gated, name='core')(x)
        mean, logvar_raw = jnp.split(raw, 2, axis=-1)
        max_logvar = self.param('max_logvar', nn.initializers.constant(0.5), (out_dim,))
        min_logvar = self.param('min_logvar', nn.initializers.constant(-10.0), (out_dim,))
        logvar = max_logvar - jax.nn.softplus(max_logvar - logvar_raw)
        logvar = min_logvar + jax.nn.softplus(logvar - min_logvar)
        return mean, logvar


class _EnsembleCore(nn.Module):
    hidden_size: int
    out_dim: int
    gated: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(4):
            h = nn.Dense(self.hidden_size, name=f'dense_{i}')(x)
            h = nn.swish(h)
            if self.gated:
                # multiplicative gating per hidden layer — the CRABS
                # GatedTransitionModel (reference: crabs/models.py:30-321)
                gate = jax.nn.sigmoid(nn.Dense(self.hidden_size, name=f'gate_{i}')(x))
                h = h * gate
            x = h
        return nn.Dense(2 * self.out_dim, name='head')(x)


@struct.dataclass
class DynamicsState:
    params: Any
    opt_state: Any
    scaler_mean: Array     # input normalization fit on train data
    scaler_std: Array
    elite_mask: Array      # (E,) 1.0 for elite models


class DynamicsEnsemble:
    """Static config + pure train/sample/imagine ops."""

    # pylint: disable-next=too-many-arguments
    def __init__(
        self,
        state_dim: int,
        action_dim: int,
        num_ensemble: int = 5,
        elite_size: int = 5,
        hidden_size: int = 200,
        reward_size: int = 1,
        predict_reward: bool = True,
        use_cost: bool = False,
        cost_func: Optional[Callable[[Array], Array]] = None,
        lr: float = 1e-3,
        use_decay: bool = True,
        batch_size: int = 256,
        max_epoch: int = 5,
        gated: bool = False,
    ) -> None:
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.num_ensemble = num_ensemble
        self.elite_size = elite_size
        self.reward_size = reward_size if predict_reward else 0
        self.use_cost = use_cost
        self.cost_func = cost_func
        self.batch_size = batch_size
        self.max_epoch = max_epoch
        self.model = EnsembleModel(
            state_dim=state_dim,
            action_dim=action_dim,
            reward_size=self.reward_size,
            num_ensemble=num_ensemble,
            hidden_size=hidden_size,
            gated=gated,
        )
        # torch's Adam + manual use_decay weight regularization -> adamw-ish
        self.tx = optax.adamw(lr, weight_decay=7.5e-5 if use_decay else 0.0)
        self._train_epoch_jit: Dict[int, Any] = {}
        self._val_jit = None

    @property
    def out_dim(self) -> int:
        return self.state_dim + self.reward_size

    def init(self, key: Array) -> DynamicsState:
        x = jnp.zeros((self.num_ensemble, 1, self.state_dim + self.action_dim))
        params = self.model.init(key, x)
        return DynamicsState(
            params=params,
            opt_state=self.tx.init(params),
            scaler_mean=jnp.zeros((self.state_dim + self.action_dim,)),
            scaler_std=jnp.ones((self.state_dim + self.action_dim,)),
            elite_mask=jnp.ones((self.num_ensemble,)),
        )

    # -------------------------------------------------------------- losses
    def _nll_loss(self, params, inputs: Array, targets: Array, scaler) -> Tuple[Array, Array]:
        """Gaussian NLL + logvar bound penalty; returns (total, per-model mse)
        (reference: ensemble.py:377-427)."""
        mean_s, std_s = scaler
        x = (inputs - mean_s) / std_s
        mean, logvar = self.model.apply(params, x)
        inv_var = jnp.exp(-logvar)
        mse = jnp.mean(jnp.square(mean - targets), axis=(1, 2))
        nll = jnp.mean(jnp.square(mean - targets) * inv_var + logvar, axis=(1, 2))
        total = jnp.sum(nll)
        total = total + 0.01 * (
            jnp.sum(params['params']['max_logvar']) - jnp.sum(params['params']['min_logvar'])
        )
        return total, mse

    def _mse_loss(self, params, inputs: Array, targets: Array, scaler) -> Array:
        mean_s, std_s = scaler
        x = (inputs - mean_s) / std_s
        mean, _ = self.model.apply(params, x)
        return jnp.mean(jnp.square(mean - targets), axis=(1, 2))

    # ------------------------------------------------------------ training
    def train(
        self,
        state: DynamicsState,
        inputs: np.ndarray,
        targets: np.ndarray,
        holdout_ratio: float = 0.2,
        rng: Optional[np.random.Generator] = None,
    ) -> Tuple[DynamicsState, float, float]:
        """Bootstrapped training with holdout early stop
        (reference: ensemble.py:557-689).  The outer epoch loop is host-side
        (data-dependent stopping); each epoch is one compiled scan.
        """
        rng = rng or np.random.default_rng(0)
        n = inputs.shape[0]
        num_holdout = min(int(n * holdout_ratio), 5000)
        perm = rng.permutation(n)
        inputs, targets = inputs[perm], targets[perm]
        train_x, train_y = inputs[num_holdout:], targets[num_holdout:]
        hold_x, hold_y = inputs[:num_holdout], targets[:num_holdout]

        scaler_mean = train_x.mean(axis=0)
        scaler_std = train_x.std(axis=0) + 1e-8
        state = state.replace(
            scaler_mean=jnp.asarray(scaler_mean), scaler_std=jnp.asarray(scaler_std)
        )
        scaler = (state.scaler_mean, state.scaler_std)

        n_train = train_x.shape[0]
        steps = max(n_train // self.batch_size, 1)
        # bucket the scan length so data growth doesn't recompile every cycle
        bucket = 1 << (steps - 1).bit_length()

        if bucket not in self._train_epoch_jit:
            def train_epoch(params, opt_state, data_x, data_y, idx, scaler):
                def step(carry, batch_idx):
                    params, opt_state = carry
                    bx = data_x[batch_idx]        # (E, B, in)
                    by = data_y[batch_idx]
                    (_, mse), grads = jax.value_and_grad(self._nll_loss, has_aux=True)(
                        params, bx, by, scaler
                    )
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), jnp.mean(mse)

                (params, opt_state), mses = jax.lax.scan(step, (params, opt_state), idx)
                return params, opt_state, jnp.mean(mses)

            self._train_epoch_jit[bucket] = jax.jit(train_epoch)
        epoch_fn = self._train_epoch_jit[bucket]

        if self._val_jit is None:
            self._val_jit = jax.jit(self._mse_loss)

        data_x = jnp.asarray(train_x)
        data_y = jnp.asarray(train_y)
        hold_xj = jnp.asarray(hold_x) if num_holdout else data_x[:1]
        hold_yj = jnp.asarray(hold_y) if num_holdout else data_y[:1]

        params, opt_state = state.params, state.opt_state
        snapshots = np.full(self.num_ensemble, 1e10)
        epochs_since_update = 0
        train_mse = 0.0
        val_mse = np.zeros(self.num_ensemble)
        for _ in range(50):  # hard cap
            idx = np.stack([
                rng.integers(0, n_train, size=(bucket, self.batch_size))
                for _ in range(self.num_ensemble)
            ], axis=2).transpose(0, 2, 1)  # (bucket, E, B)
            params, opt_state, train_mse = epoch_fn(params, opt_state, data_x, data_y,
                                                    jnp.asarray(idx), scaler)
            hx = jnp.broadcast_to(hold_xj, (self.num_ensemble,) + hold_xj.shape)
            hy = jnp.broadcast_to(hold_yj, (self.num_ensemble,) + hold_yj.shape)
            val_mse = np.asarray(self._val_jit(params, hx, hy, scaler))
            improved = (snapshots - val_mse) / np.maximum(snapshots, 1e-10) > 0.01
            if improved.any():
                snapshots = np.minimum(snapshots, val_mse)
                epochs_since_update = 0
            else:
                epochs_since_update += 1
            if epochs_since_update > self.max_epoch:
                break

        elite_idx = np.argsort(val_mse)[: self.elite_size]
        elite_mask = np.zeros(self.num_ensemble)
        elite_mask[elite_idx] = 1.0
        state = state.replace(
            params=params, opt_state=opt_state, elite_mask=jnp.asarray(elite_mask)
        )
        return state, float(train_mse), float(val_mse.mean())

    # ----------------------------------------------------------- inference
    def sample(
        self,
        state: DynamicsState,
        states: Array,
        actions: Array,
        key: Array,
        deterministic: bool = False,
    ):
        """One prediction step.  states/actions: (E, B, dim) -> next states
        (E, B, state_dim), rewards (E, B, reward_size), var (E, B, out)
        (reference: ensemble.py:783-853)."""
        x = jnp.concatenate([states, actions], axis=-1)
        # clamp normalized inputs and predicted quantities: an under-trained
        # ensemble extrapolates exponentially over the horizon; unbounded it
        # overflows float32 (inf/NaN inside the compiled planner).  The torch
        # reference runs float32 too and is exposed to the same divergence —
        # bounding keeps candidate ordering while staying finite.
        x = jnp.clip((x - state.scaler_mean) / state.scaler_std, -100.0, 100.0)
        mean, logvar = self.model.apply(state.params, x)
        var = jnp.exp(logvar)
        mean = mean.at[..., self.reward_size:].add(states)
        if deterministic:
            samples = mean
        else:
            samples = mean + jax.random.normal(key, mean.shape) * jnp.sqrt(var)
        next_states = jnp.clip(samples[..., self.reward_size:], -1e4, 1e4)
        rewards = jnp.clip(samples[..., : self.reward_size], -1e4, 1e4)
        return next_states, rewards, var

    def imagine(
        self,
        state: DynamicsState,
        init_states: Array,
        actions: Array,
        key: Array,
        value_fn: Optional[Callable[[Array, Array], Array]] = None,
    ) -> Dict[str, Array]:
        """Roll candidate action sequences through the ensemble.

        init_states: (E, B, state_dim); actions: (H, B, action_dim) shared
        across models.  Returns dict of (H, E, B, ...) arrays
        (reference: ensemble.py:854-916).  ``value_fn(states, actions)`` adds
        per-step critic values for ARC-style terminal bootstrapping
        (reference: ensemble.py:826-840).
        """
        horizon = actions.shape[0]

        def step(carry, inp):
            states, rng = carry
            act, = inp
            rng, skey = jax.random.split(rng)
            act_tiled = jnp.broadcast_to(act[None], (self.num_ensemble,) + act.shape)
            next_states, rewards, var = self.sample(state, states, act_tiled, skey)
            out = {'states': next_states, 'rewards': rewards, 'vars': var}
            if self.use_cost and self.cost_func is not None:
                out['costs'] = self.cost_func(next_states)
            if value_fn is not None:
                out['values'] = value_fn(next_states, act_tiled)
            return (next_states, rng), out

        (_, _), traj = jax.lax.scan(step, (init_states, key), (actions,), length=horizon)
        return traj


__all__ = ['DynamicsEnsemble', 'DynamicsState', 'EnsembleModel']
