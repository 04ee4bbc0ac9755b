"""CRABS — co-trained barrier certificate for safe exploration.

Counterpart of the reference CRABS (reference:
omnisafe/algorithms/off_policy/crabs.py:56-539): SAC plus

* a learned transition-model ensemble (the reference's lightning-trained
  ``GatedTransitionModel`` becomes our jitted :class:`DynamicsEnsemble`;
  gating is a documented simplification),
* a neural barrier ``h`` with the CRABS certificate objective,
* an adversarial state pool maintained by tempered MALA (SLangevinOptimizer),
* certificate training (BarrierCertOptimizer) and adversarial policy
  regularization (PolicyAdvTraining),
* barrier-filtered safe exploration: candidate actions from the actor are
  screened by the worst-case next-step barrier U(s, a) and the safest
  candidate is taken (the reference solves a small constrained optimization
  per step; argmin-U screening is the batched equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from omnisafe_tpu.algorithms.off_policy.sac import SAC
from omnisafe_tpu.algorithms.registry import registry
from omnisafe_tpu.common.control_barrier_function.crabs import (
    Barrier,
    BarrierCertOptimizer,
    CrabsCore,
    LangevinState,
    PolicyAdvTraining,
    SLangevinOptimizer,
    StateBoxState,
    make_state_box,
)
from omnisafe_tpu.models.ensemble import DynamicsEnsemble, DynamicsState
from omnisafe_tpu.models.mlp import MLP

Array = jax.Array


@struct.dataclass
class CrabsExtra:
    """CRABS machinery carried through the off-policy train state."""

    h_params: Any
    h_opt: Any
    dynamics: DynamicsState
    langevin: LangevinState
    box: StateBoxState


@registry.register
class CRABS(SAC):
    """SAC with a co-trained barrier certificate for safe exploration."""

    # exploration is ALWAYS barrier-filtered; the reference never takes
    # uniform-random warm-up actions (reference: crabs.py:233-319 passes
    # use_rand_action=False on every rollout)
    _rand_warmup = False

    def _init(self) -> None:
        super()._init()
        crabs = self._cfgs.crabs_cfgs
        obs_dim = self._adapter.observation_space.shape[0]
        act_dim = self._adapter.action_space.shape[0]
        env = self._adapter.env
        # the raw env (under the wrapper stack) provides the SafeEnv hooks
        raw = env
        while hasattr(raw, '_env'):
            raw = raw._env  # pylint: disable=protected-access
        assert hasattr(raw, 'barrier_fn'), (
            f'{self._env_id} does not expose barrier_fn; CRABS requires a SafeEnv'
        )
        self._raw_env = raw

        self._dynamics = DynamicsEnsemble(
            state_dim=obs_dim,
            action_dim=act_dim,
            num_ensemble=int(self._cfgs.dynamics_cfgs.num_ensemble),
            elite_size=int(self._cfgs.dynamics_cfgs.elite_size),
            hidden_size=int(self._cfgs.dynamics_cfgs.hidden_size),
            batch_size=int(self._cfgs.dynamics_cfgs.batch_size),
            max_epoch=int(self._cfgs.dynamics_cfgs.max_epoch),
            gated=True,  # reference: transition_model_cfgs.type = GatedTransitionModel
        )
        barrier_net = MLP(
            hidden_sizes=tuple(crabs.barrier_hidden_sizes),
            out_dim=1,
            activation='relu',
        )
        s0 = jnp.zeros((obs_dim,))
        self._barrier = Barrier(
            barrier_net, raw.barrier_fn, s0,
            ell_coef=float(crabs.ell_coef), barrier_coef=float(crabs.barrier_coef),
        )
        self._core = CrabsCore(
            self._barrier, self._dynamics, self._actor_critic.actor,
            eps=float(crabs.eps), neg_coef=float(crabs.neg_coef),
        )
        self._s_opt = SLangevinOptimizer(
            self._core, obs_dim,
            pool_size=int(crabs.pool_size),
            lr=float(crabs.langevin_lr),
            temperature=float(crabs.langevin_temperature),
            n_steps=int(crabs.langevin_steps),
        )
        self._cert_opt = BarrierCertOptimizer(
            self._core, lr=float(crabs.cert_lr), weight_decay=float(crabs.cert_weight_decay)
        )
        self._adv_training = PolicyAdvTraining(self._core, coef=float(crabs.adv_coef))
        self._cert_iters = int(crabs.cert_iters)
        self._num_candidates = int(self._cfgs.algo_cfgs.num_candidates)
        self._s0 = s0

        self._key, h_key, dyn_key, lang_key = jax.random.split(self._key, 4)
        h_params = self._barrier.init(h_key)
        box = make_state_box(obs_dim)
        self._extra_init = CrabsExtra(
            h_params=h_params,
            h_opt=self._cert_opt.init(h_params),
            dynamics=self._dynamics.init(dyn_key),
            langevin=self._s_opt.init(lang_key, box),
            box=box,
        )
        self._crabs_step_jit = None

    def _register_extra_keys(self, log) -> None:
        super()._register_extra_keys(log)
        for key in ['Barrier/cert_loss', 'Barrier/max_obj', 'Barrier/mean_h',
                    'Barrier/langevin_accept_rate', 'Loss/DynamicsTrainMseLoss',
                    'Loss/DynamicsValMseLoss']:
            log.register_key(key)

    # -------------------------------------------------- safe exploration
    def _behavior_policy(self, st):
        """Barrier-filtered exploration (reference: models.py:440-496
        ``ExplorationPolicy``): candidates are the actor's pre-tanh mean plus
        Gaussian noise scaled by a log-spaced DECAY over candidates (the last
        candidates are essentially the mean action), and the chosen action is
        the FIRST candidate the certificate accepts (U ≤ 0) — the most
        exploratory certified-safe one — falling back to the mean action when
        none certifies.

        Deliberate deviation: the reference perturbs the already-squashed
        mean (``tanh(tanh(mu) + noise*std*decay)``, models.py:469-477 — its
        ``TanhNormal.mean`` is the squashed mean); here the noise is applied
        pre-squash (``tanh(mu + noise*std*decay)``), avoiding the double
        tanh so the decay→0 candidates converge to the actual mode instead
        of ``tanh(tanh(mu))``."""
        extra: CrabsExtra = st.extra
        n = self._num_candidates

        def policy(obs: Array, key: Array) -> Array:
            dist = self._actor_critic.actor.apply(st.params.actor, obs)
            mu, std = dist.base.loc, dist.base.scale  # pre-tanh Gaussian
            mean_act = jnp.tanh(mu)
            decay = jnp.logspace(0.0, -3.0, n)  # (n,)
            noise = jax.random.normal(key, (n,) + mu.shape)
            candidates = jnp.tanh(
                mu[None] + noise * std[None] * decay[:, None, None]
            )  # (n, B, A)
            b = obs.shape[0]
            flat_obs = jnp.broadcast_to(obs[None], (n,) + obs.shape).reshape(n * b, -1)
            flat_act = candidates.reshape(n * b, -1)
            u = self._core.u(
                extra.h_params, extra.dynamics, st.params.actor, flat_obs, flat_act
            ).reshape(n, b)
            certified = u <= 0.0
            first_safe = jnp.argmax(certified, axis=0)          # first True
            any_safe = jnp.any(certified, axis=0)
            chosen = jnp.take_along_axis(
                candidates, first_safe[None, :, None], axis=0
            )[0]
            return jnp.where(any_safe[:, None], chosen, mean_act)

        return policy

    # --------------------------------------------------- adversarial SAC
    def _loss_pi(self, actor_params, params, obs, key, extra: CrabsExtra, alpha_state):
        base = super()._loss_pi(actor_params, params, obs, key, extra, alpha_state)
        adv = self._adv_training.loss(
            actor_params, extra.h_params, extra.dynamics, extra.langevin.pool
        )
        return base + adv

    # --------------------------------------------------- barrier training
    def _between_epochs(self, state):
        extra: CrabsExtra = state.extra

        # 1. fit the transition model on replay data (host early stopping)
        size = int(state.buffer.size)
        if size >= 2:
            data = jax.device_get(state.buffer.data)
            obs = data['obs'][:size].reshape(size * self._num_envs, -1)
            act = data['act'][:size].reshape(size * self._num_envs, -1)
            next_obs = data['next_obs'][:size].reshape(size * self._num_envs, -1)
            inputs = np.concatenate([obs, act], axis=-1)
            targets = np.concatenate([np.zeros((inputs.shape[0], 1)), next_obs - obs], axis=-1)
            dyn, train_mse, val_mse = self._dynamics.train(
                extra.dynamics, inputs, targets,
                rng=np.random.default_rng(int(state.global_step)),
            )
            extra = extra.replace(
                dynamics=dyn, box=extra.box.update(jnp.asarray(obs))
            )
            self._logger.store(
                **{'Loss/DynamicsTrainMseLoss': train_mse, 'Loss/DynamicsValMseLoss': val_mse}
            )

        # 2. adversarial pool sweeps + certificate descent (jitted)
        if self._crabs_step_jit is None:
            def crabs_step(extra: CrabsExtra, actor_params):
                langevin, lang_info = self._s_opt.step(
                    extra.langevin, extra.h_params, extra.dynamics, actor_params, extra.box
                )

                def cert_body(carry, _):
                    h_params, h_opt = carry
                    h_params, h_opt, info = self._cert_opt.step(
                        h_params, h_opt, extra.dynamics, actor_params,
                        langevin.pool, self._s0,
                    )
                    return (h_params, h_opt), info

                (h_params, h_opt), cert_infos = jax.lax.scan(
                    cert_body, (extra.h_params, extra.h_opt), None, length=self._cert_iters
                )
                info = {**lang_info, **jax.tree.map(lambda x: x[-1], cert_infos)}
                return extra.replace(h_params=h_params, h_opt=h_opt, langevin=langevin), info

            self._crabs_step_jit = jax.jit(crabs_step)

        extra, info = self._crabs_step_jit(extra, state.params.actor)
        self._logger.store(**{k: float(v) for k, v in info.items()})
        return state.replace(extra=extra)


__all__ = ['CRABS', 'CrabsExtra']
