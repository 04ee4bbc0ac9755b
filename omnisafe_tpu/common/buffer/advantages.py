"""On-policy batch assembly: segmented advantage/target scans over (T, B).

TPU-native replacement for the reference's per-path eager ``finish_path``
machinery (reference: omnisafe/common/buffer/onpolicy_buffer.py:148-405).
The reference cuts each environment's trajectory at done-time and runs a
float64 Python loop per segment; here the whole ``(T, B)`` rollout is
processed by reverse ``lax.scan``s whose accumulators reset across episode
boundaries via done masks, so no host sync or dynamic shapes are needed.

Bootstrap semantics match the reference's three cases
(reference: omnisafe/adapter/onpolicy_adapter.py:105-136):

* ``terminated``    -> next value 0,
* ``truncated``     -> next value = V(final observation),
* epoch cut (t=T-1) -> next value = V(current observation).

Supported estimators (reference: onpolicy_buffer.py:299-334): ``gae``,
``gae-rtg``, ``vtrace``, ``plain``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.ops.pallas_scan import linear_reverse_scan

Array = jax.Array


@struct.dataclass
class Trajectory:
    """Raw rollout of shape (T, B, ...) collected by the on-policy adapter."""

    obs: Array
    act: Array
    logp: Array
    reward: Array
    cost: Array
    value_r: Array
    value_c: Array
    terminated: Array
    truncated: Array
    final_value_r: Array  # V_r(final_obs) — used when truncated
    final_value_c: Array


@struct.dataclass
class OnPolicyBatch:
    """Flattened (N, ...) training data handed to the update step."""

    obs: Array
    act: Array
    logp: Array
    adv_r: Array
    adv_c: Array
    target_value_r: Array
    target_value_c: Array
    discounted_ret: Array


def _next_values(traj: Trajectory, last_value: Array, values: Array, final_values: Array) -> Array:
    """Per-step bootstrapped next value resolving the three boundary cases."""
    shifted = jnp.concatenate([values[1:], last_value[None]], axis=0)
    nv = jnp.where(traj.truncated, final_values, shifted)
    return jnp.where(traj.terminated, 0.0, nv)


def _gae(rewards, values, next_values, done, gamma, lam):
    """GAE as the linear recurrence adv[t] = delta[t] + cont[t] * adv[t+1]
    (Pallas kernel on TPU, associative scan elsewhere)."""
    deltas = rewards + gamma * next_values - values
    cont = (1.0 - done.astype(rewards.dtype)) * gamma * lam
    return linear_reverse_scan(cont, deltas)


def _rtg(rewards, next_values, done, gamma, last_value):
    """Rewards-to-go with bootstrap folded in at boundaries and the epoch cut:
    ret[t] = r[t] + gamma * (done[t] ? nv[t] : ret[t+1])."""
    d = done.astype(rewards.dtype)
    coeff = gamma * (1.0 - d)
    bias = rewards + gamma * d * next_values
    return linear_reverse_scan(coeff, bias, last_value)


def _vtrace(rewards, values, next_values, done, gamma, rhos, rho_bar=1.0, c_bar=1.0):
    """V-trace targets/advantages (reference: onpolicy_buffer.py:338-405),
    generalized with done-boundary resets: the recursion's ``last_v_s`` carry
    restarts from the bootstrap value across episode edges.

    The recursion v_s[t] = v[t] + delta[t] + gamma*c[t]*(last_v_s - nv[t]),
    last_v_s = done[t] ? nv[t] : v_s[t+1], is linear in v_s[t+1] with
    coefficient gamma*c[t]*(1-done[t])."""
    clip_rhos = jnp.minimum(rhos, rho_bar)
    clip_cs = jnp.minimum(rhos, c_bar)
    deltas = clip_rhos * (rewards + gamma * next_values - values)

    d = done.astype(rewards.dtype)
    coeff = gamma * clip_cs * (1.0 - d)
    bias = values + deltas - coeff * next_values
    v_s = linear_reverse_scan(coeff, bias, next_values[-1])

    v_s_next = jnp.concatenate([v_s[1:], next_values[-1:]], axis=0)
    v_s_next = jnp.where(done, next_values, v_s_next)
    adv = clip_rhos * (rewards + gamma * v_s_next - values)
    return v_s, adv


# pylint: disable-next=too-many-arguments,too-many-locals
def compute_batch(
    traj: Trajectory,
    last_value_r: Array,
    last_value_c: Array,
    gamma: float,
    cost_gamma: float,
    lam: float,
    lam_c: float,
    estimator: str = 'gae',
    penalty_coef: float = 0.0,
) -> OnPolicyBatch:
    """Assemble the flattened training batch from a raw (T, B) trajectory.

    Reward shaping with ``penalty_coef`` follows the reference: the shaped
    reward ``r - penalty_coef * c`` feeds the advantage/target computation
    while ``discounted_ret`` uses the raw reward
    (reference: onpolicy_buffer.py:183-203).
    """
    done = jnp.logical_or(traj.terminated, traj.truncated)
    nv_r = _next_values(traj, last_value_r, traj.value_r, traj.final_value_r)
    nv_c = _next_values(traj, last_value_c, traj.value_c, traj.final_value_c)

    discounted_ret = _rtg(traj.reward, nv_r, done, gamma, last_value_r)

    shaped_rewards = traj.reward - penalty_coef * traj.cost
    shaped_nv_r = nv_r - penalty_coef * nv_c
    shaped_last_r = last_value_r - penalty_coef * last_value_c

    if estimator == 'gae':
        adv_r = _gae(shaped_rewards, traj.value_r, shaped_nv_r, done, gamma, lam)
        target_value_r = adv_r + traj.value_r
        adv_c = _gae(traj.cost, traj.value_c, nv_c, done, cost_gamma, lam_c)
        target_value_c = adv_c + traj.value_c
    elif estimator == 'gae-rtg':
        adv_r = _gae(shaped_rewards, traj.value_r, shaped_nv_r, done, gamma, lam)
        target_value_r = _rtg(shaped_rewards, shaped_nv_r, done, gamma, shaped_last_r)
        adv_c = _gae(traj.cost, traj.value_c, nv_c, done, cost_gamma, lam_c)
        target_value_c = _rtg(traj.cost, nv_c, done, cost_gamma, last_value_c)
    elif estimator == 'vtrace':
        # behavior == target policy at collection time, so rho = 1
        rhos = jnp.ones_like(traj.logp)
        target_value_r, adv_r = _vtrace(
            shaped_rewards, traj.value_r, shaped_nv_r, done, gamma, rhos
        )
        target_value_c, adv_c = _vtrace(traj.cost, traj.value_c, nv_c, done, cost_gamma, rhos)
    elif estimator == 'plain':
        adv_r = shaped_rewards + gamma * shaped_nv_r - traj.value_r
        target_value_r = _rtg(shaped_rewards, shaped_nv_r, done, gamma, shaped_last_r)
        adv_c = traj.cost + cost_gamma * nv_c - traj.value_c
        target_value_c = _rtg(traj.cost, nv_c, done, cost_gamma, last_value_c)
    else:
        raise NotImplementedError(f'advantage estimator {estimator!r} not supported')

    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return OnPolicyBatch(
        obs=flat(traj.obs),
        act=flat(traj.act),
        logp=flat(traj.logp),
        adv_r=flat(adv_r),
        adv_c=flat(adv_c),
        target_value_r=flat(target_value_r),
        target_value_c=flat(target_value_c),
        discounted_ret=flat(discounted_ret),
    )


__all__ = ['Trajectory', 'OnPolicyBatch', 'compute_batch']
