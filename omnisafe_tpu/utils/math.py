"""Scan/solver math kernels.

TPU-native counterparts of the reference's ``omnisafe/utils/math.py``:

* ``discount_cumsum`` — the reference runs a float64 Python loop over time
  (reference: omnisafe/utils/math.py:59-82); here it is a reverse ``lax.scan``
  over the leading time axis that works batched on ``(T, B)`` arrays.
* ``conjugate_gradients`` — the reference runs a 10-step torch loop
  (reference: omnisafe/utils/math.py:86-132); here it is a ``lax.while_loop``
  with a residual-tolerance early exit, fully on-device, used by the
  NaturalPG/TRPO/CPO Fisher-vector-product solves.

Everything is pure and jit/vmap friendly.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def discount_cumsum(x: Array, discount: float) -> Array:
    """Discounted cumulative sum over the leading (time) axis.

    ``y[t] = sum_k discount^k x[t + k]``; equivalent to the reference's
    scipy-style backward recursion (reference: omnisafe/utils/math.py:59-82)
    but expressed through :func:`linear_reverse_scan` — a single-pass Pallas
    kernel on TPU, a log-depth associative scan elsewhere — and handles a
    trailing batch dimension for free.
    """
    from omnisafe_tpu.ops.pallas_scan import linear_reverse_scan

    return linear_reverse_scan(jnp.full_like(x, discount), x)


def masked_discount_cumsum(x: Array, discount: float, reset: Array) -> Array:
    """Segmented discounted cumulative sum.

    Like :func:`discount_cumsum` but the accumulator is cut *after* time steps
    where ``reset[t]`` is true — i.e. ``y[t] = x[t] + discount * (1 -
    reset[t]) * y[t+1]``.  This is how per-path ``finish_path`` calls
    (reference: omnisafe/common/buffer/onpolicy_buffer.py:148-203) become one
    batched scan over a ``(T, B)`` rollout with done masks.
    """

    from omnisafe_tpu.ops.pallas_scan import linear_reverse_scan

    cont = 1.0 - reset.astype(x.dtype)
    return linear_reverse_scan(discount * cont, x)


def conjugate_gradients(
    Avp: Callable[[Array], Array],
    b: Array,
    num_steps: int = 10,
    residual_tol: float = 1e-10,
    eps: float = 1e-6,
) -> Array:
    """Solve ``A x = b`` with CG given a matrix-vector-product closure.

    Mirrors the semantics of the reference solver (reference:
    omnisafe/utils/math.py:86-132) — fixed iteration budget with a residual
    early exit — as a bounded ``lax.while_loop`` so the whole solve stays
    inside one compiled program (one ``Avp`` is an FVP = a jvp-of-grad here,
    not a double backward).
    """

    x = jnp.zeros_like(b)
    r = b
    p = b
    rdotr = jnp.dot(r, r)

    def cond(state):
        i, _, _, _, rdotr = state
        return jnp.logical_and(i < num_steps, rdotr > residual_tol)

    def body(state):
        i, x, r, p, rdotr = state
        z = Avp(p)
        alpha = rdotr / (jnp.dot(p, z) + eps)
        x = x + alpha * p
        r = r - alpha * z
        new_rdotr = jnp.dot(r, r)
        mu = new_rdotr / (rdotr + eps)
        p = r + mu * p
        return i + 1, x, r, p, new_rdotr

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x, r, p, rdotr))
    return x


def safe_tanh(x: Array, eps: float = 1e-6) -> Array:
    """Tanh clamped away from +-1 (reference: omnisafe/utils/math.py:163-185)."""
    return jnp.clip(jnp.tanh(x), -1.0 + eps, 1.0 - eps)


def safe_atanh(x: Array, eps: float = 1e-6) -> Array:
    """Numerically safe inverse tanh (reference: omnisafe/utils/math.py:188-199)."""
    return jnp.arctanh(jnp.clip(x, -1.0 + eps, 1.0 - eps))


def global_mean_std(
    x: Array,
    axis_name: str | None = None,
) -> Tuple[Array, Array]:
    """Mean/std over all elements of ``x`` and, when ``axis_name`` is given,
    across that mesh axis too.

    TPU-native replacement for the reference's MPI-style
    ``dist_statistics_scalar`` (reference: omnisafe/utils/distributed.py:361-393):
    the cross-rank allreduce becomes a ``lax.pmean`` of the first two moments
    inside the compiled step.
    """

    mean = jnp.mean(x)
    sq = jnp.mean(jnp.square(x))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    return mean, jnp.sqrt(var)


__all__ = [
    'discount_cumsum',
    'masked_discount_cumsum',
    'conjugate_gradients',
    'safe_tanh',
    'safe_atanh',
    'global_mean_std',
]
