"""Trust-region solver kernels: FVP, CG direction, vmapped line search.

TPU-native re-design of the reference's TRPO/CPO machinery:

* **FVP** — the reference double-backprops through the KL per CG iteration
  (reference: omnisafe/algorithms/on_policy/base/natural_pg.py:74-119); here
  the Fisher-vector product is a ``jvp``-of-``grad`` (forward-over-reverse),
  one compiled closure reused by the ``lax.while_loop`` CG from
  ``omnisafe_tpu.utils.math``.
* **Line search** — the reference evaluates up to 15-20 shrinking step
  fractions *sequentially*, each with a full-batch loss + KL pass
  (reference: trpo.py:57-180, cpo.py:57-180).  Acceptance of fraction ``i``
  never depends on fraction ``j``, so here all candidates are evaluated in
  one ``vmap`` — a single batched forward over (num_fracs x batch) on the MXU
  — and the first acceptable fraction is selected branch-free.  Semantics
  (first accepted step wins, zero step on total failure) are identical.

Everything operates on the actor's *flattened* parameter vector via
``ravel_pytree`` — the functional equivalent of the reference's
``get_flat_params_from``/``set_param_values_to_model`` surgery
(reference: omnisafe/utils/tools.py:35-130).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from omnisafe_tpu.utils.math import conjugate_gradients

Array = jax.Array


def flatten_params(params: Any) -> Tuple[Array, Callable[[Array], Any]]:
    """Flatten a param pytree; returns (flat_vector, unravel_fn)."""
    return ravel_pytree(params)


def make_fvp(
    kl_fn: Callable[[Array], Array],
    theta: Array,
    damping: float,
    pmean: Callable[[Array], Array],
) -> Callable[[Array], Array]:
    """Damped Fisher-vector product ``v -> H v + damping*v`` with the
    cross-device average the reference performs inside CG
    (reference: natural_pg.py:112)."""
    grad_kl = jax.grad(kl_fn)

    def fvp(v: Array) -> Array:
        hv = jax.jvp(grad_kl, (theta,), (v,))[1]
        return pmean(hv) + damping * v

    return fvp


class LineSearchResult(NamedTuple):
    step: Array           # final (possibly zero) parameter delta, flat
    accept_step: Array    # 1-based index of the accepted trial; 0 = rejected
    final_kl: Array       # KL at the accepted candidate (0 if rejected)


def line_search(
    eval_fn: Callable[[Array], Dict[str, Array]],
    theta: Array,
    direction: Array,
    accept_fn: Callable[[Dict[str, Array]], Array],
    total_steps: int = 15,
    decay: float = 0.8,
) -> LineSearchResult:
    """Backtracking line search, all candidates evaluated in one vmap.

    ``eval_fn(theta_candidate)`` returns a dict of full-batch statistics that
    must include ``'kl'``; ``accept_fn(stats)`` maps them (vectorized over the
    candidate axis) to acceptance booleans.  Matches the reference's
    first-accept/decay-0.8/zero-on-failure behavior
    (reference: trpo.py:96-144, cpo.py:105-180).
    """
    fracs = decay ** jnp.arange(total_steps, dtype=jnp.float32)
    candidates = theta[None, :] + fracs[:, None] * direction[None, :]
    # long searches (PCPO uses 200 trials, reference: pcpo.py:124) are chunked
    # so the vmapped full-batch evaluations stay within VMEM/HBM budgets
    chunk = 32
    if total_steps > chunk:
        pad = (-total_steps) % chunk
        padded = jnp.concatenate([candidates, jnp.broadcast_to(theta, (pad, theta.shape[0]))])
        chunked = padded.reshape(-1, chunk, theta.shape[0])
        stats = jax.lax.map(jax.vmap(eval_fn), chunked)
        stats = jax.tree.map(lambda s: s.reshape(-1)[:total_steps], stats)
    else:
        stats = jax.vmap(eval_fn)(candidates)
    ok = accept_fn(stats)
    any_ok = jnp.any(ok)
    idx = jnp.argmax(ok)  # first True
    frac = jnp.where(any_ok, fracs[idx], 0.0)
    return LineSearchResult(
        step=frac * direction,
        accept_step=jnp.where(any_ok, idx + 1, 0).astype(jnp.int32),
        final_kl=jnp.where(any_ok, stats['kl'][idx], 0.0),
    )


def npg_direction(
    grads: Array,
    fvp: Callable[[Array], Array],
    cg_iters: int,
    target_kl: float,
) -> Tuple[Array, Array, Array, Array]:
    """Natural-gradient step: ``x = H^-1 g``, scaled into the KL trust region
    (reference: natural_pg.py:184-230).

    Returns (step_direction, x, xHx, alpha).
    """
    x = conjugate_gradients(fvp, grads, cg_iters)
    xHx = jnp.dot(x, fvp(x))
    alpha = jnp.sqrt(2.0 * target_kl / (xHx + 1e-8))
    return alpha * x, x, xHx, alpha


def cpo_case_and_direction(
    x: Array,
    p: Array,
    q: Array,
    r: Array,
    s: Array,
    b_grads: Array,
    ep_costs: Array,
    target_kl: float,
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """CPO 5-case feasibility analysis + analytic dual solution, branch-free.

    Faithful to the reference's ``_determine_case``/``_step_direction``
    (reference: cpo.py:215-337) but expressed with ``where``/``switch`` so the
    whole dual QP is one compiled kernel:

    * case 4 — cost gradient ~0 and constraint satisfied -> plain TRPO step
    * case 3 — entire trust region feasible                -> TRPO step
    * case 2 — boundary intersects trust region            -> dual solution
    * case 1 — infeasible, recovery possible               -> dual solution
    * case 0 — infeasible, pure cost decrease              -> -nu * p

    Returns (step_direction, optim_case, lambda_star, nu_star, A, B).
    """
    A = q - r**2 / (s + 1e-8)
    B = 2.0 * target_kl - ep_costs**2 / (s + 1e-8)

    zero_b = jnp.dot(b_grads, b_grads) <= 1e-6
    feasible = ep_costs < 0.0
    case4 = jnp.logical_and(zero_b, feasible)
    case3 = jnp.logical_and(feasible, B < 0.0)
    case2 = jnp.logical_and(feasible, B >= 0.0)
    case1 = jnp.logical_and(jnp.logical_not(feasible), B >= 0.0)
    optim_case = jnp.where(
        case4, 4, jnp.where(case3, 3, jnp.where(case2, 2, jnp.where(case1, 1, 0)))
    )

    # --- cases 3/4: plain TRPO scaling -------------------------------------
    xHx = q
    alpha = jnp.sqrt(2.0 * target_kl / (xHx + 1e-8))
    trpo_dir = alpha * x
    trpo_lam = 1.0 / (alpha + 1e-8)

    # --- cases 1/2: analytic 2x2 dual --------------------------------------
    safe_sqrt = lambda v: jnp.sqrt(jnp.maximum(v, 0.0))
    lambda_a = safe_sqrt(jnp.where(B > 0.0, A / (B + 1e-8), 0.0))
    lambda_b = safe_sqrt(q / (2.0 * target_kl))
    eps_cost = ep_costs + 1e-8
    r_c = r / eps_cost
    inf = jnp.asarray(jnp.inf)
    lambda_a_star = jnp.where(
        feasible, jnp.clip(lambda_a, 0.0, r_c), jnp.clip(lambda_a, r_c, inf)
    )
    lambda_b_star = jnp.where(
        feasible, jnp.clip(lambda_b, r_c, inf), jnp.clip(lambda_b, 0.0, r_c)
    )
    f_a = -0.5 * (A / (lambda_a_star + 1e-8) + B * lambda_a_star) - r * ep_costs / (s + 1e-8)
    f_b = -0.5 * (q / (lambda_b_star + 1e-8) + 2.0 * target_kl * lambda_b_star)
    dual_lam = jnp.where(f_a >= f_b, lambda_a_star, lambda_b_star)
    nu = jnp.maximum(dual_lam * ep_costs - r, 0.0) / (s + 1e-8)
    dual_dir = (x - nu * p) / (dual_lam + 1e-8)

    # --- case 0: pure cost decrease ----------------------------------------
    rec_nu = jnp.sqrt(2.0 * target_kl / (s + 1e-8))
    rec_dir = -rec_nu * p

    use_trpo = optim_case >= 3
    use_dual = jnp.logical_and(optim_case >= 1, optim_case <= 2)
    step_direction = jnp.where(
        use_trpo, trpo_dir, jnp.where(use_dual, dual_dir, rec_dir)
    )
    lambda_star = jnp.where(use_trpo, trpo_lam, jnp.where(use_dual, dual_lam, 0.0))
    nu_star = jnp.where(use_trpo, 0.0, jnp.where(use_dual, nu, rec_nu))
    A_out = jnp.where(case4, 0.0, A)
    B_out = jnp.where(case4, 0.0, B)
    return step_direction, optim_case, lambda_star, nu_star, A_out, B_out


__all__ = [
    'flatten_params',
    'make_fvp',
    'line_search',
    'LineSearchResult',
    'npg_direction',
    'cpo_case_and_direction',
]
