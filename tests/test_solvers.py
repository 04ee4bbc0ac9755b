"""Trust-region solver unit tests with synthetic tensors
(reference analogue: tests/test_policy.py:55-113 drives the CPO dual across
all 5 optim cases with hand-built scalars)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.ops.trust_region import (
    cpo_case_and_direction,
    flatten_params,
    line_search,
    make_fvp,
    npg_direction,
)


def _case(q=1.0, r=0.5, s=1.0, b_norm=1.0, ep_costs=-1.0, target_kl=0.01, dim=4):
    """Build synthetic inputs with controlled feasibility geometry."""
    x = jnp.ones(dim)
    p = jnp.ones(dim) * 0.5
    b = jnp.ones(dim) * (b_norm / np.sqrt(dim))
    return cpo_case_and_direction(
        x=x, p=p, q=jnp.asarray(q), r=jnp.asarray(r), s=jnp.asarray(s),
        b_grads=b, ep_costs=jnp.asarray(ep_costs), target_kl=target_kl,
    )


def test_cpo_case4_zero_cost_gradient():
    """Feasible + ~zero cost gradient -> plain TRPO step (case 4)."""
    step, case, lam, nu, A, B = _case(b_norm=1e-6, ep_costs=-1.0)
    assert int(case) == 4
    assert float(nu) == 0.0
    # step is the TRPO scaling of x
    expected = np.sqrt(2 * 0.01 / (1.0 + 1e-8)) * np.ones(4)
    np.testing.assert_allclose(np.asarray(step), expected, rtol=1e-4)


def test_cpo_case3_entire_region_feasible():
    """Feasible and B < 0 -> case 3, TRPO step, nu = 0."""
    # B = 2*kl - c^2/s < 0 requires c^2/s > 2*kl
    step, case, lam, nu, _, B = _case(ep_costs=-1.0, s=1.0, target_kl=0.01)
    assert int(case) == 3
    assert float(B) < 0
    assert float(nu) == 0.0


def test_cpo_case2_boundary_intersects():
    """Feasible but B >= 0 -> case 2 dual solution with nu >= 0.

    Uses r < 0 (cost and reward directions oppose) so the reference's
    projection interval [0, r/c] is non-empty (cpo.py:300-320)."""
    step, case, lam, nu, A, B = _case(r=-0.5, ep_costs=-0.05, s=1.0, target_kl=0.01)
    assert int(case) == 2
    assert float(B) >= 0
    assert float(nu) >= 0.0
    assert float(lam) > 0.0


def test_cpo_case1_infeasible_recovery():
    step, case, lam, nu, _, B = _case(ep_costs=0.05, s=1.0, target_kl=0.01)
    assert int(case) == 1
    assert float(B) >= 0


def test_cpo_case0_infeasible_pure_recovery():
    """Infeasible and B < 0 -> case 0: step = -nu * p (pure cost decrease)."""
    step, case, lam, nu, _, B = _case(ep_costs=1.0, s=1.0, target_kl=0.01)
    assert int(case) == 0
    assert float(lam) == 0.0
    expected_nu = np.sqrt(2 * 0.01 / (1.0 + 1e-8))
    np.testing.assert_allclose(float(nu), expected_nu, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(step), -expected_nu * 0.5 * np.ones(4), rtol=1e-5)


def test_fvp_matches_hessian():
    """FVP of a quadratic 'KL' equals the analytic Hessian product."""
    rng = np.random.default_rng(0)
    m = rng.normal(size=(6, 6))
    H = (m @ m.T).astype(np.float32)
    theta = jnp.asarray(rng.normal(size=6).astype(np.float32))

    def kl_fn(flat):
        return 0.5 * flat @ jnp.asarray(H) @ flat

    fvp = make_fvp(kl_fn, theta, damping=0.0, pmean=lambda x: x)
    v = jnp.asarray(rng.normal(size=6).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fvp(v)), H @ np.asarray(v), rtol=1e-4)


def test_npg_direction_kl_budget():
    """The NPG step saturates the KL budget: 0.5 d^T H d == target_kl."""
    rng = np.random.default_rng(1)
    m = rng.normal(size=(6, 6))
    H = (m @ m.T + 6 * np.eye(6)).astype(np.float32)
    g = jnp.asarray(rng.normal(size=6).astype(np.float32))
    fvp = lambda v: jnp.asarray(H) @ v
    step, x, xHx, alpha = npg_direction(g, fvp, cg_iters=30, target_kl=0.01)
    kl = 0.5 * float(step @ jnp.asarray(H) @ step)
    np.testing.assert_allclose(kl, 0.01, rtol=1e-3)


def test_line_search_first_accept_semantics():
    """The vmapped search picks the FIRST acceptable fraction, decay 0.8."""
    theta = jnp.zeros(3)
    direction = jnp.ones(3)

    def eval_fn(candidate):
        # 'kl' grows with step size; accept only kl <= 0.41 (frac <= 0.512)
        return {'kl': jnp.sum(candidate) / 3.0 * 0.8}

    result = line_search(
        eval_fn, theta, direction,
        lambda stats: stats['kl'] <= 0.41,
        total_steps=10, decay=0.8,
    )
    # fracs: 1.0, .8, .64, .512 -> first accepted index 3 (1-based 4)
    assert int(result.accept_step) == 4
    np.testing.assert_allclose(np.asarray(result.step), 0.8**3 * np.ones(3), rtol=1e-5)


def test_line_search_total_rejection_zero_step():
    result = line_search(
        lambda c: {'kl': jnp.sum(c)},
        jnp.zeros(3), jnp.ones(3),
        lambda stats: jnp.zeros((), bool) | (stats['kl'] < -1.0),
        total_steps=5,
    )
    assert int(result.accept_step) == 0
    np.testing.assert_allclose(np.asarray(result.step), 0.0)
