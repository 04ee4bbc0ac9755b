"""Distribution pytree tests (reference analogue: tests/test_utils.py TanhNormal)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.utils.distributions import Normal, TanhNormal


def test_normal_log_prob_matches_analytic():
    dist = Normal(loc=jnp.zeros(2), scale=jnp.ones(2) * 2.0)
    x = jnp.array([1.0, -1.0])
    expected = sum(
        -0.5 * (v / 2.0) ** 2 - math.log(2.0) - 0.5 * math.log(2 * math.pi) for v in [1.0, -1.0]
    )
    np.testing.assert_allclose(float(dist.log_prob(x)), expected, rtol=1e-5)


def test_normal_kl_zero_for_identical():
    dist = Normal(loc=jnp.ones(3), scale=jnp.ones(3) * 0.5)
    np.testing.assert_allclose(float(dist.kl(dist)), 0.0, atol=1e-6)


def test_normal_kl_positive_and_asymmetric():
    p = Normal(loc=jnp.zeros(1), scale=jnp.ones(1))
    q = Normal(loc=jnp.ones(1) * 2.0, scale=jnp.ones(1) * 0.5)
    assert float(p.kl(q)) > 0
    assert abs(float(p.kl(q)) - float(q.kl(p))) > 1e-3


def test_normal_entropy():
    dist = Normal(loc=jnp.zeros(1), scale=jnp.ones(1))
    np.testing.assert_allclose(float(dist.entropy()), 0.5 * math.log(2 * math.pi * math.e), rtol=1e-5)


def test_tanh_normal_bounds_and_log_prob():
    dist = TanhNormal(base=Normal(loc=jnp.zeros(4), scale=jnp.ones(4)))
    key = jax.random.key(0)
    act, logp = dist.sample_with_log_prob(key)
    assert np.all(np.abs(np.asarray(act)) <= 1.0)
    # log_prob recomputed from the action agrees with the sampled log prob
    np.testing.assert_allclose(float(dist.log_prob(act)), float(logp), rtol=1e-3, atol=1e-3)
    assert np.isfinite(float(dist.log_prob(jnp.ones(4) * 0.999)))


def test_tanh_normal_mode():
    dist = TanhNormal(base=Normal(loc=jnp.array([10.0]), scale=jnp.array([1.0])))
    np.testing.assert_allclose(float(dist.mode()[0]), 1.0, atol=1e-4)
