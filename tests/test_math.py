"""Math kernel unit tests (modeled on reference: tests/test_utils.py:95-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.utils.math import (
    conjugate_gradients,
    discount_cumsum,
    global_mean_std,
    masked_discount_cumsum,
)


def _ref_discount_cumsum(x, gamma):
    out = np.zeros_like(x)
    acc = 0.0
    for i in reversed(range(len(x))):
        acc = x[i] + gamma * acc
        out[i] = acc
    return out


@pytest.mark.parametrize('gamma', [0.9, 0.99, 0.999])
def test_discount_cumsum_matches_loop(gamma):
    x = np.arange(1.0, 11.0, dtype=np.float32)
    got = np.asarray(discount_cumsum(jnp.asarray(x), gamma))
    np.testing.assert_allclose(got, _ref_discount_cumsum(x, gamma), rtol=1e-5)


def test_discount_cumsum_batched():
    x = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    got = np.asarray(discount_cumsum(jnp.asarray(x), 0.95))
    for b in range(3):
        np.testing.assert_allclose(got[:, b], _ref_discount_cumsum(x[:, b], 0.95), rtol=1e-5)


def test_masked_discount_cumsum_segments():
    x = jnp.ones(6)
    reset = jnp.array([False, False, True, False, False, False])
    got = np.asarray(masked_discount_cumsum(x, 0.5, reset))
    # segment 1: t=0..2 -> [1+.5*(1+.5), 1+.5, 1]; segment 2: t=3..5
    np.testing.assert_allclose(got, [1.75, 1.5, 1.0, 1.75, 1.5, 1.0], rtol=1e-6)


def test_conjugate_gradients_solves_spd():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(8, 8))
    a = m @ m.T + 8 * np.eye(8)
    b = rng.normal(size=(8,))
    x = conjugate_gradients(lambda v: jnp.asarray(a, jnp.float32) @ v, jnp.asarray(b, jnp.float32), num_steps=30)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-3, atol=1e-3)


def test_global_mean_std():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(100,)).astype(np.float32))
    mean, std = global_mean_std(x)
    np.testing.assert_allclose(float(mean), float(np.mean(np.asarray(x))), rtol=1e-5)
    np.testing.assert_allclose(float(std), float(np.std(np.asarray(x))), rtol=1e-4)
