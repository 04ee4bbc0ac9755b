"""Pallas kernel correctness: linear reverse scan vs. a lax.scan oracle.

The kernel itself runs in interpreter mode here (CPU test image); the real
TPU compile path is exercised by bench.py / the driver's entry check.  The
oracle is the reference semantics: the per-step recursion the torch code
runs eagerly per path (reference: omnisafe/utils/math.py:59-82,
omnisafe/common/buffer/onpolicy_buffer.py:338-405).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnisafe_tpu.ops.pallas_scan import (
    _pallas_linear_reverse_scan,
    _xla_linear_reverse_scan,
    linear_reverse_scan,
)


def _oracle(a, b, init):
    """y[t] = b[t] + a[t] * y[t+1], y[T] = init — literal reverse loop."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    y = np.zeros_like(b)
    carry = np.asarray(init, np.float64) * np.ones(b.shape[1:])
    for t in range(a.shape[0] - 1, -1, -1):
        carry = b[t] + a[t] * carry
        y[t] = carry
    return y


@pytest.mark.parametrize(
    ('t', 'batch'),
    [(7, 3), (16, 1), (100, 64), (256, 128), (300, 130), (1024, 5)],
)
def test_pallas_scan_matches_oracle(t: int, batch: int) -> None:
    key = jax.random.key(0)
    ka, kb, ki = jax.random.split(key, 3)
    a = jax.random.uniform(ka, (t, batch), minval=0.0, maxval=1.0)
    b = jax.random.normal(kb, (t, batch))
    init = jax.random.normal(ki, (batch,))
    want = _oracle(a, b, init)

    got_pallas = _pallas_linear_reverse_scan(a, b, init, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pallas), want, rtol=1e-5, atol=1e-5)

    got_xla = _xla_linear_reverse_scan(a, b, init)
    np.testing.assert_allclose(np.asarray(got_xla), want, rtol=1e-5, atol=1e-5)


def test_pallas_scan_chunked_carry() -> None:
    """T spanning several chunks exercises the cross-chunk carry scratch."""
    t, batch = 700, 9
    key = jax.random.key(1)
    ka, kb = jax.random.split(key)
    a = jax.random.uniform(ka, (t, batch), minval=0.8, maxval=1.0)
    b = jax.random.normal(kb, (t, batch))
    init = jnp.zeros((batch,))
    want = _oracle(a, b, init)
    got = _pallas_linear_reverse_scan(a, b, init, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_dispatch_1d_and_defaults() -> None:
    x = jnp.arange(10.0)
    got = linear_reverse_scan(jnp.full_like(x, 0.9), x)
    want = _oracle(np.full((10, 1), 0.9), np.asarray(x)[:, None], 0.0)[:, 0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_discount_cumsum_unchanged_semantics() -> None:
    """discount_cumsum still matches the reference's hard-coded recursion
    (mirrors reference tests/test_utils.py:95-117)."""
    from omnisafe_tpu.utils.math import discount_cumsum, masked_discount_cumsum

    for gamma in (0.9, 0.99, 0.999):
        x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        want = np.array(
            [
                1 + gamma * 2 + gamma**2 * 3 + gamma**3 * 4,
                2 + gamma * 3 + gamma**2 * 4,
                3 + gamma * 4,
                4.0,
            ]
        )
        np.testing.assert_allclose(np.asarray(discount_cumsum(x, gamma)), want, rtol=1e-5)

    # segmented: reset after t=1 cuts the accumulator
    x = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    reset = jnp.asarray([False, True, False, False])
    got = masked_discount_cumsum(x, 0.5, reset)
    np.testing.assert_allclose(np.asarray(got), [1.5, 1.0, 1.5, 1.0], rtol=1e-6)
