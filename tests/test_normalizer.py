"""Running-stats tests (reference analogue: tests/test_normalizer.py:26-51)."""

import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.common.normalizer import RunningStats


def test_running_stats_converge_to_stream_moments():
    rng = np.random.default_rng(0)
    data = rng.normal(loc=3.0, scale=2.0, size=(50, 16, 4)).astype(np.float32)
    stats = RunningStats.create((4,))
    for batch in data:
        stats = stats.update(jnp.asarray(batch))
    flat = data.reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(stats.mean), flat.mean(0), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(stats.std), flat.std(0), rtol=1e-2, atol=1e-2)


def test_norm_std_is_bessel_corrected_and_floored():
    """The normalization std must match the reference normalizer exactly:
    Bessel-corrected sample std, floored at 1e-2 (reference:
    omnisafe/common/normalizer.py:136-139).  The floor is what keeps
    sparse {0,1} cost streams from exploding the normalized cost into the
    clip as soon as a handful of violations appear."""
    rng = np.random.default_rng(2)
    data = rng.normal(0.0, 1.5, size=(200,)).astype(np.float32)
    stats = RunningStats.create(())
    for batch in data.reshape(20, 10):
        stats = stats.update(jnp.asarray(batch))
    n = float(stats.count)
    expected = np.sqrt(float(stats.var) * n / (n - 1.0))
    np.testing.assert_allclose(float(stats.norm_std), expected, rtol=1e-6)

    # Near-constant stream: unfloored std would be ~0 and the normalized
    # deviation unbounded; the reference divides by the 1e-2 floor.
    const = RunningStats.create(())
    for _ in range(5):
        const = const.update(jnp.zeros((100,)))
    np.testing.assert_allclose(float(const.norm_std), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(
        float(const.normalize(jnp.asarray(0.005))), 0.5, rtol=1e-3)


def test_normalize_roundtrip():
    stats = RunningStats.create(())
    stats = stats.update(jnp.asarray(np.random.default_rng(1).normal(5.0, 3.0, size=(1000,))))
    x = jnp.asarray(7.5)
    np.testing.assert_allclose(float(stats.unnormalize(stats.normalize(x))), 7.5, rtol=1e-4)
