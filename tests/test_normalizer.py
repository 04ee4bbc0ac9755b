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


def test_normalize_roundtrip():
    stats = RunningStats.create(())
    stats = stats.update(jnp.asarray(np.random.default_rng(1).normal(5.0, 3.0, size=(1000,))))
    x = jnp.asarray(7.5)
    np.testing.assert_allclose(float(stats.unnormalize(stats.normalize(x))), 7.5, rtol=1e-4)
