"""Running mean/std statistics as explicit carried state.

The reference's ``Normalizer`` is a stateful ``nn.Module`` updated in-place
per step (reference: omnisafe/common/normalizer.py:28-139).  Under jit the
statistics must instead be *carried state* threaded through the rollout scan
— a tiny pytree updated with the batched parallel-variance (Chan et al.)
merge, exactly the reference's update rule, but vectorized over all envs in
one shot.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class RunningStats:
    """First/second moments plus count, merged batch-at-a-time."""

    mean: Array
    var: Array
    count: Array

    @staticmethod
    def create(shape: Tuple[int, ...] = ()) -> 'RunningStats':
        return RunningStats(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch: Array) -> 'RunningStats':
        """Merge a batch (leading axes are batch axes) into the stats.

        Same parallel-variance merge as the reference
        (reference: omnisafe/common/normalizer.py:106-139).  When a
        data-parallel mesh axis is active the batch moments are reduced
        across devices first, so the statistics stay bit-identical on every
        shard — an improvement over the reference, whose per-rank normalizers
        silently diverge (reference updates with local data only).
        """
        from omnisafe_tpu.parallel import axis as paxis  # pylint: disable=import-outside-toplevel

        feat_ndim = self.mean.ndim
        batch_axes = tuple(range(batch.ndim - feat_ndim))
        batch_count = 1.0
        for ax in batch_axes:
            batch_count *= batch.shape[ax]
        batch_mean = jnp.mean(batch, axis=batch_axes)
        batch_sq = jnp.mean(jnp.square(batch), axis=batch_axes)
        if paxis.current_axis() is not None:
            batch_mean = paxis.pmean(batch_mean)
            batch_sq = paxis.pmean(batch_sq)
            batch_count *= paxis.axis_size()
        batch_var = jnp.maximum(batch_sq - jnp.square(batch_mean), 0.0)

        delta = batch_mean - self.mean
        total = self.count + batch_count
        new_mean = self.mean + delta * batch_count / total
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * batch_count / total
        new_var = m2 / total
        return RunningStats(mean=new_mean, var=new_var, count=total)

    @property
    def std(self) -> Array:
        return jnp.sqrt(self.var)

    @property
    def norm_std(self) -> Array:
        """Std as the reference normalizer computes it for normalization:
        Bessel-corrected and FLOORED at 1e-2 (reference:
        omnisafe/common/normalizer.py:136-139 ``var = sumsq/(count-1)``;
        ``std = max(std, 1e-2)``).  The floor is what keeps sparse-cost
        normalization bounded when the violation rate is tiny."""
        bessel = self.var * self.count / jnp.maximum(self.count - 1.0, 1e-4)
        return jnp.maximum(jnp.sqrt(bessel), 1e-2)

    def normalize(self, x: Array, eps: float = 1e-8, clip: float | None = None) -> Array:
        """Standardize; clamp to ``[-clip, clip]`` when given (the reference
        normalizer clamps obs/reward/cost at +-5, reference:
        omnisafe/envs/wrapper.py:202,302,375 + common/normalizer.py:88-107)."""
        del eps
        out = (x - self.mean) / self.norm_std
        return out if clip is None else jnp.clip(out, -clip, clip)

    def unnormalize(self, x: Array, eps: float = 1e-8) -> Array:
        del eps
        return x * self.norm_std + self.mean


__all__ = ['RunningStats']
