"""Pallas TPU kernel for first-order linear recurrences over time.

Every advantage/return estimator in the on-policy stack — GAE, rewards-to-go,
V-trace, and the plain ``discount_cumsum`` (reference:
omnisafe/utils/math.py:59-82, omnisafe/common/buffer/onpolicy_buffer.py:299-405)
— is an instance of the reverse linear recurrence

    y[t] = b[t] + a[t] * y[t+1],        y[T] = init,

over a ``(T, B)`` rollout.  The reference evaluates these with per-path
float64 Python loops on the host; the portable JAX version is a
``lax.associative_scan`` (log-depth, O(log T) passes).  This module provides
the TPU speed-of-light version: a single-pass Pallas kernel that

* tiles the batch axis into 128-lane stripes,
* walks the time axis in VMEM-resident chunks from last to first
  (sequential TPU grid), carrying ``y`` across chunks in a VMEM scratch, and
* scans *inside* each chunk with a vectorized Hillis-Steele pass —
  ``ceil(log2 C)`` full-width VPU steps using sublane rolls — instead of a
  row-at-a-time loop.

The recurrence is memory-bound, so one HBM read of (a, b) and one HBM write
of y is the roof.  Measured on a v5e at (T=4096, B=2048) f32 the kernel
moves data at ~170 GB/s (~21% of the ~819 GB/s HBM peak) — the in-chunk
Hillis-Steele pass
re-touches VMEM log2(chunk) times, which is the current limiter
(measurement: benchmarks/tpu_suite.py::bench_pallas_roofline).

Dispatch: :func:`linear_reverse_scan` uses the Pallas kernel on TPU backends
and the associative-scan form elsewhere (CPU tests, GPU).  Both produce
bit-comparable float32 results; ``tests/test_pallas_ops.py`` checks them
against a ``lax.scan`` oracle, with the kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _scan_kernel(init_ref, a_ref, b_ref, out_ref, carry_ref, *, chunk: int):
    """One (chunk, 128) stripe of the reverse recurrence.

    Grid is (batch_tiles, time_chunks); the time dimension iterates from the
    LAST chunk to the first (the index_map reverses block order), so the
    carry scratch holds ``y`` at the top row of the chunk just processed.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():  # entering a new batch stripe: seed the carry with y[T] = init
        carry_ref[0:1, :] = init_ref[:]

    a = a_ref[:]
    b = b_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, _LANES), 0)

    # Hillis-Steele span doubling.  Invariant after span n:
    #   a[t] = prod_{u=t}^{min(t+n,C)-1} a0[u]
    #   b[t] = sum_{s=t}^{min(t+n,C)-1} (prod_{u=t}^{s-1} a0[u]) b0[s]
    # so y[t] = b[t] + a[t] * y[chunk end] once n >= C.
    shift = 1
    while shift < chunk:
        # rolled[t] = x[(t + shift) mod C]; rows beyond the chunk end act as
        # the identity element (a=1, b=0) so wrap-around never contaminates.
        a_s = pltpu.roll(a, chunk - shift, axis=0)
        b_s = pltpu.roll(b, chunk - shift, axis=0)
        valid = rows < (chunk - shift)
        b = b + a * jnp.where(valid, b_s, 0.0)
        a = a * jnp.where(valid, a_s, 1.0)
        shift *= 2

    y = b + a * carry_ref[0:1, :]
    out_ref[:] = y
    carry_ref[0:1, :] = y[0:1, :]


@functools.partial(jax.jit, static_argnames=('chunk', 'interpret'))
def _pallas_linear_reverse_scan(
    a: Array, b: Array, init: Array, *, chunk: int = 256, interpret: bool = False
) -> Array:
    """Pallas path: a, b are (T, B) float32; init is (B,). Returns y (T, B)."""
    t, batch = a.shape
    chunk = min(chunk, _next_pow2(t))
    t_pad = -t % chunk
    b_pad = -batch % _LANES
    # Padding AFTER the real rows in time is the identity (a=1, b=0): the
    # carry y passes through pad rows unchanged, so init still lands on the
    # true last row.
    a_p = jnp.pad(a.astype(jnp.float32), ((0, t_pad), (0, b_pad)), constant_values=1.0)
    b_p = jnp.pad(b.astype(jnp.float32), ((0, t_pad), (0, b_pad)))
    init_p = jnp.pad(init.astype(jnp.float32), (0, b_pad))[None, :]

    t_chunks = (t + t_pad) // chunk
    b_tiles = (batch + b_pad) // _LANES

    out = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct(a_p.shape, jnp.float32),
        grid=(b_tiles, t_chunks),
        in_specs=[
            pl.BlockSpec((1, _LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (chunk, _LANES),
                lambda i, j, n=t_chunks: (n - 1 - j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chunk, _LANES),
                lambda i, j, n=t_chunks: (n - 1 - j, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunk, _LANES),
            lambda i, j, n=t_chunks: (n - 1 - j, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
        interpret=interpret,
    )(init_p, a_p, b_p)
    return out[:t, :batch]


def _xla_linear_reverse_scan(a: Array, b: Array, init: Array) -> Array:
    """Portable path: log-depth associative scan over the composed pairs.

    Composition of segments (earlier ∘ later):
    ``(a1, b1) ∘ (a2, b2) = (a1*a2, b1 + a1*b2)``.
    """
    b = b.at[-1].add(a[-1] * init)

    def combine(later, earlier):
        a_l, b_l = later
        a_e, b_e = earlier
        return a_e * a_l, b_e + a_e * b_l

    _, y = jax.lax.associative_scan(combine, (a, b), reverse=True)
    return y


def linear_reverse_scan(a: Array, b: Array, init: Array | None = None) -> Array:
    """Solve ``y[t] = b[t] + a[t] * y[t+1]`` (reverse in time), ``y[T] = init``.

    ``a``/``b`` are ``(T,)`` or ``(T, B)``; ``init`` broadcasts to ``(B,)``
    and defaults to zero.  Uses the Pallas TPU kernel when running on TPU and
    the XLA associative scan elsewhere.
    """
    squeeze = a.ndim == 1
    if squeeze:
        a, b = a[:, None], b[:, None]
    if init is None:
        init = jnp.zeros((a.shape[1],), a.dtype)
    else:
        init = jnp.broadcast_to(jnp.asarray(init, a.dtype), (a.shape[1],))

    if jax.default_backend() == 'tpu':
        y = _pallas_linear_reverse_scan(a, b, init)
    else:
        y = _xla_linear_reverse_scan(a, b, init)
    return y[:, 0] if squeeze else y


__all__ = ['linear_reverse_scan']
