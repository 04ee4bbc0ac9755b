"""Pallas TPU kernel for first-order linear recurrences over time.

Every advantage/return estimator in the on-policy stack — GAE, rewards-to-go,
V-trace, and the plain ``discount_cumsum`` (reference:
omnisafe/utils/math.py:59-82, omnisafe/common/buffer/onpolicy_buffer.py:299-405)
— is an instance of the reverse linear recurrence

    y[t] = b[t] + a[t] * y[t+1],        y[T] = init,

over a ``(T, B)`` rollout.  The reference evaluates these with per-path
float64 Python loops on the host; the portable JAX version is a
``lax.associative_scan`` (log-depth, O(log T) passes over HBM).  This module
provides the TPU single-HBM-pass version.

Kernel structure (v2, round 3): three levels matched to the hardware —
(1) three masked span-doubling steps produce suffix aggregates within each
native (8, 128) sublane tile (parallel VPU work, 3 rolls instead of the
previous log2(chunk)); (2) a statically unrolled FMA chain over the
chunk/8 tile-head rows propagates y across tiles (chunk/8 latency-bound
steps instead of chunk); (3) one broadcast FMA applies each tile's carry.
Per element that is ~6 vreg-ops against v1's ~2·log2(chunk) roll passes.

Measured ceiling: on this image's tunneled v5e the kernel executes at the
SAME chained-dispatch throughput as a zero-compute pallas copy kernel
moving identical bytes (~170-200 GB/s for both, measured with forced value
fetches on fresh inputs) — i.e. the kernel saturates the environment's
achievable HBM rate; the gap to the ~819 GB/s nameplate is a property of
the remote-chip execution path, not of the kernel (see
benchmarks/tpu_suite.py::bench_pallas_roofline, which reports the copy
ceiling alongside).

Dispatch: :func:`linear_reverse_scan` uses the Pallas kernel on TPU backends
and the associative-scan form elsewhere (CPU tests, GPU).  Both produce
bit-comparable float32 results; ``tests/test_pallas_ops.py`` checks them
against a ``lax.scan`` oracle, with the kernel in interpreter mode.
Roofline measurement: benchmarks/tpu_suite.py::bench_pallas_roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
_SUBLANES = 8


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _scan_kernel(init_ref, a_ref, b_ref, out_ref, carry_ref, *, chunk: int):
    """One (chunk, 128) stripe, scanned hierarchically.

    Grid is (batch_tiles, time_chunks) with time iterating from the LAST
    chunk to the first (the index_map reverses block order); the carry
    scratch holds ``y`` at the top row of the chunk just processed.

    Three levels, chosen to fit the hardware:

    1. *intra-tile*: 3 masked span-doubling steps turn each native (8, 128)
       sublane tile into suffix aggregates (row r holds the segment r..7 of
       its tile) — parallel VPU work, 3 rolls instead of log2(chunk);
    2. *tile chain*: a statically unrolled serial FMA chain over the
       chunk/8 tile-head rows propagates y across tiles — only chunk/8
       latency-bound steps instead of chunk;
    3. *apply*: one broadcast FMA folds each tile's carry into its rows.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():  # entering a new batch stripe: seed the carry with y[T] = init
        carry_ref[0:1, :] = init_ref[:]

    a = a_ref[:]
    b = b_ref[:]
    sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, _LANES), 0) % _SUBLANES

    # level 1: suffix aggregates within each 8-row tile.  Invariant after
    # span n: a[t] = prod of a0 over [t, min(t+n, tile end)), likewise b.
    # Rows whose span would cross the tile boundary take the identity.
    for shift in (1, 2, 4):
        a_s = pltpu.roll(a, chunk - shift, axis=0)
        b_s = pltpu.roll(b, chunk - shift, axis=0)
        valid = sub < (_SUBLANES - shift)
        b = b + a * jnp.where(valid, b_s, 0.0)
        a = a * jnp.where(valid, a_s, 1.0)

    # level 2: y at the start of every tile, bottom tile first (static slices)
    carry = carry_ref[0:1, :]          # y just past this chunk's last row
    tiles = chunk // _SUBLANES
    tile_carries = [None] * tiles      # y just past tile k's last row
    for k in range(tiles - 1, -1, -1):
        tile_carries[k] = carry
        head = k * _SUBLANES
        carry = b[head:head + 1, :] + a[head:head + 1, :] * carry

    # level 3: broadcast each tile's carry over its 8 rows and apply
    carry_full = jnp.concatenate(
        [jnp.broadcast_to(c, (_SUBLANES, _LANES)) for c in tile_carries], axis=0
    )
    out_ref[:] = b + a * carry_full
    carry_ref[0:1, :] = carry          # y at this chunk's top row


@functools.partial(jax.jit, static_argnames=('chunk', 'interpret'))
def _pallas_linear_reverse_scan(
    a: Array, b: Array, init: Array, *, chunk: int = 256, interpret: bool = False
) -> Array:
    """Pallas path: a, b are (T, B) float32; init is (B,). Returns y (T, B)."""
    t, batch = a.shape
    chunk = max(min(chunk, _next_pow2(t)), _SUBLANES)
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
        scratch_shapes=[pltpu.VMEM((_SUBLANES, _LANES), jnp.float32)],
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
