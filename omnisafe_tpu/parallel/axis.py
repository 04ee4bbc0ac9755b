"""Trace-time mesh-axis context.

The TPU-native replacement for the reference's ambient
``torch.distributed`` process group (reference: omnisafe/utils/distributed.py:
48-72): components that must reduce across the data-parallel mesh axis
(running normalizers, advantage statistics, gradient averaging) discover the
active axis name here instead of calling into a global process group.  The
context is set while *tracing* a ``shard_map``-wrapped program, so the same
component code compiles to either a single-device program (no collectives) or
an SPMD program with ``psum``/``pmean`` over ICI.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

_AXIS_NAME: Optional[str] = None


def current_axis() -> Optional[str]:
    return _AXIS_NAME


@contextlib.contextmanager
def mesh_axis(name: Optional[str]) -> Iterator[None]:
    """Activate a mesh axis name for the duration of a trace."""
    global _AXIS_NAME  # pylint: disable=global-statement
    prev = _AXIS_NAME
    _AXIS_NAME = name
    try:
        yield
    finally:
        _AXIS_NAME = prev


def pmean(x, axis: Optional[str] = None):
    """Cross-device mean over the active axis (identity when single-device)."""
    name = axis if axis is not None else _AXIS_NAME
    if name is None:
        return x
    return jax.lax.pmean(x, name)


def psum(x, axis: Optional[str] = None):
    name = axis if axis is not None else _AXIS_NAME
    if name is None:
        return x
    return jax.lax.psum(x, name)


def axis_size(axis: Optional[str] = None) -> int:
    name = axis if axis is not None else _AXIS_NAME
    if name is None:
        return 1
    return jax.lax.axis_size(name)


__all__ = ['current_axis', 'mesh_axis', 'pmean', 'psum', 'axis_size']
