"""Multi-process (multi-host) launch — the ``torchrun`` equivalent.

The reference forks itself under ``torchrun --nproc_per_node N`` and wires
ranks through ``MASTER_ADDR`` sniffing (reference:
omnisafe/utils/distributed.py:83-139).  The TPU-native equivalent is
``jax.distributed.initialize``: every process joins one JAX runtime, sees
the GLOBAL device set, and runs the same shard_map'ed SPMD programs over a
mesh spanning all hosts — the per-minibatch Python-level allreduce the
reference performs is already compiled into the programs as ``pmean`` over
ICI/DCN, so nothing else changes at the algorithm layer.

On this image (one TPU chip, no second host) the path is exercised with N
local processes over virtual CPU devices and gloo collectives — the same
shape the reference's own distributed test uses (two gloo ranks on
localhost, reference: tests/test_utils.py:91-92 + distribution_train.py).

Pieces:

* :func:`fork` — parent re-launches ``sys.argv`` as N processes with
  coordinator env vars and exits with their max return code.
* :func:`maybe_initialize` — in children, joins the JAX runtime (call
  before first device use).
* :func:`globalize_state` — lifts a process-locally computed train-state
  pytree onto the global mesh (replicated leaves from identical local
  computation; dp-sharded leaves sliced per device).
* :func:`gather_pytree` — materializes a (possibly non-addressable) pytree
  on every process for checkpointing/metrics.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Any, List, Optional

import jax
import numpy as np

_NPROCS = 'OMNISAFE_TPU_NPROCS'
_PROC_ID = 'OMNISAFE_TPU_PROC_ID'
_COORD = 'OMNISAFE_TPU_COORD'


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(('localhost', 0))
        return sock.getsockname()[1]


def in_child() -> bool:
    return _PROC_ID in os.environ


def fork(parallel: int, argv: Optional[List[str]] = None) -> None:
    """Re-launch the current script as ``parallel`` coordinated processes.

    No-op when ``parallel <= 1`` or already inside a child.  The parent
    waits for all children and exits with their max return code, exactly
    like the reference's ``fork`` under torchrun (reference:
    omnisafe/utils/distributed.py:83-139 — parent never returns).
    """
    if parallel <= 1 or in_child():
        return
    coord = f'localhost:{_free_port()}'
    procs = []
    for rank in range(parallel):
        env = dict(
            os.environ,
            **{_NPROCS: str(parallel), _PROC_ID: str(rank), _COORD: coord},
        )
        procs.append(subprocess.Popen([sys.executable] + (argv or sys.argv), env=env))
    sys.exit(max(p.wait() for p in procs))


_initialized = False


def maybe_initialize() -> bool:
    """Join the JAX distributed runtime when launched by :func:`fork`.

    Must run before first device use in the process (even
    ``jax.process_count()`` would initialize the backend, hence the module
    flag).  Returns True when this process is part of a multi-process run.
    """
    global _initialized  # pylint: disable=global-statement
    if not in_child():
        return False
    if _initialized:
        return True
    jax.distributed.initialize(
        coordinator_address=os.environ[_COORD],
        num_processes=int(os.environ[_NPROCS]),
        process_id=int(os.environ[_PROC_ID]),
    )
    _initialized = True
    return True


def globalize_state(state: Any, spec_tree: Any, mesh: jax.sharding.Mesh) -> Any:
    """Lift a locally computed state pytree onto the global mesh.

    Every process computes the SAME full-size state (identical seeds →
    identical values, the TPU-native analog of the reference's
    ``sync_params`` broadcast, reference: policy_gradient.py:98-99); each
    then contributes the shards it can address.  Replicated leaves (spec
    ``P()``) keep their full value; dp-sharded leaves are sliced by the
    callback's index.
    """
    from jax.sharding import NamedSharding

    def lift(leaf, spec):
        is_key = hasattr(leaf, 'dtype') and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key)
        arr = np.asarray(jax.random.key_data(leaf) if is_key else leaf)
        sharding = NamedSharding(mesh, spec)
        out = jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
        return jax.random.wrap_key_data(out) if is_key else out

    return jax.tree.map(lift, state, spec_tree)


def gather_pytree(tree: Any) -> Any:
    """Full (global) values of a pytree on every process, as numpy."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


__all__ = ['fork', 'maybe_initialize', 'in_child', 'globalize_state', 'gather_pytree']
