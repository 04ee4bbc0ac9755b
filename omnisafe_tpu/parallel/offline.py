"""Data-parallel (SPMD) wrapping of the offline training epoch.

Counterpart gap in the reference: its offline trainers are single-process
only (no distributed path at all — reference: omnisafe/algorithms/offline/
base.py:95-150 runs a plain Python loop).  Here the epoch program
(algorithms/offline/base.py:_epoch_program) is ``shard_map``-ped over a
``'dp'`` mesh axis: the train state and the device-resident dataset are
replicated, each device folds the epoch key by its axis index and samples
its OWN batches (global batch = batch_size x n_devices), and every gradient
site in the offline train steps reduces with ``pmean`` over ICI (the
``BaseOffline._pmean`` hook), keeping parameters in lockstep.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

AXIS = 'dp'


def make_mesh(num_devices: int) -> Mesh:
    devices = np.asarray(jax.devices()[:num_devices])
    return Mesh(devices, (AXIS,))


def make_distributed_epoch(algo, mesh: Mesh, steps_per_epoch: int):
    """Jitted dp epoch for a ``BaseOffline`` algorithm.

    Rebinds ``algo._pmean`` to a mesh-axis pmean, so the per-network
    gradient reductions land inside the compiled program (same collective
    placement pattern as parallel/onpolicy.py / parallel/offpolicy.py).
    """
    algo._pmean = lambda tree: jax.lax.pmean(tree, AXIS)  # noqa: SLF001

    def epoch(state, key):
        # distinct sample/train streams per device; params stay replicated
        # because every gradient is pmean'd before the optimizer applies it
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        state, metrics = algo._epoch_program(state, key, steps_per_epoch)  # noqa: SLF001
        return state, jax.tree.map(lambda m: jax.lax.pmean(m, AXIS), metrics)

    sharded = shard_map(
        epoch, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


__all__ = ['make_mesh', 'make_distributed_epoch', 'AXIS']
