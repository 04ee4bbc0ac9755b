"""Checkpoint restore helpers.

The Logger writes flax-msgpack snapshots (``save/epoch-N.msgpack``); these
helpers restore them into live pytrees.  This also closes the reference's
biggest checkpoint gap — it can only *save* (reference:
omnisafe/common/logger.py:175-194); true mid-training resume is new here.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a msgpack checkpoint into nested plain dicts/arrays."""
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Newest checkpoint inside a run directory."""
    paths = glob.glob(os.path.join(run_dir, 'save', '*.msgpack'))
    return max(paths, key=os.path.getmtime) if paths else None


def restore_into(template: Any, payload: Dict[str, Any]) -> Any:
    """Restore a state-dict payload into a pytree of matching structure."""
    restored = serialization.from_state_dict(template, payload)
    # PRNG keys were stored as raw uint32 data
    return jax.tree.map(
        lambda tmpl, new: jax.random.wrap_key_data(new)
        if hasattr(tmpl, 'dtype') and jax.dtypes.issubdtype(tmpl.dtype, jax.dtypes.prng_key)
        else new,
        template,
        restored,
    )


__all__ = ['load_checkpoint', 'latest_checkpoint', 'restore_into']
