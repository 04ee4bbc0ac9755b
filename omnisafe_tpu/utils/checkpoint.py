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


def _is_key(x: Any) -> bool:
    return hasattr(x, 'dtype') and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def restore_into(template: Any, payload: Dict[str, Any]) -> Any:
    """Restore a state-dict payload into a pytree of matching structure."""
    restored = serialization.from_state_dict(template, payload)

    def fix_key(tmpl: Any, new: Any) -> Any:
        if _is_key(tmpl) and not _is_key(new):
            # PRNG keys were stored as raw uint32 data; fields merged back
            # from the fresh template are already key arrays.
            return jax.random.wrap_key_data(new)
        return new

    return jax.tree.map(fix_key, template, restored)


def resume_state_dict(state: Any, exclude: tuple = ()) -> Dict[str, Any]:
    """Serializable resume payload for a train-state dataclass, dropping the
    heavy transient fields (replay rings, rollout carries) named in
    ``exclude`` — those restart fresh on resume.  Excluded fields are pruned
    BEFORE the device fetch so a device-resident replay ring is never pulled
    across the (possibly tunneled) host link just to be discarded."""
    sd = serialization.to_state_dict(state)
    for name in exclude:
        sd.pop(name, None)
    return jax.device_get(sd)


def restore_resume(state: Any, payload: Dict[str, Any]) -> Any:
    """Merge a :func:`resume_state_dict` payload into a freshly initialized
    train state: fields present in the payload are restored, excluded/new
    fields keep their fresh values."""
    sd = serialization.to_state_dict(state)
    merged = {k: payload[k] if k in payload else v for k, v in sd.items()}
    return restore_into(state, merged)


__all__ = [
    'load_checkpoint',
    'latest_checkpoint',
    'restore_into',
    'resume_state_dict',
    'restore_resume',
]
