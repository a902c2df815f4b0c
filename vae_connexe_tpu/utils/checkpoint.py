"""Checkpoint / resume via orbax.

The reference has no weight checkpointing at all (SURVEY.md §5): its only
persisted artifacts are the binary GC matrix — which is also the
phase-1→phase-2 handoff format (``author_CRVAE.py:787-795``) — and sample
arrays.  This module provides real checkpoints (params + opt state + PRNG
key + step) *and* keeps the GC matrix a first-class saved artifact so the
two-phase handoff contract survives restarts.
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, state: Any, gc_matrix=None) -> None:
    """Save a pytree training state (and optionally the GC matrix) to
    ``path`` (a directory)."""
    ocp = _ckptr()
    p = pathlib.Path(path).absolute()
    p.parent.mkdir(parents=True, exist_ok=True)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
        ck.save(p, state, force=True)
    if gc_matrix is not None:
        np.save(p.parent / (p.name + ".gc.npy"), np.asarray(gc_matrix))


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree of the same structure/shape as ``target``."""
    ocp = _ckptr()
    p = pathlib.Path(path).absolute()
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
        return ck.restore(p, args=ocp.args.StandardRestore(target))


def load_gc(path: str) -> np.ndarray:
    """Load the saved GC matrix companion of a checkpoint."""
    p = pathlib.Path(path).absolute()
    return np.load(p.parent / (p.name + ".gc.npy"))
