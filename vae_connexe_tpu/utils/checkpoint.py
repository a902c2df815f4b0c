"""Checkpoint / resume via orbax.

The reference has no weight checkpointing at all (SURVEY.md §5): its only
persisted artifacts are the binary GC matrix — which is also the
phase-1→phase-2 handoff format (``author_CRVAE.py:787-795``) — and sample
arrays.  This module provides real checkpoints (params + opt state + PRNG
key + step) *and* keeps the GC matrix a first-class saved artifact so the
two-phase handoff contract survives restarts.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Optional

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


# --------------------------------------------------------------------------
# Mid-phase training checkpoints
# --------------------------------------------------------------------------

def _is_key(x) -> bool:
    return (hasattr(x, "dtype")
            and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key))


def _encode_keys(tree):
    """Typed PRNG keys -> raw uint32 key data (orbax can't store key arrays)."""
    return jax.tree.map(lambda x: jax.random.key_data(x) if _is_key(x) else x,
                        tree)


def _decode_keys(encoded, template):
    """Re-wrap key data wherever the template holds a typed key."""
    return jax.tree.map(
        lambda t, x: (jax.random.wrap_key_data(x, impl=jax.random.key_impl(t))
                      if _is_key(t) else x),
        template, encoded)


class TrainCheckpointer:
    """Periodic mid-phase checkpoints for the chunked ``fit_*`` loops.

    The reference's only resilience is an in-memory best-model ``deepcopy``
    (``/root/reference/author_CRVAE.py:547-561``) — a preempted run restarts
    from zero.  This checkpoints the FULL phase state (params, best params +
    loss, opt state, prior, PRNG key, step) at scan-chunk boundaries, so a
    killed-and-resumed fit re-executes the remaining chunks from the exact
    state the uninterrupted run had there — **bitwise** identical results
    (the chunk program is deterministic given its carried state).

    Layout under ``dir/``: ``state_<step>/`` (orbax) + ``metrics_<step>.json``
    per snapshot, with a ``LATEST`` marker written last via atomic rename —
    a kill during a save can never corrupt the previous snapshot.  Older
    snapshots are pruned after the marker lands.

    ``every`` is in steps; a save fires at the first chunk boundary at/after
    each period (so ``every`` needn't divide ``check_every``) and always at
    the final step.  ``every <= 0`` saves only the final state (which makes
    a resumed already-complete phase a pure restore, no retraining).
    """

    def __init__(self, path: str, every: int = 0):
        self.dir = pathlib.Path(path).absolute()
        self.every = int(every)
        self._last_saved: Optional[int] = None

    def latest_step(self) -> Optional[int]:
        marker = self.dir / "LATEST"
        if not marker.exists():
            return None
        return int(marker.read_text().strip())

    def save(self, state: Any, metrics: dict) -> None:
        """Snapshot ``state``.  Multi-controller safe: in a
        ``jax.distributed`` run every process calls this with the same
        (possibly cross-process-sharded) state — the orbax save is a
        collective (each process writes the shards it owns) — then one
        barrier, and only process 0 touches the metrics/LATEST marker and
        prunes, so the shared checkpoint directory is never raced.
        Assumes the multi-host convention of a shared filesystem."""
        step = int(state.step)
        self.dir.mkdir(parents=True, exist_ok=True)
        save_checkpoint(str(self.dir / f"state_{step}"), _encode_keys(state))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(
                f"vcx_ckpt_{self.dir.name}_{step}")
        if jax.process_index() == 0:
            (self.dir / f"metrics_{step}.json").write_text(json.dumps(metrics))
            tmp = self.dir / "LATEST.tmp"
            tmp.write_text(str(step))
            tmp.replace(self.dir / "LATEST")       # atomic on POSIX
            self._prune(keep=step)
        self._last_saved = step

    def maybe_save(self, state: Any, metrics: dict, final: bool) -> bool:
        step = int(state.step)
        due = (final or (self.every > 0
                         and step - (self._last_saved or 0) >= self.every))
        if due and step != self._last_saved:
            self.save(state, metrics)
        return due

    def restore(self, template: Any):
        """Return ``(state, metrics)`` at the latest snapshot, or ``None``.
        Also primes the period clock so the next save lands one ``every``
        after the restored step."""
        step = self.latest_step()
        if step is None:
            return None
        encoded = restore_checkpoint(str(self.dir / f"state_{step}"),
                                     _encode_keys(template))
        metrics = json.loads(
            (self.dir / f"metrics_{step}.json").read_text())
        self._last_saved = step
        return _decode_keys(encoded, template), metrics

    def _prune(self, keep: int) -> None:
        import shutil
        for p in self.dir.glob("state_*"):
            if p.name != f"state_{keep}":
                shutil.rmtree(p, ignore_errors=True)
        for p in self.dir.glob("metrics_*.json"):
            if p.name != f"metrics_{keep}.json":
                p.unlink(missing_ok=True)
