"""Kernel dispatch: fused Pallas path on TPU, lax reference path elsewhere.

Override with env ``VAE_CONNEXE_FUSED_GRU=0|1`` or ``set_fused()``.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

from vae_connexe_tpu.ops.gru import UNROLL_MAX_T, GRUParams, gru_scan_heads

_FORCED: bool | None = None
if os.environ.get("VAE_CONNEXE_FUSED_GRU") in ("0", "1"):
    _FORCED = os.environ["VAE_CONNEXE_FUSED_GRU"] == "1"

# Short-T fused-dispatch cutoffs (tunable, like ops.gru.UNROLL_MAX_T).
# Measured anchor points on v5e (RESULTS.md round-2 A/B grid): fused wins at
# (p=128, B=64) 287 vs 211 steps/s; unrolled wins at (p=128, B=256) 75 vs 32,
# (p=40, B=256) 174 vs 115, (p=20, B=256) 3083 vs ~2030.  Configs in the
# unmeasured gap (B≈128, heads 40-95) land on whichever side of these
# constants — A/B with VAE_CONNEXE_FUSED_GRU=0/1 before trusting the default
# there.
FUSED_SHORT_T_MIN_HEADS = 96
FUSED_SHORT_T_MAX_BATCH = 96


def set_fused(value: bool | None) -> None:
    """Force fused (True), lax (False), or auto (None)."""
    global _FORCED
    _FORCED = value


# Sequence-parallel training mode: when set, stacked-head recurrences route
# through the sp pipeline (``parallel/seq_parallel.py``) — the time axis
# sharded over the mesh's sp axis, hidden state ppermuted device-to-device.
# Trace-time state (like _FORCED): the fits set it for the duration of their
# chunk loop so every (re)trace of the jitted step sees it.
_SP_CTX: tuple | None = None


def set_seq_parallel(mesh=None, axis: str = "sp",
                     batch_axis: str | None = "dp",
                     microbatches: int | None = None) -> None:
    """Enable (mesh given) or disable (None) sp routing of stacked-head
    recurrences.  ``batch_axis`` names the mesh axis the batch is sharded
    over (ignored if the mesh lacks it)."""
    global _SP_CTX
    if mesh is None:
        _SP_CTX = None
        return
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        batch_axis = None
    _SP_CTX = (mesh, axis, batch_axis, microbatches)


@contextmanager
def seq_parallel(mesh, axis: str = "sp", batch_axis: str | None = "dp",
                 microbatches: int | None = None):
    """Scoped ``set_seq_parallel`` (the fits' integration point)."""
    global _SP_CTX
    prev = _SP_CTX
    set_seq_parallel(mesh, axis, batch_axis, microbatches)
    try:
        yield
    finally:
        _SP_CTX = prev


def use_fused(t_len: int, n_heads: int = 1, batch: int | None = None) -> bool:
    if _FORCED is not None:
        return _FORCED
    if jax.default_backend() != "tpu":
        return False
    # Measured regimes on v5e (RESULTS.md "Optimizations evaluated"):
    # - long T (> UNROLL_MAX_T): the time-tiled fused kernels win — the
    #   kernel pays one launch and keeps h in VMEM, while lax.scan pays
    #   per-iteration while-loop overhead T times (and the unrolled form
    #   is kept to T <= 64 to bound program size).
    # - short T, large batch: the unrolled straight-line recurrence wins —
    #   big hoisted MXU dots at B=256 beat the kernel (p=20: 3083 vs
    #   ~2030; p=40 h=128: 174 vs 115; p=128 B=256: 75 vs 32 steps/s).
    # - short T, SMALL batch with many heads (the xl serving/training
    #   regime, p=128 B=64 ctx=40): the fused kernel wins 287 vs 211 —
    #   with little per-op work the unrolled path hits the in-device
    #   per-op latency floor, while the kernel's batched in-VMEM steps
    #   don't pay it.
    if t_len > UNROLL_MAX_T:
        return True
    return (n_heads >= FUSED_SHORT_T_MIN_HEADS
            and batch is not None and batch <= FUSED_SHORT_T_MAX_BATCH)


def heads_recurrence(params: GRUParams, x, h0):
    """Stacked-head GRU sequence: unrolled XLA for short sequences, fused
    Pallas kernels (fwd + custom-VJP bwd) for long sequences on TPU,
    ``lax.scan`` otherwise.  Contract of ``ops.gru.gru_scan_heads``.

    Under an active sp context (``set_seq_parallel`` / ``seq_parallel``),
    the recurrence runs time-sharded over the mesh's sp axis instead —
    the sequence-parallel training mode; T must divide by the sp size
    (the pipeline raises a clear error rather than silently running
    locally).  Per-device compute inside the pipeline applies THIS SAME
    policy at the local chunk shape (T/sp): long local chunks ride the
    fused Pallas kernels, short ones the unrolled XLA form
    (``seq_parallel._chunk_recurrence`` dispatch)."""
    if _SP_CTX is not None:
        mesh, axis, batch_axis, m = _SP_CTX
        if mesh.shape[axis] > 1:
            from vae_connexe_tpu.parallel.seq_parallel import (
                seq_sharded_gru_heads)
            return seq_sharded_gru_heads(params, x, h0, mesh, axis,
                                         microbatches=m,
                                         batch_axis=batch_axis)
    t_len = x.shape[-2]
    if use_fused(t_len, n_heads=params.w_ih.shape[0], batch=x.shape[-3]):
        from vae_connexe_tpu.ops.pallas_gru import gru_scan_heads_fused
        return gru_scan_heads_fused(params, x, h0)
    return gru_scan_heads(params, x, h0)


def gru_sequence(params: GRUParams, x, h0):
    """Single (unstacked) GRU sequence with the same dispatch policy —
    contract of ``ops.gru.gru_scan``.  Long sequences ride the fused kernel
    as a 1-head stack."""
    from vae_connexe_tpu.ops.gru import gru_scan

    if use_fused(x.shape[-2]):
        from vae_connexe_tpu.ops.pallas_gru import gru_scan_heads_fused
        stacked = jax.tree.map(lambda a: a[None], params)
        outs, h_t = gru_scan_heads_fused(stacked, x, h0[None])
        return outs[0], h_t[0]
    return gru_scan(params, x, h0)
