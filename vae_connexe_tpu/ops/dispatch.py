"""Kernel dispatch: fused Pallas path on TPU, lax reference path elsewhere.

Override with env ``VAE_CONNEXE_FUSED_GRU=0|1`` or ``set_fused()``.
"""

from __future__ import annotations

import os

import jax

from vae_connexe_tpu.ops.gru import UNROLL_MAX_T, GRUParams, gru_scan_heads

_FORCED: bool | None = None
if os.environ.get("VAE_CONNEXE_FUSED_GRU") in ("0", "1"):
    _FORCED = os.environ["VAE_CONNEXE_FUSED_GRU"] == "1"


def set_fused(value: bool | None) -> None:
    """Force fused (True), lax (False), or auto (None)."""
    global _FORCED
    _FORCED = value


def use_fused(t_len: int) -> bool:
    if _FORCED is not None:
        return _FORCED
    # Measured regimes on v5e (RESULTS.md "Optimizations evaluated"):
    # - short T (<= UNROLL_MAX_T): the unrolled straight-line recurrence in
    #   ops.gru wins — Pallas launches inside the training scan cost ~100us
    #   each on this runtime, while the unrolled form has zero loop
    #   overhead (1686 vs 1516 steps/s on the p=20 north-star workload).
    # - long T: the time-tiled fused kernels win — 11.5 vs 21.5 ms/step at
    #   T=256, H=128 (lax.scan pays per-iteration while-loop overhead T
    #   times; the kernel pays one launch and keeps h in VMEM).
    return t_len > UNROLL_MAX_T and jax.default_backend() == "tpu"


def heads_recurrence(params: GRUParams, x, h0):
    """Stacked-head GRU sequence: unrolled XLA for short sequences, fused
    Pallas kernels (fwd + custom-VJP bwd) for long sequences on TPU,
    ``lax.scan`` otherwise.  Contract of ``ops.gru.gru_scan_heads``."""
    t_len = x.shape[-2]
    if use_fused(t_len):
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
