"""Kernel dispatch: fused Pallas path on TPU, lax reference path elsewhere.

Override with env ``VAE_CONNEXE_FUSED_GRU=0|1`` or ``set_fused()``.
"""

from __future__ import annotations

import os

import jax

from vae_connexe_tpu.ops.gru import GRUParams, gru_scan_heads

_FORCED: bool | None = None
if os.environ.get("VAE_CONNEXE_FUSED_GRU") in ("0", "1"):
    _FORCED = os.environ["VAE_CONNEXE_FUSED_GRU"] == "1"


def set_fused(value: bool | None) -> None:
    """Force fused (True), lax (False), or auto (None)."""
    global _FORCED
    _FORCED = value


def use_fused() -> bool:
    if _FORCED is not None:
        return _FORCED
    # Default: the unrolled straight-line recurrence (ops.gru with
    # UNROLL_MAX_T) benches FASTER than the Pallas kernel pair at the
    # reference's shapes (T=10-20, H=64-128): the Pallas launches inside the
    # training scan cost ~100us each on this runtime, while the unrolled XLA
    # form fuses across timesteps with no loop overhead at all (measured
    # 1686 vs 1516 steps/s on the p=20 north-star workload).  The fused path
    # stays available for long-T / large-H regimes where straight-line code
    # stops fitting (force with VAE_CONNEXE_FUSED_GRU=1 or set_fused(True)).
    return False


def heads_recurrence(params: GRUParams, x, h0):
    """Stacked-head GRU sequence: fused Pallas kernel (fwd + custom-VJP bwd)
    on TPU, ``lax.scan`` elsewhere.  Contract of ``ops.gru.gru_scan_heads``."""
    if use_fused():
        from vae_connexe_tpu.ops.pallas_gru import gru_scan_heads_fused
        return gru_scan_heads_fused(params, x, h0)
    return gru_scan_heads(params, x, h0)
