"""Generation-quality metrics.

Reference: prediction MSE stage-1 vs stage-2 (``CRVAE.py:333-350``) and
mean/std distribution match between real and generated series
(``CRVAE.py:393-405``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prediction_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def moment_match(ori: jax.Array, syn: jax.Array):
    """Per-variable mean/std of original vs synthetic, plus absolute gaps.

    ori: (T, D) or (N, T, D); syn likewise.  Returns a dict of (D,) arrays.
    """
    def moments(x):
        flat = x.reshape(-1, x.shape[-1])
        return flat.mean(0), flat.std(0)

    mo, so = moments(ori)
    ms, ss = moments(syn)
    return {
        "mean_ori": mo, "mean_syn": ms, "mean_abs_gap": jnp.abs(mo - ms),
        "std_ori": so, "std_syn": ss, "std_abs_gap": jnp.abs(so - ss),
    }
