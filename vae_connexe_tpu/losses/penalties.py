"""Penalty *values* (the non-smooth terms are applied via prox, not grad).

Reference: ``regularize`` (group-lasso value, ``author_CRVAE.py:319-322``)
and ``ridge_regularize`` (L2 on readout + hidden-hidden weights,
``author_CRVAE.py:324-328``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_lasso_value(w: jax.Array, lam: float, group_axis: int = -2) -> jax.Array:
    """λ Σ_groups ‖w_group‖₂, groups = slices along ``group_axis``.

    For a torch-layout (…, 3H, D_in) input-weight matrix, the reference's
    column groups (norm over dim=0, ``author_CRVAE.py:314``) correspond to
    group_axis=-2 (reduce the 3H rows, one group per input series).
    """
    norms = jnp.linalg.norm(w, axis=group_axis)
    return lam * jnp.sum(norms)


def ridge_value(readout_w: jax.Array, w_hh: jax.Array, lam: float) -> jax.Array:
    """λ (‖W_out‖² + ‖W_hh‖²) summed over any stacked head axes."""
    return lam * (jnp.sum(readout_w ** 2) + jnp.sum(w_hh ** 2))
