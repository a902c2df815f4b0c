"""On-device normalization.

Reference: ``MinMaxScaler`` at ``/root/reference/author_CRVAE.py:355-372``
(min/max over the first two axes) and the per-variable standardization inside
the Lorenz-96 generator (``CRVAE_lorenz96.py:718-721``).
"""

from __future__ import annotations

import jax.numpy as jnp


def minmax_scale(data: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize over all axes except the last (per-feature).

    Matches the reference's double-min/double-max over axes (0, 1) of a
    (N, T, D) array; values land in [0, 1] per feature.
    """
    reduce_axes = tuple(range(data.ndim - 1))
    min_val = jnp.min(data, axis=reduce_axes)
    shifted = data - min_val
    max_val = jnp.max(shifted, axis=reduce_axes)
    return shifted / (max_val + 1e-7)


def standardize(series: jnp.ndarray, axis: int = 0, eps: float = 1e-8) -> jnp.ndarray:
    """Zero-mean unit-variance per variable along ``axis`` (time)."""
    mean = series.mean(axis=axis, keepdims=True)
    std = series.std(axis=axis, keepdims=True)
    return (series - mean) / (std + eps)
