"""Sliding-window batching — the reference's entire long-context strategy.

Reference: ``arrange_input`` (``/root/reference/author_CRVAE.py:335-353``)
slides a (T, p) series into (T - ctx, ctx, p) input/target pairs, targets
shifted by one step; minibatches are random-index gathers
(``author_CRVAE.py:473``).  Here the window construction is one vectorized
gather under jit (no host loop over context positions), and batch sampling
stays on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("context",))
def arrange_input(series: jax.Array, context: int):
    """Overlapping windows with one-step-shifted targets.

    Args:
      series: (T, p) single time series.
      context: window length (≥ 1).

    Returns:
      (inputs (T - context, context, p), targets (T - context, context, p))
      where ``inputs[n, i] = series[n + i]`` and
      ``targets[n, i] = series[n + i + 1]`` — exactly the reference indexing.
    """
    t = series.shape[0]
    n = t - context
    starts = jnp.arange(n)[:, None] + jnp.arange(context)[None, :]   # (n, ctx)
    return series[starts], series[starts + 1]


@partial(jax.jit, static_argnames=("seq_len",))
def sliding_windows(series: jax.Array, seq_len: int) -> jax.Array:
    """All length-``seq_len`` windows (stride 1), as in ``CRVAE.py:220-227``.

    series: (T, p) -> (T - seq_len + 1, seq_len, p).
    """
    t = series.shape[0]
    n = t - seq_len + 1
    idx = jnp.arange(n)[:, None] + jnp.arange(seq_len)[None, :]
    return series[idx]


def sample_batch(key: jax.Array, windows: jax.Array, batch_size: int) -> jax.Array:
    """Uniform with-replacement minibatch, the reference's np.random.randint
    gather (``author_CRVAE.py:473``) as an on-device random gather."""
    idx = jax.random.randint(key, (batch_size,), 0, windows.shape[0])
    return jnp.take(windows, idx, axis=0)
