"""Hénon-map benchmarks.

Two reference variants:

1. Classic 2-D Hénon map (``/root/reference/author_CRVAE.py:706-720``):
   x' = 1 - 1.4 x² + y,  y' = 0.3 x, with chain ground truth
   GC[i,i] = 1, GC[i,i-1] = 1 (``author_CRVAE.py:732-736``).
2. Coupled D-dimensional Hénon chain (``/root/reference/CRVAE.py:205-216``):
   node 0 is a plain Hénon map in itself; node p couples to p-1 through
   ``parent = e·x[t-1,p-1] + (1-e)·x[t-1,p]`` before the quadratic, with
   ground truth GC[i,i-1] = 1 for i ≥ 1 (``CRVAE.py:282-285``),
   min-max normalized to [0,1].

Both run as ``lax.scan`` recursions on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("t",))
def henon_chain(t: int = 1000) -> jax.Array:
    """Classic 2-D Hénon map from (0.1, 0.1), deterministic. Returns (t, 2)."""

    def step(state, _):
        x, y = state
        x_new = 1.0 - 1.4 * x * x + y
        y_new = 0.3 * x
        return (x_new, y_new), jnp.stack([x_new, y_new])

    _, traj = jax.lax.scan(step, (jnp.float32(0.1), jnp.float32(0.1)), None, length=t)
    return traj


def henon_truth(dim: int = 2) -> jnp.ndarray:
    """Chain GC: self-loops plus each variable caused by its predecessor.

    This is the matrix the reference evaluates against
    (``author_CRVAE.py:734-737``) — kept for parity.  Note it does NOT
    match the reference's own 2-D generator; see
    ``henon_dynamics_truth``."""
    gc = jnp.eye(dim, dtype=jnp.int32)
    gc = gc + jnp.eye(dim, k=-1, dtype=jnp.int32)
    return jnp.clip(gc, 0, 1)


def henon_dynamics_truth() -> jnp.ndarray:
    """The 2-D Hénon map's ACTUAL dependency graph.

    The reference's generator (``author_CRVAE.py:706-719``) is
    x_{t+1} = 1 − 1.4·x_t² + y_t,  y_{t+1} = 0.3·x_t — so x depends on
    {x, y} and y depends on {x} only.  The truth matrix the reference
    scores against ([[1,0],[1,1]], ``author_CRVAE.py:734-737``) is the
    generic chain convention and mislabels this system: it marks the
    absent y←y edge true and the present x←y edge false.  Models that
    learn the real dynamics are therefore capped at accuracy 0.75 under
    the reference's eval — a reference eval bug, documented here and
    reported alongside the parity row."""
    return jnp.array([[1, 1], [1, 0]], dtype=jnp.int32)


@partial(jax.jit, static_argnames=("t", "d", "burn_in"))
def coupled_henon(key: jax.Array, t: int = 3000, d: int = 6, a: float = 1.4,
                  b: float = 0.3, e: float = 0.3, burn_in: int = 100) -> jax.Array:
    """Coupled Hénon chain, min-max normalized per variable. Returns (t, d).

    The reference seeds x[0], x[1] with N(0,1) draws (``CRVAE.py:207-208``),
    which lies outside the Hénon attractor's basin for many seeds and
    diverges; here the initial state is scaled into the basin (0.1·N(0,1))
    and a short burn-in reaches the attractor before recording.
    """
    k0, k1 = jax.random.split(key)
    x_prev2 = 0.1 * jax.random.normal(k0, (d,))   # x[t-2]
    x_prev1 = 0.1 * jax.random.normal(k1, (d,))   # x[t-1]

    def step(carry, _):
        xm2, xm1 = carry
        # node 0: uncoupled; nodes 1..d-1 couple to their left neighbor.
        parent = e * jnp.roll(xm1, 1) + (1.0 - e) * xm1
        parent = parent.at[0].set(xm1[0])
        x_new = a - parent ** 2 + b * xm2
        return (xm1, x_new), x_new

    _, traj = jax.lax.scan(step, (x_prev2, x_prev1), None, length=burn_in + t - 2)
    traj = jnp.concatenate([x_prev2[None], x_prev1[None], traj], axis=0)[burn_in:]
    lo = traj.min(axis=0, keepdims=True)
    hi = traj.max(axis=0, keepdims=True)
    return ((traj - lo) / (hi - lo + 1e-7)).astype(jnp.float32)


def coupled_henon_truth(d: int = 6, include_self: bool = False) -> jnp.ndarray:
    """GC[i, i-1] = 1 for i >= 1 (the evaluation truth at ``CRVAE.py:282-285``).

    ``include_self=True`` adds the self-loops that the dynamics actually
    contain (each node depends on its own two lags).
    """
    gc = jnp.eye(d, k=-1, dtype=jnp.int32)
    if include_self:
        gc = jnp.clip(gc + jnp.eye(d, dtype=jnp.int32), 0, 1)
    return gc
