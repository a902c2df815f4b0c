"""Proximal sparsity engine — the GISTA/ISTA updates that produce the
Granger-causal graph, as pure functions over weight arrays.

The reference implements the same concept three ways (see SURVEY.md §2
cross-variant matrix); all three are exposed here:

- ``prox_column_groups``: group soft-threshold with one group per *column*
  of the torch-layout (3H, D_in) input-weight matrix — the author variant
  (``/root/reference/author_CRVAE.py:311-317``):
  W ← (W / clamp(‖W‖_col, min=λ·lr)) · clamp(‖W‖_col − λ·lr, min=0).
- ``prox_row_groups``: one group per row of a (D, H) W_in matrix
  (``CRVAE.py:145-147``): W ← W · clamp(1 − λ·lr/‖W‖_row, min=0).
- ``prox_elementwise``: plain L1 soft threshold (``CR-VAE.py:126-128``):
  W ← sign(W) · clamp(|W| − λ·lr, min=0).

All are exact prox operators of λ‖·‖ (group-L2 or L1) with step lr; the two
group forms are algebraically identical shrinkages, written to match each
reference's clamping so parity tests can pin exact values.  Each function
broadcasts over any leading stacked-head axes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def prox_column_groups(w: jax.Array, lam: float, lr: float) -> jax.Array:
    """Group soft-threshold over columns (reduce the second-to-last axis)."""
    norm = jnp.linalg.norm(w, axis=-2, keepdims=True)
    # The 1e-30 floor guards the lam*lr == 0 case (phase 2 runs with λ = 0,
    # where the prox must be the identity, not 0/0).
    denom = jnp.clip(norm, min=jnp.maximum(lam * lr, 1e-30))
    return w * (jnp.clip(norm - lam * lr, min=0.0) / denom)


def prox_row_groups(w: jax.Array, lam: float, lr: float) -> jax.Array:
    """Group soft-threshold over rows (reduce the last axis)."""
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    shrink = jnp.clip(1.0 - lam * lr / jnp.clip(norm, min=1e-30), min=0.0)
    return w * shrink


def prox_elementwise(w: jax.Array, lam: float, lr: float) -> jax.Array:
    """L1 soft threshold per element."""
    return jnp.sign(w) * jnp.clip(jnp.abs(w) - lam * lr, min=0.0)


PROX_FNS: dict[str, Callable[[jax.Array, float, float], jax.Array]] = {
    "column": prox_column_groups,
    "row": prox_row_groups,
    "element": prox_elementwise,
}


class ProximalSGDState(NamedTuple):
    count: jax.Array


def proximal_sgd(lr: float, lam: float, groups: str = "column",
                 prox_mask: optax.Params | None = None) -> optax.GradientTransformationExtraArgs:
    """SGD fused with a proximal step: p ← prox_{λ·lr}(p − lr·g).

    The reference interleaves a manual SGD sweep with an in-place prox on the
    causal weight matrices each iteration (``author_CRVAE.py:500-507``).
    Inside one jitted step that ordering is exactly "gradient update, then
    prox on selected leaves", which this transform encodes: the returned
    *update* is ``prox(p - lr·g) - p`` for leaves selected by ``prox_mask``
    (a pytree of bools matching the params; None = prox everything) and plain
    ``-lr·g`` elsewhere.

    Use with ``optax.apply_updates``.  Ordering matters: prox must see the
    post-gradient weights (SURVEY.md §7 "hard parts" #1).
    """
    prox = PROX_FNS[groups]

    def init_fn(params):
        del params
        return ProximalSGDState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None, **extra):
        del extra
        if params is None:
            raise ValueError("proximal_sgd requires params")

        def leaf_update(g, p, do_prox):
            stepped = p - lr * g
            if do_prox:
                stepped = prox(stepped, lam, lr)
            return stepped - p

        if prox_mask is None:
            new_updates = jax.tree.map(lambda g, p: leaf_update(g, p, True), updates, params)
        else:
            new_updates = jax.tree.map(leaf_update, updates, params, prox_mask)
        return new_updates, ProximalSGDState(count=state.count + 1)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
