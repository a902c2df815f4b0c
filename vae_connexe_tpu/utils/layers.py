"""Minimal functional layer primitives shared across the model zoo."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Dense:
    """Affine layer, torch ``nn.Linear`` layout: w (out, in), b (out,)."""

    w: jax.Array
    b: jax.Array


def init_dense(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32,
               scale: float | None = None) -> Dense:
    """torch-default init: U(-k, k) with k = 1/sqrt(d_in) for both w and b."""
    k = scale if scale is not None else 1.0 / jnp.sqrt(d_in)
    kw, kb = jax.random.split(key)
    return Dense(
        w=jax.random.uniform(kw, (d_out, d_in), dtype, -k, k),
        b=jax.random.uniform(kb, (d_out,), dtype, -k, k),
    )


def init_stacked_dense(key: jax.Array, n: int, d_in: int, d_out: int,
                       dtype=jnp.float32) -> Dense:
    """n independent Dense layers stacked on a leading axis."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda kk: init_dense(kk, d_in, d_out, dtype))(keys)


def dense(p: Dense, x: jax.Array) -> jax.Array:
    return x @ p.w.T + p.b
