"""Linear VAR(1) benchmark with a known sparse transition matrix.

Reference: ``/root/reference/CR-VAE.py:370-394`` — x_t = A x_{t-1} + 0.1 ε,
with A having self-loops of 0.6 and three cross edges
(0←1: 0.5, 1←2: 0.3, 2←0: 0.4); many independent short sequences.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def var_truth(d: int = 5) -> jnp.ndarray:
    """The reference's sparse transition matrix (continuous weights)."""
    a = jnp.zeros((d, d))
    a = a.at[jnp.arange(d), jnp.arange(d)].set(0.6)
    a = a.at[0, 1].set(0.5)
    a = a.at[1, 2].set(0.3)
    a = a.at[2, 0].set(0.4)
    return a


@partial(jax.jit, static_argnames=("n", "t"))
def var_process(key: jax.Array, a: jax.Array, n: int = 500, t: int = 30,
                noise_scale: float = 0.1) -> jax.Array:
    """n independent VAR(1) sequences of length t.  Returns (n, t, d)."""
    d = a.shape[0]
    k0, k1 = jax.random.split(key)
    x0 = 0.1 * jax.random.normal(k0, (n, d))
    noise = noise_scale * jax.random.normal(k1, (t - 1, n, d))

    def step(x, eps_t):
        x_new = x @ a.T + eps_t
        return x_new, x_new

    _, traj = jax.lax.scan(step, x0, noise)
    return jnp.concatenate([x0[:, None, :], jnp.swapaxes(traj, 0, 1)], axis=1)
