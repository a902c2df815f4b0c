"""Lorenz-96 ODE benchmark, integrated on device.

Reference: ``/root/reference/CRVAE_lorenz96.py:700-728`` — RHS
``dx_i/dt = (x_{i+1} - x_{i-2}) x_{i-1} - x_i + F``, scipy ``odeint`` on a
uniform dt=0.1 grid with burn-in 1000, additive observation noise sd=0.1,
then per-variable standardization.  Ground-truth Granger graph: circulant
``GC[i, {i, i-1, i-2, i+1}] = 1`` (``CRVAE_lorenz96.py:756-764``).

TPU-native design: fixed-step RK4 under ``lax.scan`` replaces the adaptive
host-side odeint (the reference evaluates on the same uniform grid, so the
uniform-step integration is the matching semantics); the whole trajectory is
produced in one jit with no host round trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vae_connexe_tpu.utils.scalers import standardize


def _rhs(x: jax.Array, forcing: float) -> jax.Array:
    # roll(-1) = x_{i+1}, roll(2) = x_{i-2}, roll(1) = x_{i-1}
    return (jnp.roll(x, -1) - jnp.roll(x, 2)) * jnp.roll(x, 1) - x + forcing


@partial(jax.jit, static_argnames=("p", "t", "burn_in"))
def lorenz96(key: jax.Array, p: int = 10, t: int = 2048, forcing: float = 10.0,
             delta_t: float = 0.1, sd: float = 0.1, burn_in: int = 1000) -> jax.Array:
    """Generate a standardized (t, p) Lorenz-96 trajectory.

    Matches the reference generator's sequence: integrate burn_in + t steps
    from a N(0, 0.01²) initial state, add N(0, sd²) observation noise, drop
    the burn-in, standardize each variable over time.
    """
    k_init, k_noise = jax.random.split(key)
    x0 = 0.01 * jax.random.normal(k_init, (p,))

    def rk4_step(x, _):
        k1 = _rhs(x, forcing)
        k2 = _rhs(x + 0.5 * delta_t * k1, forcing)
        k3 = _rhs(x + 0.5 * delta_t * k2, forcing)
        k4 = _rhs(x + delta_t * k3, forcing)
        x_new = x + (delta_t / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return x_new, x_new

    _, traj = jax.lax.scan(rk4_step, x0, None, length=burn_in + t)
    traj = traj + sd * jax.random.normal(k_noise, traj.shape)
    return standardize(traj[burn_in:], axis=0).astype(jnp.float32)


def lorenz96_truth(p: int) -> jnp.ndarray:
    """Circulant ground-truth GC matrix: row i has parents {i, i-1, i-2, i+1}."""
    idx = jnp.arange(p)
    offsets = jnp.array([0, -1, -2, 1])
    gc = jnp.zeros((p, p), dtype=jnp.int32)
    for off in offsets:
        gc = gc.at[idx, (idx + off) % p].set(1)
    return gc
