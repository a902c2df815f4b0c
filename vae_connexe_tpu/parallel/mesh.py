"""Mesh construction and sharding helpers.

Axes:

- ``dp``  — data parallel: window/batch axis sharded across devices; the
  loss means make gradient reduction an XLA ``psum`` inserted automatically.
- ``ep``  — head parallel: the p per-variable decoder heads are independent
  (an expert-parallel-like axis, SURVEY.md §2 row "Parallelism strategies")
  and shard on the stacked head axis of the decoder parameters.

At reference scale (hidden 64) tensor/pipeline parallelism has no payoff;
the mesh plumbing here is what larger configs (p=128 long-horizon) ride on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_ep: int = 1, n_sp: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a (dp, ep) mesh — or (dp, ep, sp) when ``n_sp > 1``.
    Defaults: all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    if n_ep < 1 or n_sp < 1:
        raise ValueError(f"n_ep/n_sp must be >= 1, got {n_ep}/{n_sp}")
    if n_dp is None:
        if len(devices) % (n_ep * n_sp):
            raise ValueError(
                f"cannot infer n_dp: {len(devices)} devices not divisible by "
                f"n_ep*n_sp={n_ep * n_sp}; pass n_dp explicitly or choose "
                f"factors dividing the device count")
        n_dp = len(devices) // (n_ep * n_sp)
    if n_dp * n_ep * n_sp > len(devices):
        raise ValueError(
            f"mesh ({n_dp} dp × {n_ep} ep × {n_sp} sp) = "
            f"{n_dp * n_ep * n_sp} devices, but only {len(devices)} "
            f"available — reduce the mesh or provision more devices "
            f"(tests force 8 virtual CPU devices via XLA_FLAGS)")
    if n_sp > 1:
        dev_array = np.asarray(devices[: n_dp * n_ep * n_sp]).reshape(
            n_dp, n_ep, n_sp)
        return Mesh(dev_array, axis_names=("dp", "ep", "sp"))
    dev_array = np.asarray(devices[: n_dp * n_ep]).reshape(n_dp, n_ep)
    return Mesh(dev_array, axis_names=("dp", "ep"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/window) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def head_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading stacked-head axis over ep."""
    return NamedSharding(mesh, P("ep"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a (N, ...) array with its leading axis sharded over dp."""
    return jax.device_put(x, batch_sharding(mesh))


def global_device_put(tree, shard_tree):
    """``device_put`` a pytree onto shardings that may span processes.

    Single-process meshes take the fast path (device-to-device transfer).
    In a multi-controller run (``jax.distributed``) the target sharding is
    not fully addressable, and ``jax.device_put`` only accepts HOST values
    there — each process contributes the shards it owns from its local copy
    (which multi-controller SPMD guarantees identical across processes).
    Leaves already carrying the right global sharding pass through.

    Like ``jax.device_put``, ``shard_tree`` may be a *prefix* pytree (one
    sharding standing in for a whole subtree); it is broadcast to the full
    structure first.
    """
    shard_tree = jax.tree_util.tree_broadcast(shard_tree, tree)

    def put(x, s):
        if getattr(s, "is_fully_addressable", True):
            return jax.device_put(x, s)
        if isinstance(x, jax.Array):
            if x.sharding == s:
                return x
            if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                data = jax.device_put(np.asarray(jax.random.key_data(x)), s)
                return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
            x = np.asarray(x)
        return jax.device_put(x, s)

    return jax.tree.map(put, tree, shard_tree)


def shard_crvae_params(params, mesh: Mesh):
    """Place CRVAE params: stacked-head leaves sharded over ep, encoder
    replicated.  Works for any pytree whose head-stacked leaves have leading
    dimension == p; here we place by field name for clarity."""
    from vae_connexe_tpu.models.crvae import CRVAEParams  # local import, no cycle

    ep = head_sharding(mesh)
    rep = replicated(mesh)
    if isinstance(params, CRVAEParams):
        return CRVAEParams(
            enc=jax.device_put(params.enc, rep),
            fc_mu=jax.device_put(params.fc_mu, rep),
            fc_std=jax.device_put(params.fc_std, rep),
            heads=jax.device_put(params.heads, ep),
            readout=jax.device_put(params.readout, ep),
        )
    return jax.device_put(params, rep)
