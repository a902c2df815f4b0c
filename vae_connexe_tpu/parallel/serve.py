"""Mesh-sharded serving: compensated generation with the batch sharded
over every device.

The reference's only "serving" is re-running a notebook cell on one CPU
(``author_CRVAE.py:682-684``); here generation scales out the way it is
deployed: the rollout batch splits across the mesh (each device rolls its
shard of independent samples through the 21-step chain; parameters are
tiny and replicate), so device-level throughput (RESULTS.md: 1.25-1.33M
samples/s per v5e chip) multiplies by the device count with zero
cross-device communication inside the rollout.

Sharding layout:

- sample batch: leading axis over ALL mesh axes (``P(mesh.axis_names)``)
  — serving has no gradient reduction, so every device is a batch device
  regardless of the training mesh's (dp, ep) split;
- CRVAE + error-VAE parameters: replicated (a p=20/H=64 generator is
  ~0.5 MB — far below the duplication-vs-collective crossover);
- PRNG: one key, drawn once — JAX's counter-based PRNG makes
  ``random.normal(key, (B, H))`` value-identical however the result is
  sharded, so the meshed generator matches the single-device call with
  the same key to float roundoff (only the per-shard matmul reduction
  order differs, ~1e-7 over the 21-step chain; pinned in
  ``tests/test_serve_parallel.py``).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_connexe_tpu.train.crvae_trainer import generate_with_compensation


def make_sharded_generator(model, err_model, mesh: Mesh, batch: int, *,
                           parents=None, dtype=None):
    """Build a jitted meshed generator ``fn(params, err_params, key) ->
    (batch, rollout_len, p)`` with the sample batch sharded over every
    mesh device and parameters replicated.

    ``dtype``: optional serving precision (e.g. ``jnp.bfloat16``; see
    ``CRVAE._free_run``) — composes with the sharding; output is float32
    either way.

    Raises if ``batch`` does not divide evenly over the mesh (uneven
    shards would force XLA to pad the sequential rollout chain).
    """
    n = mesh.devices.size
    if batch % n:
        raise ValueError(
            f"serving batch {batch} not divisible by the {n}-device mesh; "
            f"pad the batch to a multiple of {n} (each device rolls "
            f"batch/{n} independent samples)")
    batch_shard = NamedSharding(mesh, P(mesh.axis_names))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(rep, rep, rep),
                       out_shardings=batch_shard)
    def gen(params, err_params, key):
        return generate_with_compensation(
            model, err_model, params, err_params, key, batch,
            parents=parents, dtype=dtype)

    return gen
