"""Multi-seed causal-discovery sweeps: ``vmap`` over seeds, sharded over the
mesh — the BASELINE.json north-star sweep mode.

One compiled program trains S models simultaneously: the seed axis rides dp,
so an 8-device mesh runs 8 seeds at single-seed wall-clock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_connexe_tpu.models.crvae import CRVAE
from vae_connexe_tpu.train.config import Phase1Config
from vae_connexe_tpu.train.crvae_trainer import Phase1State, make_phase1_step


def make_sweep_fn(model: CRVAE, windows: jax.Array, parents: jax.Array,
                  cfg: Phase1Config, mesh=None):
    """Build the compiled multi-seed sweep callable ONCE.

    Returns ``run(seeds) -> dict`` with stacked per-seed GC scores
    (S, p, p), final mean_loss (S,) and best_loss (S,).  Hold on to the
    returned callable when sweeping repeatedly — each ``make_sweep_fn``
    call produces a fresh ``jax.jit`` closure, so rebuilding it per sweep
    re-traces and re-lowers the entire S×max_iter training program
    (seconds of host work per call even when the remote compile cache
    hits).
    """
    step = make_phase1_step(model, cfg, windows, parents)

    def train_one(seed):
        key = jax.random.key(seed)
        k_init, k_run = jax.random.split(key)
        params = model.init(k_init)
        state = Phase1State(params=params, prior=None, best_params=params,
                            best_loss=jnp.array(jnp.inf), key=k_run,
                            step=jnp.zeros([], jnp.int32))
        state, metrics = jax.lax.scan(step, state, None, length=cfg.max_iter)
        scores = model.gc(state.best_params, parents, threshold=False)
        return {"gc_scores": scores,
                "mean_loss": metrics["mean_loss"][-1],
                "best_loss": state.best_loss}

    fn = jax.vmap(train_one)
    if mesh is not None:
        fn = jax.jit(fn,
                     in_shardings=NamedSharding(mesh, P("dp")),
                     out_shardings=NamedSharding(mesh, P("dp")))
    else:
        fn = jax.jit(fn)

    def run(seeds: jax.Array):
        n_seeds = int(seeds.shape[0])
        if mesh is not None:
            # Pad the seed axis to a dp multiple (pjit would otherwise fail
            # with an opaque uneven-sharding error); the pad rows re-run the
            # last seed and are sliced off below.
            n_dp = mesh.shape["dp"]
            pad = (-n_seeds) % n_dp
            if pad:
                seeds = jnp.concatenate(
                    [seeds, jnp.broadcast_to(seeds[-1], (pad,))])
        # The seed vmap multiplies the decoder's hoisted pre-projection by
        # S, which trace-time shapes hide from the recurrence dispatch;
        # declare it so the in-cell-projection heuristic fires in the same
        # regimes as an S×-larger single model (measured +15% on the sweep
        # workload — RESULTS.md round 3).  Active only during the first
        # call's trace; later calls hit the compiled executable.
        from vae_connexe_tpu.ops.gru import batched_dispatch

        with batched_dispatch(int(seeds.shape[0])):
            out = fn(seeds)
        return jax.tree.map(lambda x: x[:n_seeds], out)

    return run


def sweep_phase1(model: CRVAE, windows: jax.Array, parents: jax.Array,
                 cfg: Phase1Config, seeds: jax.Array, mesh=None):
    """Train one phase-1 model per seed, all at once (one-shot wrapper
    around ``make_sweep_fn`` — build the callable directly for repeated
    sweeps).

    Args:
      windows: (N, ctx, p) shared window set (replicated).
      seeds: (S,) integer seeds.
      mesh: optional Mesh; if given, the seed axis is sharded over 'dp'.
    """
    return make_sweep_fn(model, windows, parents, cfg, mesh)(seeds)
