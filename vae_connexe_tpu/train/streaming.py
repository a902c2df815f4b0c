"""Out-of-core streaming trainers backed by the native window loader.

The in-memory ``fit_phase1``/``fit_phase2`` close over the full window array
in HBM and gather minibatches on device — the right call whenever the series
fits (every reference workload does; the reference itself holds all windows
in one torch tensor, ``/root/reference/author_CRVAE.py:457-476``).  For
series too long for device memory, these variants keep the windows on disk
(or host RAM) behind ``data.native_loader.NativeWindowLoader`` — the C++
mmap loader — and feed each jitted scan chunk its batches as the scan's xs.

Equivalence is exact, not approximate: the device step splits its key chain
identically in both modes (``make_phase1_step(stream=True)`` draws and
discards k_batch), and the host mirrors that chain to compute the SAME
uniform window indices the device would have gathered.  threefry bits are
backend-deterministic, so streaming training is bitwise the in-memory run
batch-for-batch (pinned in ``tests/test_streaming.py``).

Pipelining: the next chunk's C++ gather runs on a host thread while the
device executes the current chunk, so disk/host IO hides behind compute
whenever gather time < chunk compute time.  Chunk sizes are capped by an
IO budget (``io_budget_bytes``) so host blocks stay bounded no matter how
large ``check_every`` is.
"""

from __future__ import annotations

import functools
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_connexe_tpu.data.native_loader import NativeWindowLoader
from vae_connexe_tpu.models.crvae import CRVAE, CRVAEParams
from vae_connexe_tpu.models.error_vae import ErrorVAE, ErrorVAEParams
from vae_connexe_tpu.models.gmm_prior import init_gmm_prior
from vae_connexe_tpu.train.config import Phase1Config, Phase2Config
from vae_connexe_tpu.train.crvae_trainer import (
    Phase1State,
    Phase2State,
    _chunk_lengths,
    _copy_tree,
    make_phase1_step,
    make_phase2_step,
)


@functools.partial(jax.jit,
                   static_argnames=("length", "batch_size", "n_windows",
                                    "n_split"))
def _index_chunk(key, length: int, batch_size: int, n_windows: int,
                 n_split: int):
    """Mirror ``length`` steps of the device key chain; return the uniform
    window indices each step's k_batch would draw, plus the advanced key.

    ``n_split`` is the step's split width (3 for phase 1: key/k_batch/k_z;
    4 for phase 2: key/k_batch/k_z/k_e) — ks[1] is k_batch in both."""
    def body(k, _):
        ks = jax.random.split(k, n_split)
        idx = jax.random.randint(ks[1], (batch_size,), 0, n_windows)
        return ks[0], idx
    return jax.lax.scan(body, key, None, length=length)


def _io_chunks(max_iter: int, check_every: int, step_bytes: int,
               io_budget_bytes: int) -> list[list[int]]:
    """check_every-aligned chunk groups, each split into sub-chunks whose
    host batch block stays under the IO budget.  Metrics/callbacks fire at
    group boundaries, matching the in-memory fit's cadence."""
    cap = max(1, io_budget_bytes // max(1, step_bytes))
    groups = []
    for length in _chunk_lengths(max_iter, check_every):
        full, rem = divmod(length, cap)
        groups.append([cap] * full + ([rem] if rem else []))
    return groups


def _skip_resumed_groups(groups: list[list[int]], start: int,
                         cfg) -> list[tuple[list[int], int]]:
    """Drop the check_every groups a resumed run already executed; return
    the remaining ones paired with their cumulative end step.  Checkpoints
    land on group boundaries, so a restored step inside a group means the
    config changed — raise, as ``_run_chunked`` does."""
    remaining = []
    cum = 0
    for group in groups:
        end = cum + sum(group)
        if end <= start:
            cum = end
            continue
        if cum < start:
            raise ValueError(
                f"resumed step {start} is not a group boundary of "
                f"check_every={cfg.check_every} / max_iter={cfg.max_iter} — "
                f"the config changed since the checkpoint was written")
        remaining.append((group, end))
        cum = end
    return remaining


def _gather_chunk(loader: NativeWindowLoader, idxs: np.ndarray,
                  context: int) -> np.ndarray:
    """(length, B) start indices -> (length, B, context, p) float32 block via
    one native fill call."""
    length, batch = idxs.shape
    flat = loader.gather(idxs.reshape(-1), context)
    return flat.reshape(length, batch, context, loader.p)


def _mesh_shardings(mesh, model_p: int, batch_size: int):
    """(replicated, per-step batch P('dp'), chunk P(None,'dp')) shardings for
    a meshed streaming fit — the host-fed (length, B, ctx, p) block lands
    batch-sharded over dp, so each device ingests only its slice."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_connexe_tpu.parallel.sharded import check_mesh_divisibility

    check_mesh_divisibility(mesh, model_p, batch_size)
    return (NamedSharding(mesh, P()),
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P(None, "dp")))


def fit_phase1_streaming(model: CRVAE, params: CRVAEParams,
                         loader: NativeWindowLoader, context: int,
                         parents: jax.Array, cfg: Phase1Config,
                         key: jax.Array, n_windows: Optional[int] = None,
                         verbose: bool = False, log_fn=print, callback=None,
                         io_budget_bytes: int = 128 << 20, mesh=None,
                         io_stats: Optional[dict] = None,
                         checkpoint_dir: Optional[str] = None,
                         checkpoint_every: int = 0, resume: bool = False):
    """Phase 1 with host-streamed minibatches; bitwise ≡ ``fit_phase1`` run
    on ``arrange_input(series, context)[0]`` of the same series and key.

    ``checkpoint_dir`` / ``checkpoint_every`` / ``resume``: mid-phase
    checkpointing as in ``fit_phase1``.  Snapshots land on check_every group
    boundaries; on resume the host key mirror restarts from the restored
    ``state.key``, so the streamed batches — and therefore the resumed fit —
    are bitwise the uninterrupted run's.

    ``io_stats``, if given, is filled with prefetch accounting:
    ``gather_wait_s`` (wall time the loop blocked on the next host block —
    ~0 when the C++ gather fully hides behind device compute) and ``chunks``.

    ``n_windows`` defaults to ``loader.t - context`` — the ``arrange_input``
    window count the in-memory fit samples from (its windows carry one extra
    trailing step of lookahead for the shifted-target variant; the CRVAE
    trainers never index it).

    ``mesh`` (a (dp, ep) ``jax.sharding.Mesh``) runs the same streamed loop
    mesh-sharded: each host-gathered chunk lands batch-sharded over dp (one
    device ingests only its B/dp slice), decoder heads shard over ep, and
    the training state lives on the mesh across chunks — the out-of-core
    feed composed with the distributed fit (equal to the single-device
    streaming run up to reduction-order rounding).
    """
    if n_windows is None:
        n_windows = loader.t - context

    prior = None
    if cfg.latent_reg == "cs":
        key, k_prior = jax.random.split(key)
        prior = init_gmm_prior(k_prior, cfg.gmm_components, model.hidden)

    rep = batch_shard = chunk_shard = state_shard = None
    if mesh is not None:
        from vae_connexe_tpu.parallel.sharded import phase1_state_sharding

        rep, batch_shard, chunk_shard = _mesh_shardings(
            mesh, model.p, cfg.batch_size)
        state_shard = phase1_state_sharding(mesh, prior is not None)
        parents = jax.device_put(parents, rep)

    if not cfg.resample_batches:
        # Fixed-batch parity mode: one host gather up front, then the scan
        # runs without xs exactly like the in-memory fixed-batch fit.
        key, k_fix = jax.random.split(key)
        idx = np.asarray(jax.random.randint(k_fix, (cfg.batch_size,), 0,
                                            n_windows), np.int64)
        fixed = jnp.asarray(loader.gather(idx, context))
        if mesh is not None:
            fixed = jax.device_put(fixed, batch_shard)
        step = make_phase1_step(model, cfg, None, parents, fixed_batch=fixed,
                                batch_sharding=batch_shard)

        jit_kw = ({} if mesh is None else
                  dict(in_shardings=(state_shard,),
                       out_shardings=(state_shard, rep)))

        @functools.partial(jax.jit, static_argnames=("length",),
                           donate_argnums=(0,), **jit_kw)
        def run_fixed(state, length):
            return jax.lax.scan(step, state, None, length=length)
    else:
        step = make_phase1_step(model, cfg, None, parents, stream=True,
                                batch_sharding=batch_shard)

        jit_kw = ({} if mesh is None else
                  dict(in_shardings=(state_shard, chunk_shard),
                       out_shardings=(state_shard, rep)))

        @functools.partial(jax.jit, donate_argnums=(0,), **jit_kw)
        def run_chunk(state, batches):
            return jax.lax.scan(step, state, batches)

    state = Phase1State(params=_copy_tree(params), prior=prior,
                        best_params=_copy_tree(params),
                        best_loss=jnp.array(jnp.inf), key=_copy_tree(key),
                        step=jnp.zeros([], jnp.int32))
    from vae_connexe_tpu.train.crvae_trainer import (_make_checkpointer,
                                                     _run_chunked)
    ckpt = _make_checkpointer(checkpoint_dir, checkpoint_every)
    resume_metrics = None
    if ckpt is not None and resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, resume_metrics = restored
    if mesh is not None:
        state = jax.device_put(state, state_shard)

    if not cfg.resample_batches:
        state, metrics = _run_chunked(run_fixed, state, cfg, ckpt,
                                      resume_metrics, verbose, log_fn,
                                      callback, "phase1")
        return state.best_params, state, metrics

    step_bytes = cfg.batch_size * context * model.p * 4
    groups = _io_chunks(cfg.max_iter, cfg.check_every, step_bytes,
                        io_budget_bytes)
    remaining = _skip_resumed_groups(groups, int(state.step), cfg)
    flat = [length for group, _ in remaining for length in group]

    # The host key mirror starts from the CURRENT state key — the initial
    # key on a fresh fit, the restored one on resume — so the streamed
    # batches continue the device chain exactly.  (state.key is only read
    # here, before any donating run_chunk call.)
    mirror_key = state.key
    metrics = dict(resume_metrics) if resume_metrics else {}
    gather_wait = 0.0
    with ThreadPoolExecutor(1) as pool:
        def prepare(mk, length):
            mk, idxs = _index_chunk(mk, length, cfg.batch_size, n_windows, 3)
            return mk, pool.submit(_gather_chunk, loader,
                                   np.asarray(idxs, np.int64), context)

        if flat:
            mirror_key, fut = prepare(mirror_key, flat[0])
        i = 0
        for group, end in remaining:
            for _ in group:
                t0 = time.perf_counter()
                batches = fut.result()
                gather_wait += time.perf_counter() - t0
                i += 1
                if i < len(flat):
                    mirror_key, fut = prepare(mirror_key, flat[i])
                # Host np block in, jit places it per in_shardings (batch
                # axis over dp on a mesh; device 0 otherwise).
                state, chunk_metrics = run_chunk(state, batches)
            metrics = {k: float(v[-1]) for k, v in chunk_metrics.items()}
            if ckpt is not None:
                ckpt.maybe_save(state, metrics, final=(end == cfg.max_iter))
            if verbose:
                log_fn(f"[phase1 it={int(state.step)}] "
                       + " ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
            if callback is not None:
                callback(int(state.step), state, metrics)
    if io_stats is not None:
        io_stats.update(gather_wait_s=gather_wait, chunks=len(flat))
    return state.best_params, state, metrics


def fit_phase2_streaming(model: CRVAE, err_model: ErrorVAE,
                         params: CRVAEParams, err_params: ErrorVAEParams,
                         loader: NativeWindowLoader, context: int,
                         parents: jax.Array, cfg: Phase2Config,
                         key: jax.Array, n_windows: Optional[int] = None,
                         verbose: bool = False, log_fn=print, callback=None,
                         io_budget_bytes: int = 128 << 20, mesh=None,
                         checkpoint_dir: Optional[str] = None,
                         checkpoint_every: int = 0, resume: bool = False):
    """Phase 2 with host-streamed minibatches; bitwise ≡ ``fit_phase2`` on
    the same series/key (the phase-2 step always resamples).  ``mesh`` as in
    ``fit_phase1_streaming`` (chunk batches land dp-sharded; the error VAE
    stays replicated, its gradients psum over dp).  ``checkpoint_dir`` /
    ``checkpoint_every`` / ``resume``: mid-phase checkpointing as in
    ``fit_phase1_streaming``."""
    if n_windows is None:
        n_windows = loader.t - context

    prior = None
    if cfg.latent_reg == "cs":
        key, k_prior = jax.random.split(key)
        prior = init_gmm_prior(k_prior, cfg.gmm_components, model.hidden)

    rep = batch_shard = chunk_shard = state_shard = None
    if mesh is not None:
        from vae_connexe_tpu.parallel.sharded import phase2_state_sharding

        rep, batch_shard, chunk_shard = _mesh_shardings(
            mesh, model.p, cfg.batch_size)
        state_shard = phase2_state_sharding(mesh, prior is not None)
        parents = jax.device_put(parents, rep)

    err_opt = optax.adam(cfg.lr_error)
    step = make_phase2_step(model, err_model, cfg, None, parents, err_opt,
                            stream=True, batch_sharding=batch_shard)

    jit_kw = ({} if mesh is None else
              dict(in_shardings=(state_shard, chunk_shard),
                   out_shardings=(state_shard, rep)))

    @functools.partial(jax.jit, donate_argnums=(0,), **jit_kw)
    def run_chunk(state, batches):
        return jax.lax.scan(step, state, batches)

    err_params = _copy_tree(err_params)
    state = Phase2State(params=_copy_tree(params), err_params=err_params,
                        err_opt=err_opt.init(err_params), prior=prior,
                        best_params=_copy_tree(params),
                        best_loss=jnp.array(jnp.inf),
                        key=_copy_tree(key), step=jnp.zeros([], jnp.int32))
    from vae_connexe_tpu.train.crvae_trainer import _make_checkpointer
    ckpt = _make_checkpointer(checkpoint_dir, checkpoint_every)
    resume_metrics = None
    if ckpt is not None and resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, resume_metrics = restored
    if mesh is not None:
        state = jax.device_put(state, state_shard)

    step_bytes = cfg.batch_size * context * model.p * 4
    groups = _io_chunks(cfg.max_iter, cfg.check_every, step_bytes,
                        io_budget_bytes)
    remaining = _skip_resumed_groups(groups, int(state.step), cfg)
    flat = [length for group, _ in remaining for length in group]

    # Host mirror continues the device chain from the current state key
    # (read before any donating run_chunk call) — see fit_phase1_streaming.
    mirror_key = state.key
    metrics = dict(resume_metrics) if resume_metrics else {}
    with ThreadPoolExecutor(1) as pool:
        def prepare(mk, length):
            mk, idxs = _index_chunk(mk, length, cfg.batch_size, n_windows, 4)
            return mk, pool.submit(_gather_chunk, loader,
                                   np.asarray(idxs, np.int64), context)

        if flat:
            mirror_key, fut = prepare(mirror_key, flat[0])
        i = 0
        for group, end in remaining:
            for _ in group:
                batches = fut.result()
                i += 1
                if i < len(flat):
                    mirror_key, fut = prepare(mirror_key, flat[i])
                # Host np block in, jit places it per in_shardings (batch
                # axis over dp on a mesh; device 0 otherwise).
                state, chunk_metrics = run_chunk(state, batches)
            metrics = {k: float(v[-1]) for k, v in chunk_metrics.items()}
            if ckpt is not None:
                ckpt.maybe_save(state, metrics, final=(end == cfg.max_iter))
            if verbose:
                log_fn(f"[phase2 it={int(state.step)}] "
                       + " ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
            if callback is not None:
                callback(int(state.step), state, metrics)
    return state.best_params, state.err_params, state, metrics
