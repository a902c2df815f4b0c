"""Two-phase CRVAE trainer (author variant), fully jit-compiled.

Phase 1 — structure learning (``/root/reference/author_CRVAE.py:460-563``):
manual SGD over all parameters, then a group-lasso proximal shrink on every
head's input-weight matrix; the pruned support of those matrices is the
learned Granger graph.  Phase 2 — generation (``author_CRVAE.py:565-701``):
re-train with the learned connection mask frozen (λ = 0), plus an
error-compensation VAE trained by Adam on the detached residuals.

TPU-native structure:

- One jitted ``step`` = forward + backward + SGD + prox + best-model
  tracking; ``fit_*`` wraps it in ``lax.scan`` chunks of ``check_every``
  steps, so the device runs ``check_every`` iterations per host round trip.
- The reference's stale-gradient ordering (backward on the *previous*
  iteration's loss, ``author_CRVAE.py:495-515``) and its phase-2 dead batch
  resample (``author_CRVAE.py:631`` draws indices it never uses) are
  notebook artifacts, normalized here to compute-loss-then-step with a fresh
  (configurable) batch; parity is judged on AUROC (SURVEY.md §7).
- Best-model early stopping (``author_CRVAE.py:547-550,561``) is a
  ``tree_map(where(...))`` select inside the step — no host deepcopy.
- The phase-1→phase-2 handoff stays a binary GC matrix, but instead of
  re-instantiating heads with shrunk input widths (``author_CRVAE.py:794``)
  the mask re-projects full-width weights each step — identical compute,
  static shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vae_connexe_tpu.losses.cs_divergence import cs_divergence_gmm
from vae_connexe_tpu.losses.kl import kl_gaussian
from vae_connexe_tpu.losses.penalties import ridge_value
from vae_connexe_tpu.models.crvae import CRVAE, CRVAEParams
from vae_connexe_tpu.models.error_vae import ErrorVAE, ErrorVAEParams
from vae_connexe_tpu.models.gmm_prior import GMMPrior, init_gmm_prior
from vae_connexe_tpu.optim.prox import prox_column_groups
from vae_connexe_tpu.train.config import Phase1Config, Phase2Config


@struct.dataclass
class Phase1State:
    params: CRVAEParams
    prior: Optional[GMMPrior]      # present when latent_reg == 'cs'
    best_params: CRVAEParams
    best_loss: jax.Array
    key: jax.Array
    step: jax.Array


@struct.dataclass
class Phase2State:
    params: CRVAEParams
    err_params: ErrorVAEParams
    err_opt: optax.OptState
    prior: Optional[GMMPrior]
    best_params: CRVAEParams
    best_loss: jax.Array
    key: jax.Array
    step: jax.Array


def _crvae_loss(model: CRVAE, cfg, params: CRVAEParams, prior: Optional[GMMPrior],
                batch: jax.Array, key: jax.Array, parents: jax.Array,
                beta: float):
    """Shared smooth loss: Σ_i MSE_i + ridge + latent regularizer."""
    pred, mu, logvar = model.forward(params, batch, key, parents)
    target = batch[:, model.enc_len:, :]
    # Σ over variables of each variable's MSE (``author_CRVAE.py:487``).
    recon = jnp.sum(jnp.mean((pred - target) ** 2, axis=(0, 1)))
    ridge = ridge_value(params.readout.w, params.heads.w_hh, cfg.lam_ridge)
    if prior is None:
        reg = beta * kl_gaussian(mu, logvar)
    else:
        reg = cfg.lambda_cs * cs_divergence_gmm(
            mu, jnp.exp(logvar), prior.mu, prior.var, variant=cfg.cs_variant).mean()
    loss = recon + ridge + reg
    aux = {"recon": recon, "ridge": ridge, "latent_reg": reg,
           "mean_loss": (recon + ridge) / model.p, "pred": pred}
    return loss, aux


def _project_and_prox(params: CRVAEParams, parents: jax.Array,
                      lam: float, lr: float) -> CRVAEParams:
    """Mask-project head input weights to the parent support, then group
    soft-threshold their columns — the GISTA step (``author_CRVAE.py:311-317``).
    With λ = 0 the prox is the identity and only the projection remains."""
    w = params.heads.w_ih * parents[:, None, :].astype(params.heads.w_ih.dtype)
    w = prox_column_groups(w, lam, lr)
    return params.replace(heads=params.heads.replace(w_ih=w))


def _chunk_lengths(max_iter: int, check_every: int) -> list[int]:
    """Split max_iter into scan-chunk lengths: full chunks of ``check_every``
    plus one remainder chunk, so exactly ``max_iter`` steps run (the naive
    ``max_iter // check_every`` silently rounds the budget)."""
    full, rem = divmod(max_iter, check_every)
    return [check_every] * full + ([rem] if rem else [])


def _copy_tree(tree):
    """Fresh device buffers for every leaf.

    The chunked fit loops donate their state to the jitted chunk
    (``donate_argnums``) so XLA reuses the state's buffers in place instead
    of double-buffering params + best-params across chunk calls.  The
    initial state must therefore not alias caller-owned arrays (callers
    reuse their ``params`` after a fit — e.g. to launch the meshed and
    single-device fits from one init), nor reference one buffer twice
    (``params`` and ``best_params`` both start from the same pytree).
    """
    return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)


def _sp_context(mesh):
    """Sequence-parallel training mode: when the fit's mesh carries an sp
    axis (size > 1), route the decode recurrence through the sp pipeline
    (``parallel/seq_parallel.py``) for every (re)trace of the chunk — the
    time axis shards over sp, the hidden state ppermutes device-to-device,
    and the batch stays dp-sharded (``ops.dispatch.seq_parallel``).  The
    reference has no long-context strategy beyond windowing (SURVEY.md §5);
    this is the build's scale-out for the sequence axis itself."""
    from contextlib import nullcontext
    if mesh is not None and mesh.shape.get("sp", 1) > 1:
        from vae_connexe_tpu.ops.dispatch import seq_parallel
        return seq_parallel(mesh)
    return nullcontext()


def _make_checkpointer(checkpoint_dir, checkpoint_every):
    if checkpoint_dir is None:
        return None
    from vae_connexe_tpu.utils.checkpoint import TrainCheckpointer
    return TrainCheckpointer(checkpoint_dir, checkpoint_every)


def _run_chunked(run_chunk, state, cfg, ckpt, resume_metrics, verbose,
                 log_fn, callback, phase: str):
    """The shared resume-aware chunk loop of both fits.

    ``state.step`` may be non-zero (a restored mid-phase checkpoint): chunks
    the uninterrupted run already executed are skipped, and the remaining
    ones re-run from the exact carried state the uninterrupted run had at
    that boundary — so a killed-and-resumed fit is **bitwise** the
    uninterrupted fit (pinned in tests/test_resume.py).  Checkpoints only
    ever land on chunk boundaries, so a restored step that is not a prefix
    sum of the chunk lengths means the config changed between runs — raise
    rather than silently train a different schedule.
    """
    start = int(state.step)
    metrics = dict(resume_metrics) if resume_metrics else {}
    done = 0
    for length in _chunk_lengths(cfg.max_iter, cfg.check_every):
        end = done + length
        if end <= start:
            done = end
            continue
        if done < start:
            raise ValueError(
                f"resumed step {start} is not a chunk boundary of "
                f"check_every={cfg.check_every} / max_iter={cfg.max_iter} — "
                f"the config changed since the checkpoint was written")
        done = end
        state, chunk_metrics = run_chunk(state, length)
        metrics = {k: float(v[-1]) for k, v in chunk_metrics.items()}
        if ckpt is not None:
            ckpt.maybe_save(state, metrics, final=(done == cfg.max_iter))
        if verbose:
            log_fn(f"[{phase} it={int(state.step)}] "
                   + " ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
        if callback is not None:
            callback(int(state.step), state, metrics)
    return state, metrics


def _track_best(state, candidate_params, mean_loss):
    """Snapshot ``candidate_params`` when ``mean_loss`` improves.

    ``mean_loss`` is measured at the *pre-update* parameters, so callers must
    pass those as the candidate (the reference deepcopies the exact model it
    just evaluated, ``author_CRVAE.py:547-550``) — pairing the measured loss
    with post-step params would snapshot a model that never achieved it.
    """
    improved = mean_loss < state.best_loss
    best_params = jax.tree.map(
        lambda new, old: jnp.where(improved, new, old),
        candidate_params, state.best_params)
    return best_params, jnp.minimum(mean_loss, state.best_loss)


# --------------------------------------------------------------------------
# Phase 1
# --------------------------------------------------------------------------

def make_phase1_step(model: CRVAE, cfg: Phase1Config, windows: jax.Array,
                     parents: jax.Array, fixed_batch: Optional[jax.Array] = None,
                     batch_sharding=None, stream: bool = False):
    """Build the jittable phase-1 step: (Phase1State,) -> (Phase1State, metrics).

    ``batch_sharding`` (a ``NamedSharding``, meshed fits only) constrains the
    gathered batch's layout so GSPMD splits the forward/backward over dp and
    reduces gradients with an ICI psum instead of replicating the compute.

    ``stream=True`` builds the out-of-core variant: the step takes its batch
    as the scan's xs element (host-fed via the native window loader) instead
    of gathering from an in-HBM ``windows`` array.  The key chain is split
    exactly as in the in-memory step (k_batch drawn and discarded), so a host
    that mirrors the chain feeds the SAME batches the device would have
    gathered — streaming ≡ in-memory bitwise (``train/streaming.py``).
    """
    if fixed_batch is None and not cfg.resample_batches and not stream:
        # Fixed-batch parity mode without a caller-provided batch: draw the
        # reference's ONE random gather (``author_CRVAE.py:473-476``) here,
        # deterministically — NOT the first batch_size consecutive windows.
        idx = jax.random.randint(jax.random.key(0), (cfg.batch_size,), 0,
                                 windows.shape[0])
        fixed_batch = jnp.take(windows, idx, axis=0)

    def step(state: Phase1State, xs):
        key, k_batch, k_z = jax.random.split(state.key, 3)
        if stream:
            batch = xs
        elif fixed_batch is not None:
            batch = fixed_batch
        else:
            idx = jax.random.randint(k_batch, (cfg.batch_size,), 0, windows.shape[0])
            batch = jnp.take(windows, idx, axis=0)
        if batch_sharding is not None:
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)

        def loss_fn(params, prior):
            loss, aux = _crvae_loss(model, cfg, params, prior, batch, k_z,
                                    parents, cfg.beta)
            return loss, aux

        (loss, aux), (g_params, g_prior) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, state.prior)

        params = jax.tree.map(lambda p, g: p - cfg.lr * g, state.params, g_params)
        prior = (None if state.prior is None else
                 jax.tree.map(lambda p, g: p - cfg.lr * g, state.prior, g_prior))
        params = _project_and_prox(params, parents, cfg.lam, cfg.lr)

        best_params, best_loss = _track_best(state, state.params, aux["mean_loss"])
        usage = jnp.mean((jnp.linalg.norm(params.heads.w_ih, axis=-2) > 0)
                         .astype(jnp.float32))
        metrics = {"loss": loss, "recon": aux["recon"], "latent_reg": aux["latent_reg"],
                   "mean_loss": aux["mean_loss"], "variable_usage": usage}
        new_state = Phase1State(params=params, prior=prior, best_params=best_params,
                                best_loss=best_loss, key=key, step=state.step + 1)
        return new_state, metrics

    return step


def fit_phase1(model: CRVAE, params: CRVAEParams, windows: jax.Array,
               parents: jax.Array, cfg: Phase1Config, key: jax.Array,
               verbose: bool = False, log_fn=print, callback=None, mesh=None,
               checkpoint_dir: Optional[str] = None,
               checkpoint_every: int = 0, resume: bool = False):
    """Run phase 1; returns (best-restored params, final state, last metrics).

    The whole ``max_iter`` loop runs as jitted scan chunks of ``check_every``
    steps; the host sees one metrics pytree per chunk.  ``callback(step,
    state, metrics)``, if given, fires once per chunk — the hook for the
    reference's periodic eval/rollout/plot ritual
    (``author_CRVAE.py:521-558``) without touching the hot loop.

    ``mesh`` (a (dp, ep) ``jax.sharding.Mesh``) runs the SAME loop
    mesh-sharded end to end: batch windows over dp (gradient psum over ICI),
    stacked decoder heads over ep, training state resident on the mesh across
    chunks.  Identical results to the single-device fit (same keys, same
    gathers) up to reduction-order rounding; the reference has no distributed
    path to mirror (``/root/reference/author_CRVAE.py:18``).

    ``checkpoint_dir`` enables mid-phase checkpointing: the full state saves
    every ``checkpoint_every`` steps (at chunk boundaries) and at the final
    step; ``resume=True`` restores the latest snapshot — if one exists — and
    re-runs only the remaining chunks, **bitwise** equal to the uninterrupted
    fit.  A resumed already-complete phase is a pure restore.  The reference
    has no weight checkpointing at all (SURVEY.md §5; its only resilience is
    the in-memory deepcopy at ``author_CRVAE.py:547-561``).
    """
    prior = None
    if cfg.latent_reg == "cs":
        key, k_prior = jax.random.split(key)
        prior = init_gmm_prior(k_prior, cfg.gmm_components, model.hidden)

    fixed_batch = None
    if not cfg.resample_batches:
        key, k_fix = jax.random.split(key)
        idx = jax.random.randint(k_fix, (cfg.batch_size,), 0, windows.shape[0])
        fixed_batch = jnp.take(windows, idx, axis=0)

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vae_connexe_tpu.parallel.mesh import global_device_put
        from vae_connexe_tpu.parallel.sharded import (
            check_mesh_divisibility, check_sp_compat, phase1_state_sharding)

        check_mesh_divisibility(mesh, model.p, cfg.batch_size)
        check_sp_compat(mesh, windows.shape[1] - model.enc_len)
        rep = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("dp"))
        # Commit the closed-over constants to the mesh (replicated windows /
        # parents; the batch gather re-shards its output to dp) so jit never
        # sees inputs committed to a single device.  ``global_device_put``
        # handles meshes spanning processes (multi-controller runs).
        windows = global_device_put(windows, rep)
        parents = global_device_put(parents, rep)
        if fixed_batch is not None:
            fixed_batch = global_device_put(fixed_batch, batch_sharding)

    step = make_phase1_step(model, cfg, windows, parents, fixed_batch,
                            batch_sharding=batch_sharding)
    state = Phase1State(params=_copy_tree(params), prior=prior,
                        best_params=_copy_tree(params),
                        best_loss=jnp.array(jnp.inf), key=_copy_tree(key),
                        step=jnp.zeros([], jnp.int32))

    ckpt = _make_checkpointer(checkpoint_dir, checkpoint_every)
    resume_metrics = None
    if ckpt is not None and resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, resume_metrics = restored

    if mesh is None:
        @functools.partial(jax.jit, static_argnames=("length",),
                           donate_argnums=(0,))
        def run_chunk(state, length):
            return jax.lax.scan(step, state, None, length=length)
    else:
        state_shard = phase1_state_sharding(mesh, prior is not None)
        state = global_device_put(state, state_shard)

        @functools.partial(jax.jit, static_argnames=("length",),
                           in_shardings=(state_shard,),
                           out_shardings=(state_shard, rep),
                           donate_argnums=(0,))
        def run_chunk(state, length):
            return jax.lax.scan(step, state, None, length=length)

    with _sp_context(mesh):
        state, metrics = _run_chunked(run_chunk, state, cfg, ckpt,
                                      resume_metrics, verbose, log_fn,
                                      callback, "phase1")
    return state.best_params, state, metrics


# --------------------------------------------------------------------------
# Phase 2
# --------------------------------------------------------------------------

def make_phase2_step(model: CRVAE, err_model: ErrorVAE, cfg: Phase2Config,
                     windows: jax.Array, parents: jax.Array,
                     err_opt: optax.GradientTransformation,
                     batch_sharding=None, stream: bool = False):
    """Build the jittable phase-2 step.

    One step = (a) SGD + mask projection on the pruned CRVAE with β = 1 KL,
    (b) Adam on the error VAE against the stop-gradient residuals — the
    reference's gradient firewall (``author_CRVAE.py:602``).

    ``batch_sharding`` as in ``make_phase1_step`` (meshed fits); ``stream``
    as in ``make_phase1_step`` (batch arrives as the scan's xs element, the
    key chain is split identically so host-fed batches match).
    """

    def step(state: Phase2State, xs):
        key, k_batch, k_z, k_e = jax.random.split(state.key, 4)
        if stream:
            batch = xs
        else:
            idx = jax.random.randint(k_batch, (cfg.batch_size,), 0,
                                     windows.shape[0])
            batch = jnp.take(windows, idx, axis=0)
        if batch_sharding is not None:
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        target = batch[:, model.enc_len:, :]

        def loss_fn(params, prior, err_params):
            main_loss, aux = _crvae_loss(model, cfg, params, prior, batch, k_z,
                                         parents, cfg.beta)
            error = jax.lax.stop_gradient(target - aux["pred"])
            err_recon, mu_e, logvar_e = err_model.forward(err_params, error, k_e)
            loss_e = jnp.mean((err_recon - error) ** 2)
            kl_e = kl_gaussian(mu_e, logvar_e)
            smooth_e = loss_e + cfg.beta_error * kl_e
            aux.update({"loss_e": smooth_e, "kl_e": kl_e})
            # The two losses are gradient-disjoint (stop_gradient firewall),
            # so one combined backward serves both optimizers.
            return main_loss + smooth_e, aux

        (_, aux), (g_params, g_prior, g_err) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, state.prior, state.err_params)

        params = jax.tree.map(lambda p, g: p - cfg.lr * g, state.params, g_params)
        prior = (None if state.prior is None else
                 jax.tree.map(lambda p, g: p - cfg.lr * g, state.prior, g_prior))
        params = _project_and_prox(params, parents, 0.0, cfg.lr)

        updates, err_opt_state = err_opt.update(g_err, state.err_opt, state.err_params)
        err_params = optax.apply_updates(state.err_params, updates)

        best_params, best_loss = _track_best(state, state.params, aux["mean_loss"])
        metrics = {"recon": aux["recon"], "latent_reg": aux["latent_reg"],
                   "mean_loss": aux["mean_loss"], "loss_e": aux["loss_e"],
                   "kl_e": aux["kl_e"]}
        new_state = Phase2State(params=params, err_params=err_params,
                                err_opt=err_opt_state, prior=prior,
                                best_params=best_params, best_loss=best_loss,
                                key=key, step=state.step + 1)
        return new_state, metrics

    return step


def fit_phase2(model: CRVAE, err_model: ErrorVAE, params: CRVAEParams,
               err_params: ErrorVAEParams, windows: jax.Array,
               parents: jax.Array, cfg: Phase2Config, key: jax.Array,
               verbose: bool = False, log_fn=print, callback=None, mesh=None,
               checkpoint_dir: Optional[str] = None,
               checkpoint_every: int = 0, resume: bool = False):
    """Run phase 2; returns (best params, err params, final state, metrics).

    ``callback(step, state, metrics)`` fires once per chunk — use it to
    periodically sample compensated rollouts / write PCA-t-SNE figures, as
    the reference does every 1000 iterations (``author_CRVAE.py:688-696``).

    ``mesh`` runs the loop mesh-sharded as in ``fit_phase1`` (the error VAE
    and its Adam state stay replicated — it is tiny; its gradients reduce
    over dp via the psum pjit inserts).

    ``checkpoint_dir`` / ``checkpoint_every`` / ``resume`` as in
    ``fit_phase1`` — the snapshot carries the CRVAE params, error-VAE params
    AND Adam state, prior, best tracking, PRNG key and step, so the resumed
    fit is bitwise the uninterrupted one.
    """
    prior = None
    if cfg.latent_reg == "cs":
        key, k_prior = jax.random.split(key)
        prior = init_gmm_prior(k_prior, cfg.gmm_components, model.hidden)

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vae_connexe_tpu.parallel.mesh import global_device_put
        from vae_connexe_tpu.parallel.sharded import (
            check_mesh_divisibility, check_sp_compat, phase2_state_sharding)

        check_mesh_divisibility(mesh, model.p, cfg.batch_size)
        check_sp_compat(mesh, windows.shape[1] - model.enc_len)
        rep = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("dp"))
        windows = global_device_put(windows, rep)
        parents = global_device_put(parents, rep)

    err_opt = optax.adam(cfg.lr_error)
    step = make_phase2_step(model, err_model, cfg, windows, parents, err_opt,
                            batch_sharding=batch_sharding)
    err_params = _copy_tree(err_params)
    state = Phase2State(params=_copy_tree(params), err_params=err_params,
                        err_opt=err_opt.init(err_params), prior=prior,
                        best_params=_copy_tree(params),
                        best_loss=jnp.array(jnp.inf),
                        key=_copy_tree(key), step=jnp.zeros([], jnp.int32))

    ckpt = _make_checkpointer(checkpoint_dir, checkpoint_every)
    resume_metrics = None
    if ckpt is not None and resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, resume_metrics = restored

    if mesh is None:
        @functools.partial(jax.jit, static_argnames=("length",),
                           donate_argnums=(0,))
        def run_chunk(state, length):
            return jax.lax.scan(step, state, None, length=length)
    else:
        state_shard = phase2_state_sharding(mesh, prior is not None)
        state = global_device_put(state, state_shard)

        @functools.partial(jax.jit, static_argnames=("length",),
                           in_shardings=(state_shard,),
                           out_shardings=(state_shard, rep),
                           donate_argnums=(0,))
        def run_chunk(state, length):
            return jax.lax.scan(step, state, None, length=length)

    with _sp_context(mesh):
        state, metrics = _run_chunked(run_chunk, state, cfg, ckpt,
                                      resume_metrics, verbose, log_fn,
                                      callback, "phase2")
    return state.best_params, state.err_params, state, metrics


# Measured fused/lax crossover for single-stream serving on v5e
# (benchmarks/latency_ab.py, round 3): the fused Pallas rollout kernels win
# at B=1 (0.151 vs 0.187 ms/generation, -19%) and B=8 (-6%), lose from B=16
# up (XLA's scanned rollout pipelines better once the per-step dots have
# real width) — so ``kernel="auto"`` serves B <= 8 through the fused chain.
LATENCY_FUSED_MAX_B = 8


def _fused_serving_fits(model: CRVAE, err_model: ErrorVAE, batch: int) -> bool:
    """VMEM feasibility of the fused serving chain at these shapes (lazy
    import keeps the Pallas module off the non-serving import path)."""
    from vae_connexe_tpu.ops.pallas_rollout import fused_chain_fits
    return fused_chain_fits(model.p, model.hidden, model.rollout_len,
                            err_model.hidden, err_model.d, batch)


def generate_with_compensation(model: CRVAE, err_model: ErrorVAE,
                               params: CRVAEParams, err_params: ErrorVAEParams,
                               key: jax.Array, batch: int,
                               parents: Optional[jax.Array] = None,
                               dtype=None, kernel: str = "lax",
                               interpret: bool = False) -> jax.Array:
    """Phase-2 sampling: draw an error sequence from the error VAE and inject
    it (scaled by ``model.noise_scale``) into the free-running rollout
    (``author_CRVAE.py:682-684`` + ``:284-286``).  Returns (B, rollout_len, p).

    ``dtype``: optional serving precision for both rollouts (e.g.
    ``jnp.bfloat16``; see ``CRVAE._free_run``).  Output is float32 either
    way; default None keeps the exact float32 path the export-parity tests
    pin.

    ``kernel``: ``"lax"`` (default — the scanned path, fastest at
    throughput batches), ``"fused"`` (single Pallas kernel per rollout,
    keeps every carry in VMEM for the whole chain — fastest single-stream
    latency at B <= ``LATENCY_FUSED_MAX_B``), or ``"auto"`` (fused iff
    f32 and B <= the measured crossover).  RNG draws are identical across
    kernels, so outputs match to kernel FP (tests/test_pallas_rollout.py).
    ``interpret`` runs the fused kernels in Pallas interpret mode (CPU
    tests)."""
    use_fused = kernel == "fused" or (
        kernel == "auto" and dtype is None and batch <= LATENCY_FUSED_MAX_B
        # Same platform gate as ops/dispatch.py: the fused kernels are
        # Mosaic TPU programs; off-TPU "auto" keeps the lax path (tests
        # exercise the fused branch explicitly with interpret=True).
        and (interpret or jax.default_backend() == "tpu")
        # VMEM feasibility: the B<=8 crossover was measured at the flagship
        # shape (p=20, H=64); at larger shapes the fused kernels' weight
        # blocks can exceed the budget — 'auto' must fall back to lax there
        # rather than raise (explicit kernel='fused' still raises loudly).
        and _fused_serving_fits(model, err_model, batch))
    if use_fused:
        if dtype is not None:
            raise ValueError("kernel='fused' serving is float32-only; use "
                             "the lax path for bf16 throughput serving")
        from vae_connexe_tpu.models.crvae import masked_heads
        from vae_connexe_tpu.ops.pallas_rollout import (
            crvae_free_run_fused,
            errvae_sample_fused,
        )
        k_e, k_r = jax.random.split(key)
        t = model.rollout_len
        h0e = jax.random.normal(k_e, (batch, err_model.hidden))  # sample's h0
        errs = errvae_sample_fused(err_params.dec, err_params.out, h0e,
                                   err_model.d, t, interpret=interpret)
        # ErrorVAE.sample keeps the leading zero step; this path slices to
        # rollout_len exactly like the lax branch below.
        noise = jnp.concatenate(
            [jnp.zeros((batch, 1, err_model.d)), errs], axis=1)[:, :t]
        heads = (params.heads if parents is None
                 else masked_heads(params.heads, parents))
        h0 = jax.random.normal(k_r, (batch, model.hidden))  # rollout's h0
        return crvae_free_run_fused(heads, params.readout,
                                    jnp.zeros((batch, model.p)), h0, noise,
                                    model.noise_scale, interpret=interpret)
    k_e, k_r = jax.random.split(key)
    noise = err_model.sample(err_params, k_e, batch, model.rollout_len,
                             dtype=dtype)
    return model.rollout(params, k_r, batch, noise=noise[:, : model.rollout_len],
                         parents=parents, dtype=dtype)
