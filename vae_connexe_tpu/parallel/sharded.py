"""Mesh-sharded training steps: the full phase-1 update (forward, backward,
SGD, prox, latent regularizer) compiled over a (dp, ep) mesh.

Sharding layout:

- batch windows: leading axis over ``dp`` — the loss means reduce across
  devices via an XLA ``psum`` that pjit inserts automatically;
- stacked decoder heads (GRU + readout): leading head axis over ``ep`` —
  the p per-variable decoders are independent (EP-like), so their
  parameters, gradients, and prox updates never cross devices;
- encoder / latent layers: replicated (they are tiny).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_connexe_tpu.models.crvae import CRVAE, CRVAEParams
from vae_connexe_tpu.train.config import Phase1Config
from vae_connexe_tpu.train.crvae_trainer import _crvae_loss, _project_and_prox


def crvae_param_spec() -> CRVAEParams:
    """PartitionSpec pytree for CRVAEParams: heads on ep, the rest replicated."""
    from vae_connexe_tpu.ops.gru import GRUParams
    from vae_connexe_tpu.utils.layers import Dense

    rep2 = Dense(w=P(), b=P())
    return CRVAEParams(
        enc=GRUParams(w_ih=P(), w_hh=P(), b_ih=P(), b_hh=P()),
        fc_mu=rep2,
        fc_std=rep2,
        heads=GRUParams(w_ih=P("ep"), w_hh=P("ep"), b_ih=P("ep"), b_hh=P("ep")),
        readout=Dense(w=P("ep"), b=P("ep")),
    )


def _named(mesh: Mesh, spec_tree):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def phase1_state_sharding(mesh: Mesh, with_prior: bool):
    """Sharding pytree for ``Phase1State``: params/best_params heads on ep,
    everything else (prior, loss scalar, key, step) replicated.  Usable as a
    jit in/out_shardings prefix and as a ``device_put`` target."""
    from vae_connexe_tpu.train.crvae_trainer import Phase1State

    param_shard = _named(mesh, crvae_param_spec())
    rep = NamedSharding(mesh, P())
    return Phase1State(params=param_shard, prior=(rep if with_prior else None),
                       best_params=param_shard, best_loss=rep, key=rep,
                       step=rep)


def phase2_state_sharding(mesh: Mesh, with_prior: bool):
    """Sharding pytree for ``Phase2State``: CRVAE params on (ep), the error
    VAE, its Adam state, and the prior replicated."""
    from vae_connexe_tpu.train.crvae_trainer import Phase2State

    param_shard = _named(mesh, crvae_param_spec())
    rep = NamedSharding(mesh, P())
    return Phase2State(params=param_shard, err_params=rep, err_opt=rep,
                       prior=(rep if with_prior else None),
                       best_params=param_shard, best_loss=rep, key=rep,
                       step=rep)


def check_mesh_divisibility(mesh: Mesh, p: int, batch_size: int) -> None:
    """Fail fast with actionable messages instead of GSPMD's uneven-sharding
    errors: the stacked head axis must divide by ep, the batch by dp."""
    n_ep, n_dp = mesh.shape.get("ep", 1), mesh.shape.get("dp", 1)
    if p % n_ep:
        raise ValueError(
            f"p={p} decoder heads not divisible by the ep mesh size {n_ep} — "
            f"choose n_ep dividing p")
    if batch_size % n_dp:
        raise ValueError(
            f"batch_size={batch_size} not divisible by the dp mesh size "
            f"{n_dp} — choose a batch divisible by dp")


def check_sp_compat(mesh: Mesh, t_dec: int) -> None:
    """Validate a mesh carrying an sp axis for the sequence-parallel
    training mode: the decode recurrence length must divide by sp, and ep
    must be 1 (both axes shard the stacked decoder — sp shards its time
    axis via shard_map with replicated head params, which contradicts an
    ep-sharded head axis)."""
    n_sp = mesh.shape.get("sp", 1)
    if n_sp <= 1:
        return
    if mesh.shape.get("ep", 1) > 1:
        raise ValueError(
            f"sp={n_sp} and ep={mesh.shape['ep']} cannot both exceed 1: the "
            f"sp pipeline runs the decode with replicated head params, which "
            f"contradicts an ep-sharded head axis (documented won't-fix — "
            f"the axes' natural domains are disjoint; see "
            f"docs/parallelism.md 'sp × ep'); use ep for many-heads configs "
            f"OR sp for long-decode configs")
    if t_dec % n_sp:
        raise ValueError(
            f"decode length {t_dec} (window length - enc_len) not divisible "
            f"by the sp mesh size {n_sp} — pick a context so (context - "
            f"enc_len) divides by sp, or a dividing sp size")


def make_sharded_phase1_step(model: CRVAE, cfg: Phase1Config, mesh: Mesh,
                             parents: jax.Array):
    """Explicit-batch phase-1 step jitted over ``mesh``.

    Signature of the returned fn: (params, batch, key) -> (params, metrics)
    for KL configs, or (params, prior, batch, key) -> (params, prior,
    metrics) when ``cfg.latent_reg == 'cs'`` (the replicated GMM prior
    trains jointly, as in the single-device trainer).  Batch is sharded
    (dp,) on its leading axis; head-stacked params shard over ep.
    """
    param_shard = jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                               crvae_param_spec(),
                               is_leaf=lambda x: isinstance(x, P))
    batch_shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    with_prior = cfg.latent_reg == "cs"

    def update(params, prior, batch, key):
        def loss_fn(prms, pri):
            loss, aux = _crvae_loss(model, cfg, prms, pri, batch, key,
                                    parents, cfg.beta)
            del aux["pred"]
            return loss, aux

        (loss, aux), (g_params, g_prior) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, prior)
        params = jax.tree.map(lambda p, g: p - cfg.lr * g, params, g_params)
        prior = (None if prior is None else
                 jax.tree.map(lambda p, g: p - cfg.lr * g, prior, g_prior))
        params = _project_and_prox(params, parents, cfg.lam, cfg.lr)
        return params, prior, {"loss": loss, **aux}

    if with_prior:
        def step_cs(params, prior, batch, key):
            params, prior, metrics = update(params, prior, batch, key)
            return params, prior, metrics

        jitted = jax.jit(step_cs,
                         in_shardings=(param_shard, rep, batch_shard, rep),
                         out_shardings=(param_shard, rep, rep))
    else:
        def step_kl(params, batch, key):
            params, _, metrics = update(params, None, batch, key)
            return params, metrics

        jitted = jax.jit(step_kl,
                         in_shardings=(param_shard, batch_shard, rep),
                         out_shardings=(param_shard, rep))
    return jitted, param_shard, batch_shard


def make_sharded_phase2_step(model: CRVAE, err_model, cfg, mesh: Mesh,
                             parents: jax.Array, err_opt):
    """Explicit-batch phase-2 step over ``mesh``: pruned-CRVAE SGD + masked
    projection (heads on ep, batch on dp) plus Adam on the replicated error
    VAE against the stop-gradient residuals.

    Returns (jitted step, crvae param sharding, batch sharding).  Signature
    for KL configs: (params, err_params, err_opt_state, batch, key) ->
    (params, err_params, err_opt_state, metrics); CS configs
    (``cfg.latent_reg == 'cs'``, the CR-CS-RAE hybrid) take and return a
    replicated, jointly-trained GMM prior after ``params``.
    """
    import optax

    from vae_connexe_tpu.losses.kl import kl_gaussian

    param_shard = jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                               crvae_param_spec(),
                               is_leaf=lambda x: isinstance(x, P))
    batch_shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    with_prior = getattr(cfg, "latent_reg", "kl") == "cs"

    def update(params, prior, err_params, err_opt_state, batch, key):
        k_z, k_e = jax.random.split(key)
        target = batch[:, model.enc_len:, :]

        def loss_fn(prms, pri, eprms):
            main_loss, aux = _crvae_loss(model, cfg, prms, pri, batch, k_z,
                                         parents, cfg.beta)
            error = jax.lax.stop_gradient(target - aux["pred"])
            err_recon, mu_e, logvar_e = err_model.forward(eprms, error, k_e)
            smooth_e = (jnp.mean((err_recon - error) ** 2)
                        + cfg.beta_error * kl_gaussian(mu_e, logvar_e))
            return main_loss + smooth_e, {"mean_loss": aux["mean_loss"],
                                          "loss_e": smooth_e}

        (_, metrics), (g_params, g_prior, g_err) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(params, prior, err_params)
        params = jax.tree.map(lambda p, g: p - cfg.lr * g, params, g_params)
        prior = (None if prior is None else
                 jax.tree.map(lambda p, g: p - cfg.lr * g, prior, g_prior))
        params = _project_and_prox(params, parents, 0.0, cfg.lr)
        updates, err_opt_state = err_opt.update(g_err, err_opt_state, err_params)
        err_params = optax.apply_updates(err_params, updates)
        return params, prior, err_params, err_opt_state, metrics

    if with_prior:
        def step_cs(params, prior, err_params, err_opt_state, batch, key):
            return update(params, prior, err_params, err_opt_state, batch, key)

        jitted = jax.jit(step_cs,
                         in_shardings=(param_shard, rep, rep, rep,
                                       batch_shard, rep),
                         out_shardings=(param_shard, rep, rep, rep, rep))
    else:
        def step_kl(params, err_params, err_opt_state, batch, key):
            params, _, err_params, err_opt_state, metrics = update(
                params, None, err_params, err_opt_state, batch, key)
            return params, err_params, err_opt_state, metrics

        jitted = jax.jit(step_kl,
                         in_shardings=(param_shard, rep, rep, batch_shard, rep),
                         out_shardings=(param_shard, rep, rep, rep))
    return jitted, param_shard, batch_shard
