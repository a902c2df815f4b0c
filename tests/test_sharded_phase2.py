"""Sharded phase-2 step: numerical equality with the single-device update."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.parallel import make_mesh
from vae_connexe_tpu.parallel.sharded import make_sharded_phase2_step
from vae_connexe_tpu.train import Phase2Config


def test_sharded_phase2_matches_single_device(eight_devices):
    p = 4
    model = CRVAE(p=p, hidden=16, enc_len=6)
    err_model = ErrorVAE(d=p, hidden=16)
    cfg = Phase2Config(batch_size=32)
    parents = jnp.ones((p, p), jnp.float32)
    params = model.init(jax.random.key(0))
    err_params = err_model.init(jax.random.key(1))
    err_opt = optax.adam(cfg.lr_error)
    batch = jax.random.normal(jax.random.key(2), (32, 12, p))
    key = jax.random.key(3)

    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    step, param_shard, batch_shard = make_sharded_phase2_step(
        model, err_model, cfg, mesh, parents, err_opt)

    new_p, new_e, new_s, metrics = step(
        jax.device_put(params, param_shard), err_params,
        err_opt.init(err_params), jax.device_put(batch, batch_shard), key)

    # Single-device reference: same math, no shardings.
    from vae_connexe_tpu.losses.kl import kl_gaussian
    from vae_connexe_tpu.train.crvae_trainer import _crvae_loss, _project_and_prox

    def loss_fn(prms, eprms):
        k_z, k_e = jax.random.split(key)
        main_loss, aux = _crvae_loss(model, cfg, prms, None, batch, k_z,
                                     parents, cfg.beta)
        target = batch[:, model.enc_len:, :]
        error = jax.lax.stop_gradient(target - aux["pred"])
        err_recon, mu_e, logvar_e = err_model.forward(eprms, error, k_e)
        return main_loss + jnp.mean((err_recon - error) ** 2) \
            + cfg.beta_error * kl_gaussian(mu_e, logvar_e)

    g_p, g_e = jax.grad(loss_fn, argnums=(0, 1))(params, err_params)
    want_p = _project_and_prox(
        jax.tree.map(lambda a, b: a - cfg.lr * b, params, g_p), parents, 0.0, cfg.lr)
    updates, _ = err_opt.update(g_e, err_opt.init(err_params), err_params)
    want_e = optax.apply_updates(err_params, updates)

    for got, want in zip(jax.tree.leaves(new_p), jax.tree.leaves(want_p)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-6)
    for got, want in zip(jax.tree.leaves(new_e), jax.tree.leaves(want_e)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-6)
    assert np.isfinite(float(metrics["loss_e"]))


def test_sharded_phase2_cs_trains_prior(eight_devices):
    from vae_connexe_tpu.models.gmm_prior import init_gmm_prior

    p = 4
    model = CRVAE(p=p, hidden=16, enc_len=6)
    err_model = ErrorVAE(d=p, hidden=16)
    cfg = Phase2Config(batch_size=32, latent_reg="cs", lambda_cs=0.1,
                       gmm_components=3)
    parents = jnp.ones((p, p), jnp.float32)
    err_opt = optax.adam(cfg.lr_error)
    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    step, param_shard, batch_shard = make_sharded_phase2_step(
        model, err_model, cfg, mesh, parents, err_opt)
    params = jax.device_put(model.init(jax.random.key(0)), param_shard)
    prior = init_gmm_prior(jax.random.key(1), 3, model.hidden)
    err_params = err_model.init(jax.random.key(2))
    batch = jax.device_put(
        jax.random.normal(jax.random.key(3), (32, 12, p)), batch_shard)
    new_p, new_prior, new_e, new_s, metrics = step(
        params, prior, err_params, err_opt.init(err_params), batch,
        jax.random.key(4))
    assert np.isfinite(float(metrics["mean_loss"]))
    assert not np.allclose(np.asarray(new_prior.mu), np.asarray(prior.mu))
