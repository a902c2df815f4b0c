"""End-to-end meshed training (``fit_phase1``/``fit_phase2`` with ``mesh=``,
the ``cli run --mesh`` path): multi-chunk fits with the training state
resident on the mesh must equal the single-device fits key-for-key.

The reference has no distributed code (``/root/reference/author_CRVAE.py:18``
selects one device); the contract here is the build's own: same RNG
threading, same gathers, same updates — only the layout differs, so results
match up to reduction-order rounding.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.data import arrange_input, lorenz96
from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.parallel import make_mesh
from vae_connexe_tpu.train import (Phase1Config, Phase2Config, fit_phase1,
                                   fit_phase2)


@pytest.fixture(scope="module")
def setup():
    p = 4
    series = lorenz96(jax.random.key(0), p=p, t=400)
    windows, _ = arrange_input(series, 12)
    model = CRVAE(p=p, hidden=16, enc_len=6)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((p, p), jnp.float32)
    return model, params, windows, parents


def _assert_trees_close(a, b, rtol=2e-5, atol=1e-6):
    for got, want in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("n_dp,n_ep", [(4, 2), (8, 1)])
def test_meshed_fit_phase1_equals_single_device(setup, eight_devices, n_dp, n_ep):
    model, params, windows, parents = setup
    mesh = make_mesh(n_dp=n_dp, n_ep=n_ep, devices=eight_devices)
    cfg = Phase1Config(lam=0.1, lr=5e-2, max_iter=50, check_every=20,
                       batch_size=32)
    best_m, state_m, m_mesh = fit_phase1(model, params, windows, parents,
                                         cfg, jax.random.key(2), mesh=mesh)
    best_s, state_s, m_single = fit_phase1(model, params, windows, parents,
                                           cfg, jax.random.key(2))
    _assert_trees_close(best_m, best_s)
    np.testing.assert_allclose(m_mesh["loss"], m_single["loss"], rtol=1e-4)
    assert int(state_m.step) == cfg.max_iter


def test_meshed_fit_phase2_equals_single_device(setup, eight_devices):
    model, params, windows, parents = setup
    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    err = ErrorVAE(d=model.p, hidden=16)
    err_params = err.init(jax.random.key(3))
    cfg = Phase2Config(lr=5e-2, max_iter=40, check_every=20, batch_size=32)
    b_m, e_m, _, m_mesh = fit_phase2(model, err, params, err_params, windows,
                                     parents, cfg, jax.random.key(4),
                                     mesh=mesh)
    b_s, e_s, _, m_single = fit_phase2(model, err, params, err_params,
                                       windows, parents, cfg,
                                       jax.random.key(4))
    _assert_trees_close((b_m, e_m), (b_s, e_s))
    np.testing.assert_allclose(m_mesh["mean_loss"], m_single["mean_loss"],
                               rtol=1e-4)


def test_meshed_fit_cs_prior(setup, eight_devices):
    """The CR-CS-RAE hybrid (jointly-trained replicated GMM prior) also fits
    over the mesh."""
    model, params, windows, parents = setup
    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    cfg = Phase1Config(lam=0.1, lr=5e-2, max_iter=30, check_every=15,
                       batch_size=32, latent_reg="cs", lambda_cs=0.1,
                       gmm_components=3)
    best_m, state_m, m_mesh = fit_phase1(model, params, windows, parents,
                                         cfg, jax.random.key(5), mesh=mesh)
    best_s, state_s, m_single = fit_phase1(model, params, windows, parents,
                                           cfg, jax.random.key(5))
    _assert_trees_close(best_m, best_s)
    _assert_trees_close(state_m.prior, state_s.prior)


def test_meshed_fit_divisibility_guards(setup, eight_devices):
    model, params, windows, parents = setup
    mesh = make_mesh(n_dp=8, n_ep=1, devices=eight_devices)
    cfg = Phase1Config(batch_size=30, max_iter=2)   # 30 % 8 != 0
    with pytest.raises(ValueError, match="not divisible by the dp"):
        fit_phase1(model, params, windows, parents, cfg, jax.random.key(0),
                   mesh=mesh)
    mesh3 = make_mesh(n_dp=2, n_ep=3, devices=eight_devices[:6])
    cfg_ok = Phase1Config(batch_size=32, max_iter=2)  # p=4 % ep=3 != 0
    with pytest.raises(ValueError, match="not divisible by the ep"):
        fit_phase1(model, params, windows, parents, cfg_ok, jax.random.key(0),
                   mesh=mesh3)


def test_run_experiment_mesh_rejects_non_crvae(eight_devices):
    from vae_connexe_tpu.configs import run_experiment

    mesh = make_mesh(n_dp=8, n_ep=1, devices=eight_devices)
    with pytest.raises(ValueError, match="crvae family"):
        run_experiment("vrae_demo", mesh=mesh, verbose=False)


def test_run_experiment_meshed_smoke(eight_devices, tmp_path):
    """The CLI path end to end: a tiny lorenz96_crvae run with --mesh
    semantics (both phases over the mesh) produces the full metrics dict."""
    import dataclasses as dc

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    overrides = {
        "p": 4, "t": 300, "context": 12, "hidden": 16,
        "phase1": dc.replace(exp.phase1, max_iter=30, check_every=15,
                             batch_size=32),
        "phase2": dc.replace(exp.phase2, max_iter=20, check_every=10,
                             batch_size=32),
    }
    res = run_experiment("lorenz96_crvae", overrides=overrides, mesh=mesh,
                         out_dir=str(tmp_path), verbose=False)
    assert "gc" in res and "phase2" in res
    assert np.isfinite(res["phase2"]["mean_loss"])
