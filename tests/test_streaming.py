"""Out-of-core streaming trainers ≡ the in-memory fits, bitwise.

The streaming variants (``train/streaming.py``) feed host-gathered batches
from the native C++ window loader as scan xs while splitting the device key
chain exactly like the in-memory step — so same series + same key must give
the SAME parameters, not merely statistically equivalent ones.
"""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

import jax
import jax.numpy as jnp

from vae_connexe_tpu.data import arrange_input, lorenz96
from vae_connexe_tpu.data.native_loader import NativeWindowLoader
from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.train import (
    Phase1Config,
    Phase2Config,
    fit_phase1,
    fit_phase1_streaming,
    fit_phase2,
    fit_phase2_streaming,
)

P, CTX = 6, 12


@pytest.fixture(scope="module")
def setup():
    series = lorenz96(jax.random.key(0), p=P, t=400)
    windows, _ = arrange_input(series, CTX)
    model = CRVAE(p=P, hidden=16)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((P, P), jnp.float32)
    loader = NativeWindowLoader.from_array(np.asarray(series))
    return series, windows, model, params, parents, loader


def _max_diff(a, b):
    return max(jax.tree.leaves(
        jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))


def test_phase1_streaming_bitwise(setup):
    _, windows, model, params, parents, loader = setup
    cfg = Phase1Config(max_iter=37, check_every=10, batch_size=8, lam=0.1)
    best_m, _, m_m = fit_phase1(model, params, windows, parents, cfg,
                                jax.random.key(2))
    best_s, _, m_s = fit_phase1_streaming(model, params, loader, CTX, parents,
                                          cfg, jax.random.key(2))
    assert _max_diff(best_m, best_s) == 0.0
    assert m_m["loss"] == m_s["loss"]


def test_phase1_streaming_io_subchunking(setup):
    """A tiny IO budget forces multiple host blocks per check_every chunk;
    the math must not notice."""
    _, windows, model, params, parents, loader = setup
    cfg = Phase1Config(max_iter=23, check_every=10, batch_size=8, lam=0.1)
    best_m, _, _ = fit_phase1(model, params, windows, parents, cfg,
                              jax.random.key(7))
    best_s, _, _ = fit_phase1_streaming(
        model, params, loader, CTX, parents, cfg, jax.random.key(7),
        io_budget_bytes=3 * 8 * CTX * P * 4)   # 3 steps per host block
    assert _max_diff(best_m, best_s) == 0.0


def test_phase1_streaming_fixed_batch(setup):
    _, windows, model, params, parents, loader = setup
    cfg = Phase1Config(max_iter=20, check_every=10, batch_size=8, lam=0.1,
                       resample_batches=False)
    best_m, _, _ = fit_phase1(model, params, windows, parents, cfg,
                              jax.random.key(3))
    best_s, _, _ = fit_phase1_streaming(model, params, loader, CTX, parents,
                                        cfg, jax.random.key(3))
    assert _max_diff(best_m, best_s) == 0.0


def test_phase2_streaming_bitwise(setup):
    _, windows, model, params, parents, loader = setup
    err = ErrorVAE(d=P, hidden=16)
    ep = err.init(jax.random.key(4))
    cfg2 = Phase2Config(max_iter=17, check_every=10, batch_size=8)
    b_m, e_m, _, m_m = fit_phase2(model, err, params, ep, windows, parents,
                                  cfg2, jax.random.key(5))
    b_s, e_s, _, m_s = fit_phase2_streaming(model, err, params, ep, loader,
                                            CTX, parents, cfg2,
                                            jax.random.key(5))
    assert _max_diff((b_m, e_m), (b_s, e_s)) == 0.0
    assert m_m["mean_loss"] == m_s["mean_loss"]


def test_run_experiment_out_of_core_matches_in_memory():
    """The CLI-facing integration: ``run_experiment(..., out_of_core=True)``
    writes the series to disk, streams both phases through the loader, and
    must reproduce the in-memory run's metrics exactly."""
    import dataclasses

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    overrides = {
        "t": 300,
        "phase1": dataclasses.replace(exp.phase1, max_iter=30, check_every=10,
                                      batch_size=16),
        "phase2": dataclasses.replace(exp.phase2, max_iter=12, check_every=6,
                                      batch_size=16),
    }
    r_mem = run_experiment("lorenz96_crvae", overrides=overrides,
                           verbose=False)
    r_oc = run_experiment("lorenz96_crvae", overrides=overrides,
                          out_of_core=True, verbose=False)
    assert r_oc["phase1"] == r_mem["phase1"]
    assert r_oc["gc"] == r_mem["gc"]
    assert r_oc["phase2"] == r_mem["phase2"]
    assert (r_oc["generation_moment_gap"]
            == r_mem["generation_moment_gap"])


def test_streaming_composes_with_mesh(setup, eight_devices):
    """Out-of-core feed + (dp, ep) mesh: host-gathered chunks land
    batch-sharded over dp, heads over ep; results equal the single-device
    streaming run (same key chain) up to reduction-order rounding."""
    from vae_connexe_tpu.parallel import make_mesh
    from vae_connexe_tpu.train import Phase2Config as P2

    _, _, model, params, parents, loader = setup
    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    cfg = Phase1Config(max_iter=25, check_every=10, batch_size=8, lam=0.1)
    b_s, _, _ = fit_phase1_streaming(model, params, loader, CTX, parents,
                                     cfg, jax.random.key(2))
    b_m, _, _ = fit_phase1_streaming(model, params, loader, CTX, parents,
                                     cfg, jax.random.key(2), mesh=mesh)
    assert _max_diff(b_s, b_m) < 1e-5

    err = ErrorVAE(d=P, hidden=16)
    ep = err.init(jax.random.key(4))
    cfg2 = P2(max_iter=14, check_every=7, batch_size=8)
    b2s, e2s, _, _ = fit_phase2_streaming(model, err, params, ep, loader,
                                          CTX, parents, cfg2,
                                          jax.random.key(5))
    b2m, e2m, _, _ = fit_phase2_streaming(model, err, params, ep, loader,
                                          CTX, parents, cfg2,
                                          jax.random.key(5), mesh=mesh)
    assert _max_diff((b2s, e2s), (b2m, e2m)) < 1e-5
