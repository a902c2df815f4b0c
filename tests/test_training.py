"""Integration tests: miniaturized oracle runs and trainer behavior.

SURVEY.md §4: integration = small synthetic systems with known graphs,
asserting recovery quality above a floor, plus determinism via fixed keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.data import arrange_input, coupled_henon, lorenz96, lorenz96_truth, sliding_windows
from vae_connexe_tpu.evals import auroc, gc_metrics
from vae_connexe_tpu.models import CRVAE, ErrorVAE, WInCRVAE
from vae_connexe_tpu.train import (
    Phase1Config,
    Phase2Config,
    WInTrainConfig,
    WInTrainer,
    fit_phase1,
    fit_phase2,
    generate_with_compensation,
)


@pytest.fixture(scope="module")
def lorenz_windows():
    series = lorenz96(jax.random.key(0), p=6, t=1000)
    X, _ = arrange_input(series, 20)
    return X


def test_phase1_recovers_lorenz_graph(lorenz_windows):
    """Miniature oracle run: p=6 Lorenz-96, 1200 iters must reach AUROC ≥ 0.9."""
    p = 6
    model = CRVAE(p=p, hidden=32)
    params = model.init(jax.random.key(1))
    cfg = Phase1Config(max_iter=1200, check_every=300, batch_size=128, lam=0.12)
    best, state, metrics = fit_phase1(model, params, lorenz_windows,
                                      jnp.ones((p, p)), cfg, jax.random.key(2))
    scores = model.gc(best, threshold=False)
    a = float(auroc(lorenz96_truth(p), scores))
    assert a >= 0.9, f"AUROC {a} below floor"
    # Sparsity must actually engage: some edges pruned to exactly zero.
    assert float(metrics["variable_usage"]) < 1.0


def test_phase1_deterministic(lorenz_windows):
    p = 6
    model = CRVAE(p=p, hidden=16)
    cfg = Phase1Config(max_iter=60, check_every=30, batch_size=64)
    outs = []
    for _ in range(2):
        params = model.init(jax.random.key(1))
        best, _, _ = fit_phase1(model, params, lorenz_windows, jnp.ones((p, p)),
                                cfg, jax.random.key(2))
        outs.append(np.asarray(model.gc(best, threshold=False)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_phase2_freezes_structure_and_generates(lorenz_windows):
    p = 6
    model = CRVAE(p=p, hidden=16)
    params = model.init(jax.random.key(3))
    mask = jnp.asarray(lorenz96_truth(p), jnp.float32)
    ev = ErrorVAE(d=p, hidden=16)
    evp = ev.init(jax.random.key(4))
    cfg = Phase2Config(max_iter=80, check_every=40, batch_size=64)
    best, evp2, state, metrics = fit_phase2(model, ev, params, evp,
                                            lorenz_windows, mask, cfg,
                                            jax.random.key(5))
    gc_after = model.gc(best, parents=mask, threshold=True)
    np.testing.assert_array_equal(np.asarray(gc_after), np.asarray(mask, np.int32))
    gen = generate_with_compensation(model, ev, best, evp2, jax.random.key(6),
                                     8, parents=mask)
    assert gen.shape == (8, 21, p)
    assert bool(jnp.isfinite(gen).all())
    assert np.isfinite(metrics["loss_e"])


def test_phase1_loss_decreases(lorenz_windows):
    p = 6
    model = CRVAE(p=p, hidden=16)
    params = model.init(jax.random.key(7))
    cfg = Phase1Config(max_iter=300, check_every=150, batch_size=128, lam=0.05)
    step0_metrics = None
    best, state, metrics = fit_phase1(model, params, lorenz_windows,
                                      jnp.ones((p, p)), cfg, jax.random.key(8))
    # recon after 300 iters must beat an untrained model by a wide margin.
    from vae_connexe_tpu.train.crvae_trainer import _crvae_loss
    batch = lorenz_windows[:128]
    loss0, _ = _crvae_loss(model, cfg, params, None, batch, jax.random.key(9),
                           jnp.ones((p, p)), cfg.beta)
    assert metrics["recon"] < float(loss0) * 0.7


def test_phase1_cs_latent_regularizer(lorenz_windows):
    """The CR-CS-RAE hybrid path: CS divergence vs a learnable GMM prior."""
    p = 6
    model = CRVAE(p=p, hidden=16)
    params = model.init(jax.random.key(10))
    cfg = Phase1Config(max_iter=60, check_every=30, batch_size=64,
                       latent_reg="cs", lambda_cs=0.1, gmm_components=4)
    best, state, metrics = fit_phase1(model, params, lorenz_windows,
                                      jnp.ones((p, p)), cfg, jax.random.key(11))
    assert np.isfinite(metrics["latent_reg"])
    assert state.prior is not None
    # Prior means moved (they are being trained).
    assert float(jnp.abs(state.prior.mu).max()) > 0.0


def test_phase1_fixed_batch_mode(lorenz_windows):
    p = 6
    model = CRVAE(p=p, hidden=16)
    params = model.init(jax.random.key(12))
    cfg = Phase1Config(max_iter=40, check_every=20, batch_size=64,
                       resample_batches=False)
    best, state, metrics = fit_phase1(model, params, lorenz_windows,
                                      jnp.ones((p, p)), cfg, jax.random.key(13))
    assert np.isfinite(metrics["loss"])


def test_win_trainer_stage1_sparsifies_and_stage2_freezes():
    series = coupled_henon(jax.random.key(0), t=600, d=4)
    w = sliding_windows(series, 16)
    m = WInCRVAE(d=4, hidden=16, latent=8, tau=8)
    p0 = m.init(jax.random.key(1))
    tr = WInTrainer(m, WInTrainConfig(batch_size=64, lam=0.05, lr=2e-3))
    params, metrics = tr.fit(p0, w, jax.random.key(2),
                             stage1_epochs=8, stage2_epochs=3)
    assert np.isfinite(metrics["loss"])
    scores = np.asarray(m.granger_matrix(params, threshold=False))
    assert scores.shape == (4, 4)
    # stage-2 freeze: pruned entries stay exactly zero after more training.
    pruned = np.asarray(tr.prune(params).w_in) == 0
    assert bool((np.asarray(params.w_in)[pruned] == 0).all())


def test_win_fit_many_matches_sequential_fits():
    """fit_many trains S inits in one vmapped program with per-seed streams
    identical to fit()'s (same split/shuffle discipline), so each seed's
    final params must match the sequential loop to float tolerance."""
    series = coupled_henon(jax.random.key(0), t=400, d=4)
    w = sliding_windows(series, 16)
    m = WInCRVAE(d=4, hidden=16, latent=8, tau=8)
    tr = WInTrainer(m, WInTrainConfig(batch_size=64, lam=0.05, lr=2e-3))

    keys = jax.random.split(jax.random.key(5), 3)
    p_stack = jax.vmap(m.init)(jax.random.split(jax.random.key(6), 3))
    many, m_many = tr.fit_many(p_stack, w, keys,
                               stage1_epochs=6, stage2_epochs=2,
                               epochs_per_dispatch=4)
    assert m_many["loss"].shape == (3,)

    for s in range(3):
        p_s = jax.tree.map(lambda x, s=s: x[s], p_stack)
        seq, _ = tr.fit(p_s, w, keys[s], stage1_epochs=6, stage2_epochs=2,
                        epochs_per_dispatch=4)
        for a, b in zip(jax.tree.leaves(seq),
                        jax.tree.leaves(jax.tree.map(
                            lambda x, s=s: x[s], many))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_win_fit_many_stage2_zero_epochs():
    """The stability-selection path: stage2_epochs=0 returns pruned stage-I
    params (prune still applied between stages)."""
    series = coupled_henon(jax.random.key(0), t=400, d=4)
    w = sliding_windows(series, 16)
    m = WInCRVAE(d=4, hidden=16, latent=8, tau=8)
    tr = WInTrainer(m, WInTrainConfig(batch_size=64, lam=0.2, lr=2e-3,
                                      prune_threshold=1e-3))
    p_stack = jax.vmap(m.init)(jax.random.split(jax.random.key(7), 2))
    many, _ = tr.fit_many(p_stack, w, jax.random.split(jax.random.key(8), 2),
                          stage1_epochs=5, stage2_epochs=0,
                          epochs_per_dispatch=5)
    w_in = np.asarray(many.w_in)
    # prune ran: no |entry| in (0, threshold].
    nz = w_in[w_in != 0]
    assert (np.abs(nz) > 1e-3).all()
