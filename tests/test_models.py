"""Model-zoo behavior tests: shapes, masking, determinism, rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.models import (
    CRVAE,
    ErrorVAE,
    MixtureCSRAE,
    VRAE,
    WInCRVAE,
)


@pytest.fixture(scope="module")
def crvae():
    model = CRVAE(p=5, hidden=16)
    return model, model.init(jax.random.key(0))


def test_crvae_forward_shapes(crvae):
    model, params = crvae
    x = jax.random.normal(jax.random.key(1), (6, 20, 5))
    pred, mu, logvar = model.forward(params, x, jax.random.key(2))
    assert pred.shape == (6, 10, 5)
    assert mu.shape == (6, 16) and logvar.shape == (6, 16)


def test_crvae_rejects_short_windows(crvae):
    model, params = crvae
    with pytest.raises(ValueError, match="enc_len"):
        model.forward(params, jnp.zeros((2, 10, 5)), jax.random.key(0))


def test_crvae_deterministic_given_key(crvae):
    model, params = crvae
    x = jax.random.normal(jax.random.key(1), (4, 20, 5))
    a = model.forward(params, x, jax.random.key(7))[0]
    b = model.forward(params, x, jax.random.key(7))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = model.forward(params, x, jax.random.key(8))[0]
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_crvae_mask_blocks_information(crvae):
    """With parents mask M, head i's output must be invariant to input series
    j whenever M[i, j] = 0 — the causal-structure contract."""
    model, params = crvae
    mask = jnp.ones((5, 5)).at[2, 4].set(0.0)
    x = jax.random.normal(jax.random.key(1), (4, 20, 5))
    x_perturbed = x.at[:, :, 4].add(10.0)
    key = jax.random.key(3)
    # Encoder sees the perturbation, so compare decoder-only effect: use the
    # same z by comparing through identical (mu, logvar) inputs — easiest is
    # to perturb only the decoded segment (steps >= enc_len - 1 feed dec_in).
    x2 = x.at[:, model.enc_len:, 4].add(10.0)
    pred_a = model.forward(params, x, key, parents=mask)[0]
    pred_b = model.forward(params, x2, key, parents=mask)[0]
    # Head 2 never reads series 4: unchanged.
    np.testing.assert_allclose(np.asarray(pred_a[:, :, 2]),
                               np.asarray(pred_b[:, :, 2]), atol=1e-6)
    # Some other head does read series 4: changed.
    assert not np.allclose(np.asarray(pred_a[:, :, 4]), np.asarray(pred_b[:, :, 4]))


def test_crvae_gc_respects_mask(crvae):
    model, params = crvae
    mask = (jax.random.uniform(jax.random.key(5), (5, 5)) > 0.4).astype(jnp.float32)
    gc = model.gc(params, parents=mask, threshold=True)
    assert bool(((np.asarray(gc) == 0) | (np.asarray(mask) == 1)).all())


def test_crvae_rollout_with_noise(crvae):
    model, params = crvae
    noise = jnp.zeros((3, 21, 5))
    r0 = model.rollout(params, jax.random.key(9), 3, noise=noise)
    r1 = model.rollout(params, jax.random.key(9), 3)
    assert r0.shape == (3, 21, 5)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)
    big = model.rollout(params, jax.random.key(9), 3,
                        noise=jnp.ones((3, 21, 5)))
    assert not np.allclose(np.asarray(big), np.asarray(r1))


def test_error_vae_roundtrip_shapes():
    ev = ErrorVAE(d=4, hidden=12)
    p = ev.init(jax.random.key(0))
    eps = jax.random.normal(jax.random.key(1), (5, 10, 4))
    recon, mu, logvar = ev.forward(p, eps, jax.random.key(2))
    assert recon.shape == (5, 10, 4)
    s = ev.sample(p, jax.random.key(3), 7)
    assert s.shape == (7, 22, 4)          # leading zero step + 21 rollout
    assert bool((s[:, 0] == 0).all())


def test_win_crvae_phases_and_generate():
    m = WInCRVAE(d=4, hidden=12, latent=6, tau=8)
    p = m.init(jax.random.key(0))
    xp = jax.random.normal(jax.random.key(1), (5, 8, 4))
    xc = jax.random.normal(jax.random.key(2), (5, 8, 4))
    r1, mu, ls, me, le = m.forward(p, xp, xc, jax.random.key(3), phase=1)
    assert r1.shape == (5, 8, 4) and me is None
    r2, _, _, me2, le2 = m.forward(p, xp, xc, jax.random.key(3), phase=2)
    assert me2 is not None and r2.shape == (5, 8, 4)
    g = m.generate(p, jnp.concatenate([xp, xc], 1), jax.random.key(4), 13)
    assert g.shape == (5, 13, 4)
    gm = m.granger_matrix(p, threshold=False)
    assert gm.shape == (4, 4) and bool((np.asarray(gm) >= 0).all())


@pytest.mark.parametrize("rnn_type", ["rnn", "gru", "lstm"])
def test_vrae_cells_and_sampling(rnn_type):
    v = VRAE(input_dim=3, hidden_dim=10, latent_dim=4, rnn_type=rnn_type,
             output_activation="tanh")
    p = v.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (6, 7, 3))
    recon, mu, logvar = v.forward(p, x, jax.random.key(2), teacher_forcing_ratio=0.5)
    assert recon.shape == (6, 7, 3)
    assert bool((jnp.abs(recon) <= 1.0).all())     # tanh output head
    s = v.sample(p, jax.random.key(3), 2, 11)
    assert s.shape == (2, 11, 3)
    total, rec, kld = v.loss(recon, x, mu, logvar, beta=0.5)
    assert float(total) == pytest.approx(float(rec) + 0.5 * float(kld), rel=1e-6)


def test_vrae_full_teacher_forcing_uses_targets():
    """At ratio=1.0 every step consumes the shifted target, so the recon at
    step t is independent of the model's own step t-1 output."""
    v = VRAE(input_dim=2, hidden_dim=8, latent_dim=3, output_activation="none")
    p = v.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 6, 2))
    k = jax.random.key(2)
    r1 = v.forward(p, x, k, teacher_forcing_ratio=1.0)[0]
    r2 = v.forward(p, x, k, teacher_forcing_ratio=1.0)[0]
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_csrae_loss_components():
    c = MixtureCSRAE(input_dim=16, hidden_dims=(32,), latent_dim=6, k=3,
                     lambda_cs=2.0)
    p = c.init(jax.random.key(0))
    x = (jax.random.uniform(jax.random.key(1), (10, 16)) > 0.5).astype(jnp.float32)
    total, bce, cs = c.loss(p, x, jax.random.key(2))
    assert float(total) == pytest.approx(float(bce) + 2.0 * float(cs), rel=1e-5)
    assert float(cs) >= 0.0
    logits, mu, logvar = c.forward(p, x, jax.random.key(3))
    assert logits.shape == (10, 16) and mu.shape == (10, 6)


def test_crvae_conditioned_rollout(crvae):
    model, params = crvae
    ctx = jax.random.normal(jax.random.key(20), (6, 20, 5))
    out = model.conditioned_rollout(params, ctx, jax.random.key(21))
    assert out.shape == (6, 21, 5)
    assert bool(jnp.isfinite(out).all())
    # Conditioning matters: different contexts give different continuations.
    out2 = model.conditioned_rollout(params, ctx + 1.0, jax.random.key(21))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # Noise injection mirrors the cold-start rollout contract.
    noisy = model.conditioned_rollout(params, ctx, jax.random.key(21),
                                      noise=jnp.ones((6, 21, 5)))
    assert not np.allclose(np.asarray(out), np.asarray(noisy))


def test_conditioned_rollout_uses_recent_context():
    """The latent must come from the LAST enc_len steps: a long context
    whose head differs but whose tail matches must condition identically."""
    model = CRVAE(p=3, hidden=8)
    params = model.init(jax.random.key(0))
    tail = jax.random.normal(jax.random.key(1), (4, 10, 3))
    head_a = jax.random.normal(jax.random.key(2), (4, 50, 3))
    head_b = head_a + 5.0
    ctx_a = jnp.concatenate([head_a, tail], axis=1)
    ctx_b = jnp.concatenate([head_b, tail], axis=1)
    out_a = model.conditioned_rollout(params, ctx_a, jax.random.key(3))
    out_b = model.conditioned_rollout(params, ctx_b, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # And a different TAIL must change the continuation.
    ctx_c = jnp.concatenate([head_a, tail + 1.0], axis=1)
    out_c = model.conditioned_rollout(params, ctx_c, jax.random.key(3))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c))


def test_rollout_rejects_mismatched_noise_length():
    """ErrorVAE.sample returns length+1 steps; an unsliced pass-through must
    be a clear error, not a silent rollout-length change (the round-2
    conditioned-artifact bug)."""
    import pytest

    model = CRVAE(p=3, hidden=8, enc_len=3, rollout_len=5)
    params = model.init(jax.random.key(0))
    bad_noise = jnp.zeros((4, 6, 3))               # 6 != rollout_len 5
    with pytest.raises(ValueError, match="slice the error-VAE sample"):
        model.rollout(params, jax.random.key(1), 4, noise=bad_noise)
    ctx = jnp.zeros((4, 3, 3))
    with pytest.raises(ValueError, match="slice the error-VAE sample"):
        model.conditioned_rollout(params, ctx, jax.random.key(2),
                                  noise=bad_noise)
