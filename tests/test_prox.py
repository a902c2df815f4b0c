"""Proximal-operator fixed points and reference-semantics parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.optim import prox_column_groups, prox_elementwise, prox_row_groups


def test_column_groups_zero_below_threshold():
    w = jnp.array([[0.01, 1.0], [0.01, 1.0]])   # col 0 norm ≈ 0.014, col 1 ≈ 1.41
    out = prox_column_groups(w, lam=1.0, lr=0.1)  # threshold 0.1
    assert bool((out[:, 0] == 0).all())
    assert bool((out[:, 1] != 0).all())


def test_column_groups_shrinks_by_lam_lr():
    w = jnp.array([[3.0], [4.0]])                 # norm 5
    out = prox_column_groups(w, lam=2.0, lr=0.5)  # shrink by 1 -> norm 4
    assert float(jnp.linalg.norm(out)) == pytest.approx(4.0, rel=1e-6)
    # Direction preserved.
    np.testing.assert_allclose(np.asarray(out / 4.0), np.asarray(w / 5.0), rtol=1e-6)


def test_column_groups_matches_reference_clamp_form():
    """Pin against the literal reference update
    W ← (W / clamp(‖W‖, min=λ·lr)) · clamp(‖W‖ − λ·lr, min=0)
    (``author_CRVAE.py:311-317``)."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(12, 7)).astype(np.float32)
    lam, lr = 0.3, 0.05
    norm = np.linalg.norm(w, axis=0, keepdims=True)
    expected = (w / np.clip(norm, lam * lr, None)) * np.clip(norm - lam * lr, 0, None)
    got = prox_column_groups(jnp.asarray(w), lam, lr)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-7)


def test_lam_zero_is_identity():
    w = jax.random.normal(jax.random.key(0), (4, 48, 4))
    for fn in (prox_column_groups, prox_row_groups, prox_elementwise):
        np.testing.assert_allclose(np.asarray(fn(w, 0.0, 0.05)), np.asarray(w),
                                   rtol=1e-6)


def test_zero_column_stays_zero_without_nan():
    w = jnp.zeros((6, 3))
    for lam in (0.0, 0.1):
        out = prox_column_groups(w, lam, 0.05)
        assert bool(jnp.isfinite(out).all()) and bool((out == 0).all())


def test_row_groups_semantics():
    """Row shrink factor clamp(1 − λ·lr/‖row‖, 0) (``CRVAE.py:145-147``)."""
    w = jnp.array([[3.0, 4.0], [0.01, 0.0]])
    out = prox_row_groups(w, lam=1.0, lr=0.5)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.array([3.0, 4.0]) * (1 - 0.5 / 5.0), rtol=1e-6)
    assert bool((out[1] == 0).all())


def test_elementwise_soft_threshold():
    w = jnp.array([-0.3, -0.05, 0.0, 0.05, 0.3])
    out = prox_elementwise(w, lam=1.0, lr=0.1)
    np.testing.assert_allclose(np.asarray(out),
                               np.array([-0.2, 0.0, 0.0, 0.0, 0.2]), atol=1e-7)


def test_prox_is_exact_minimizer_column():
    """prox_{t‖·‖}(v) minimizes 0.5‖w−v‖² + t·Σ‖w_col‖ — check via perturbation."""
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    t_lam, t_lr = 0.4, 0.2

    def objective(w):
        return (0.5 * jnp.sum((w - v) ** 2)
                + t_lam * t_lr * jnp.sum(jnp.linalg.norm(w, axis=0)))

    w_star = prox_column_groups(v, t_lam, t_lr)
    f_star = float(objective(w_star))
    for seed in range(5):
        pert = 1e-3 * jax.random.normal(jax.random.key(seed), v.shape)
        assert float(objective(w_star + pert)) >= f_star - 1e-9
