"""Unit tests for loss terms: closed forms and reference-value parity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.losses import (
    cs_divergence_gmm,
    kl_gaussian,
    kl_gaussian_logsigma,
    log_gaussian_overlap,
)


def test_kl_zero_for_standard_normal():
    mu = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(kl_gaussian(mu, logvar)) == pytest.approx(0.0, abs=1e-7)


def test_kl_analytic_value():
    # KL(N(m, s^2) || N(0,1)) = 0.5*(s^2 + m^2 - 1 - log s^2), summed over dims.
    mu = jnp.array([[0.5, -1.0]])
    var = jnp.array([[0.25, 2.0]])
    expected = 0.5 * np.sum(var + mu ** 2 - 1.0 - np.log(var))
    got = float(kl_gaussian(mu, jnp.log(var)))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_kl_logsigma_matches_logvar_form():
    key = jax.random.key(0)
    mu = jax.random.normal(key, (16, 6))
    logvar = 0.3 * jax.random.normal(jax.random.key(1), (16, 6))
    a = kl_gaussian(mu, logvar)                   # sum over dim, mean over batch
    b = kl_gaussian_logsigma(mu, logvar / 2, reduction="mean") * 6
    assert float(a) == pytest.approx(float(b), rel=1e-5)


def test_gaussian_overlap_matches_density():
    # log N(mu1 | mu2, var1+var2) for scalars vs scipy-style manual formula.
    mu1 = jnp.array([[1.0]])
    var1 = jnp.array([[0.5]])
    mu2 = jnp.array([[0.2]])
    var2 = jnp.array([[0.3]])
    got = float(log_gaussian_overlap(mu1, var1, mu2, var2)[0])
    v = 0.8
    expected = -0.5 * math.log(2 * math.pi * v) - 0.5 * (0.8 ** 2) / v
    assert got == pytest.approx(expected, rel=1e-6)


def test_cs_divergence_nonnegative_and_zero_at_prior():
    """D_CS(q||p) = 0 when q equals a one-component 'mixture' prior."""
    mu = jnp.array([[0.3, -0.7, 1.1]])
    var = jnp.array([[0.5, 1.2, 0.8]])
    cs = cs_divergence_gmm(mu, var, mu, var, variant="symmetric")
    assert float(cs[0]) == pytest.approx(0.0, abs=1e-5)

    # Away from the prior it is strictly positive.
    cs2 = cs_divergence_gmm(mu + 3.0, var, mu, var, variant="symmetric")
    assert float(cs2[0]) > 0.1


@pytest.mark.parametrize("variant", ["symmetric", "paper"])
def test_cs_divergence_matches_reference_formula(variant):
    """Pin against a direct NumPy transcription of the reference math
    (``CS-RAE.py:82-113`` / ``CSRAE_new.py:85-105``) in a regime where the
    reference's exp-then-log doesn't underflow."""
    rng = np.random.default_rng(0)
    b, k, d = 3, 4, 5
    mu_q = rng.normal(size=(b, d))
    var_q = rng.uniform(0.5, 1.5, size=(b, d))
    mu_p = rng.normal(size=(k, d))
    var_p = rng.uniform(0.5, 1.5, size=(k, d))

    def overlap(m1, v1, m2, v2):
        vs = v1 + v2
        log_n = -0.5 * d * math.log(2 * math.pi) - 0.5 * np.sum(np.log(vs), -1)
        log_e = -0.5 * np.sum((m1 - m2) ** 2 / vs, -1)
        return np.exp(log_n + log_e)

    term1 = overlap(mu_q[:, None], var_q[:, None], mu_p[None], var_p[None]).mean(1)
    if variant == "symmetric":
        term2 = overlap(mu_p[:, None], var_p[:, None], mu_p[None], var_p[None]).mean()
    else:
        term2 = overlap(mu_p[:, None], np.zeros_like(var_p)[:, None],
                        mu_p[None], 2 * var_p[None]).mean()
    log_term3 = -0.5 * d * math.log(2 * math.pi) - 0.5 * np.sum(np.log(2 * var_q), -1)
    expected = np.clip(-np.log(term1) + 0.5 * np.log(term2) + 0.5 * log_term3, 0, None)

    got = cs_divergence_gmm(jnp.asarray(mu_q), jnp.asarray(var_q),
                            jnp.asarray(mu_p), jnp.asarray(var_p), variant=variant)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=1e-6)


def test_cs_divergence_log_space_robust():
    """Tiny variances at D=64 stay finite (the reference's exp/log underflows)."""
    mu_q = jnp.zeros((2, 64))
    var_q = jnp.full((2, 64), 1e-20)
    mu_p = jnp.zeros((5, 64))
    var_p = jnp.ones((5, 64))
    cs = cs_divergence_gmm(mu_q, var_q, mu_p, var_p)
    assert bool(jnp.isfinite(cs).all())
