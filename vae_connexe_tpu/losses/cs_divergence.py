"""Closed-form Cauchy–Schwarz divergence between a diagonal Gaussian posterior
and a learnable equal-weight GMM prior.

Reference: ``/root/reference/CS-RAE.py:69-113`` and ``CSRAE_new.py:85-105``.
D_CS(q‖p) = -log ∫qp + ½ log ∫p² + ½ log ∫q², with every cross term a
Gaussian overlap 𝒩(μ₁ | μ₂, Σ₁+Σ₂) (diagonal).

The two reference files differ only in the ∫p² term:

- ``variant='paper'`` (``CS-RAE.py:96-104``): pairwise overlaps computed as
  𝒩(μ_k | μ_k', 2σ_k'²) — zero variance on the first argument.
- ``variant='symmetric'`` (``CSRAE_new.py:94-99``): the symmetric overlap
  𝒩(μ_k | μ_k', σ_k² + σ_k'²).

TPU-native change: the reference exponentiates overlaps and re-logs them
(``CS-RAE.py:79,111``), underflowing at moderate latent dims.  Here every
term stays in log-space end to end (logsumexp over mixture components), which
agrees with the reference values in f32 wherever the reference doesn't
underflow, and keeps gradients finite where it does.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def log_gaussian_overlap(mu1: jax.Array, var1: jax.Array,
                         mu2: jax.Array, var2: jax.Array) -> jax.Array:
    """log 𝒩(μ₁ | μ₂, Σ₁+Σ₂) for diagonal covariances; broadcasts leading axes.

    Inputs have a trailing latent axis D; the result drops it.
    """
    var_sum = var1 + var2
    diff = mu1 - mu2
    d = mu1.shape[-1]
    log_norm = -0.5 * d * math.log(2.0 * math.pi) - 0.5 * jnp.sum(jnp.log(var_sum), axis=-1)
    log_exp = -0.5 * jnp.sum(diff ** 2 / var_sum, axis=-1)
    return log_norm + log_exp


def cs_divergence_gmm(mu_q: jax.Array, var_q: jax.Array,
                      mu_p: jax.Array, var_p: jax.Array,
                      variant: str = "symmetric") -> jax.Array:
    """D_CS(q ‖ GMM p) per batch element, clamped at 0.

    Args:
      mu_q, var_q: (B, D) posterior mean / variance.
      mu_p, var_p: (K, D) mixture component means / variances (equal weights).
      variant: 'symmetric' | 'paper' — the ∫p² convention (see module doc).

    Returns: (B,) divergences.
    """
    k = mu_p.shape[0]
    d = mu_q.shape[-1]

    # log ∫ qp = logmeanexp_k log𝒩(μ_q | μ_k, σ_q² + σ_k²)
    log_qp = log_gaussian_overlap(mu_q[:, None, :], var_q[:, None, :],
                                  mu_p[None, :, :], var_p[None, :, :])   # (B, K)
    log_term1 = jax.nn.logsumexp(log_qp, axis=1) - math.log(k)

    # log ∫ p² = logmeanexp_{k,k'} of the pairwise overlap.
    if variant == "symmetric":
        log_pp = log_gaussian_overlap(mu_p[:, None, :], var_p[:, None, :],
                                      mu_p[None, :, :], var_p[None, :, :])
    elif variant == "paper":
        zeros = jnp.zeros_like(var_p)
        log_pp = log_gaussian_overlap(mu_p[:, None, :], zeros[:, None, :],
                                      mu_p[None, :, :], 2.0 * var_p[None, :, :])
    else:
        raise ValueError(f"unknown variant {variant!r}")
    log_term2 = jax.nn.logsumexp(log_pp.reshape(-1)) - math.log(k * k)

    # log ∫ q² = log𝒩(μ_q | μ_q, 2σ_q²) = -D/2 log 2π - ½ Σ log(2σ_q²)
    log_term3 = -0.5 * d * math.log(2.0 * math.pi) - 0.5 * jnp.sum(jnp.log(2.0 * var_q), axis=-1)

    cs = -log_term1 + 0.5 * log_term2 + 0.5 * log_term3
    return jnp.clip(cs, min=0.0)
