"""Gaussian KL divergence terms, matching the two reference conventions.

1. ``kl_gaussian``: parameterized by log-variance, the reduction used across
   the author scripts — sum over latent dims, mean over batch
   (``/root/reference/author_CRVAE.py:489``):
   KL = mean_B [ -0.5 Σ_H (1 + logvar - mu² - exp(logvar)) ].

2. ``kl_gaussian_logsigma``: parameterized by log-*sigma* with a mean (or
   batch-normalized sum) reduction, as in ``CRVAE.py:168`` / ``CR-VAE.py:255``:
   -0.5 · reduce(1 + 2logσ - mu² - exp(2logσ)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_gaussian(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, exp(logvar)) || N(0, I)): sum over last dim, mean over the rest."""
    per_sample = -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1)
    return per_sample.mean()


def kl_gaussian_logsigma(mu: jax.Array, logsigma: jax.Array,
                         reduction: str = "mean") -> jax.Array:
    """KL with a log-sigma parameterization.

    reduction='mean': mean over every element (``CRVAE.py:168``).
    reduction='sum_over_batch': sum over everything / batch (``CR-VAE.py:255``).
    """
    terms = -0.5 * (1.0 + 2.0 * logsigma - mu ** 2 - jnp.exp(2.0 * logsigma))
    if reduction == "mean":
        return terms.mean()
    if reduction == "sum_over_batch":
        return terms.sum() / mu.shape[0]
    raise ValueError(f"unknown reduction {reduction!r}")
