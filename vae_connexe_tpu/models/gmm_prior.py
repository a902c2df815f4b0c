"""Learnable isotropic Gaussian-mixture prior with equal weights.

Reference: ``/root/reference/CS-RAE.py:47-61`` (also copied at
``CR-CS-RAE.py:107-121``): K components, means initialized 0.05·N(0,1),
log-variances initialized to zero, trained jointly with the model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GMMPrior:
    mu: jax.Array       # (K, D)
    logvar: jax.Array   # (K, D), log σ²_k

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)


def init_gmm_prior(key: jax.Array, k: int, latent_dim: int, dtype=jnp.float32) -> GMMPrior:
    return GMMPrior(
        mu=0.05 * jax.random.normal(key, (k, latent_dim), dtype),
        logvar=jnp.zeros((k, latent_dim), dtype),
    )
