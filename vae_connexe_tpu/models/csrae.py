"""MixtureCSRAE — MLP VAE regularized by a Cauchy–Schwarz divergence against
a learnable GMM prior instead of the KL term.

Reference: ``/root/reference/CS-RAE.py:8-155`` / ``CSRAE_new.py`` (identical
except the ∫p² convention — both exposed via the ``cs_variant`` flag):
MLP encoder with ReLU hidden stack → (μ, logvar); Bernoulli-logit MLP
decoder (hidden dims reversed); loss = BCE-with-logits summed / B +
λ_cs · mean D_CS(q ‖ GMM).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from vae_connexe_tpu.losses.cs_divergence import cs_divergence_gmm
from vae_connexe_tpu.models.gmm_prior import GMMPrior, init_gmm_prior
from vae_connexe_tpu.utils.layers import Dense, dense, init_dense


@struct.dataclass
class MLPParams:
    layers: tuple[Dense, ...]
    head: Dense


def _init_mlp(key: jax.Array, dims: Sequence[int], out_dim: int) -> MLPParams:
    keys = jax.random.split(key, len(dims))
    layers = tuple(
        init_dense(keys[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1))
    return MLPParams(layers=layers, head=init_dense(keys[-1], dims[-1], out_dim))


def _mlp(p: MLPParams, x: jax.Array) -> jax.Array:
    for layer in p.layers:
        x = jax.nn.relu(dense(layer, x))
    return dense(p.head, x)


@struct.dataclass
class MixtureCSRAEParams:
    enc: MLPParams
    enc_logvar_head: Dense
    dec: MLPParams
    prior: GMMPrior


class MixtureCSRAE:
    def __init__(self, input_dim: int, hidden_dims: Sequence[int] = (400,),
                 latent_dim: int = 20, k: int = 10, lambda_cs: float = 1.0,
                 cs_variant: str = "symmetric"):
        self.input_dim = input_dim
        self.hidden_dims = tuple(hidden_dims)
        self.latent_dim = latent_dim
        self.k = k
        self.lambda_cs = lambda_cs
        self.cs_variant = cs_variant

    def init(self, key: jax.Array) -> MixtureCSRAEParams:
        ks = jax.random.split(key, 4)
        enc = _init_mlp(ks[0], (self.input_dim, *self.hidden_dims), self.latent_dim)
        # A second head off the same trunk for logvar (``CS-RAE.py:17-18``).
        logvar_head = init_dense(ks[1], self.hidden_dims[-1], self.latent_dim)
        dec = _init_mlp(ks[2], (self.latent_dim, *self.hidden_dims[::-1]), self.input_dim)
        return MixtureCSRAEParams(
            enc=enc, enc_logvar_head=logvar_head, dec=dec,
            prior=init_gmm_prior(ks[3], self.k, self.latent_dim))

    def encode(self, params: MixtureCSRAEParams, x: jax.Array):
        h = x
        for layer in params.enc.layers:
            h = jax.nn.relu(dense(layer, h))
        return dense(params.enc.head, h), dense(params.enc_logvar_head, h)

    def decode(self, params: MixtureCSRAEParams, z: jax.Array) -> jax.Array:
        """Bernoulli logits."""
        return _mlp(params.dec, z)

    def forward(self, params: MixtureCSRAEParams, x: jax.Array, key: jax.Array):
        mu, logvar = self.encode(params, x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape, mu.dtype)
        return self.decode(params, z), mu, logvar

    def sample(self, params: MixtureCSRAEParams, key: jax.Array,
               n: int) -> jax.Array:
        """Generate n samples: draw z from the learned equal-weight GMM prior
        (uniform component choice, ``CS-RAE.py:47-61`` trains no weights),
        decode, and return Bernoulli probabilities (n, input_dim)."""
        k_comp, k_eps = jax.random.split(key)
        comp = jax.random.randint(k_comp, (n,), 0, self.k)
        mu = params.prior.mu[comp]
        std = jnp.sqrt(params.prior.var[comp])
        z = mu + std * jax.random.normal(k_eps, mu.shape, mu.dtype)
        return jax.nn.sigmoid(self.decode(params, z))

    def loss(self, params: MixtureCSRAEParams, x: jax.Array, key: jax.Array):
        """(total, recon, cs) — BCE-with-logits/B + λ_cs · mean CS divergence."""
        logits, mu, logvar = self.forward(params, x, key)
        bce = jnp.sum(jnp.clip(logits, min=0) - logits * x
                      + jnp.log1p(jnp.exp(-jnp.abs(logits)))) / x.shape[0]
        cs = cs_divergence_gmm(mu, jnp.exp(logvar), params.prior.mu,
                               params.prior.var, variant=self.cs_variant).mean()
        return bce + self.lambda_cs * cs, bce, cs
