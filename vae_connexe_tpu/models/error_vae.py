"""Error-compensation sequence VAE (the reference's VRAE4E / ErrorVAE).

Trained on residuals ε = x − x̂ of the main CRVAE; at generation time it
synthesizes an error sequence that is blended into the rollout.

Reference semantics (``/root/reference/author_CRVAE.py:126-182``, clones at
``CRVAE_lorenz96.py:123-179``, ``CR-CS-RAE.py:191-247``; the compact W_in
variant at ``CRVAE.py:33-52`` and ``CR-VAE.py:50-77``):

- encoder GRU over the residual sequence → h_T → fc_mu / fc_std,
- z = μ + exp(0.5·logvar)·ε′, mapped through tanh(Linear) to the decoder's
  initial hidden state,
- decoder GRU over a teacher-forced input (the author variant feeds the
  zero-prepended residual sequence shifted right by one step,
  ``author_CRVAE.py:155,169``; the W_in variants feed the residuals
  unshifted, ``CRVAE.py:51``) with a Linear(H→D) readout,
- sampling: 21 free-running steps from a random initial hidden state and a
  zero start input (``author_CRVAE.py:174-182``).

Normalization note: ``CRVAE.py:44`` reparameterizes with 0.5·exp(logσ)·ε′
(a ``.mul`` chain quirk) and ``CR-VAE.py:68`` with exp(logσ)·ε′; this build
uses the standard exp(0.5·logvar) everywhere — parity is judged on AUROC /
generation quality, not on reproducing notebook quirks (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from vae_connexe_tpu.ops.gru import GRUParams, gru_cell, gru_scan, init_gru
from vae_connexe_tpu.utils.layers import Dense, dense, init_dense


@struct.dataclass
class ErrorVAEParams:
    enc: GRUParams     # D -> H
    fc_mu: Dense       # H -> Z
    fc_std: Dense      # H -> Z
    z2h: Dense         # Z -> H
    dec: GRUParams     # D -> H
    out: Dense         # H -> D


class ErrorVAE:
    """Functional error-compensation VAE.

    Args:
      d: number of series.
      hidden: GRU hidden size.
      latent: latent size (the author variant uses latent == hidden,
        ``author_CRVAE.py:139-140``; the W_in variants use hidden//2, Z//2).
      shift_decoder_input: author-variant teacher forcing (prepend a zero
        step and feed ε shifted right) vs identity input (W_in variants).
    """

    def __init__(self, d: int, hidden: int, latent: Optional[int] = None,
                 shift_decoder_input: bool = True, rollout_len: int = 21):
        self.d = d
        self.hidden = hidden
        self.latent = hidden if latent is None else latent
        self.shift_decoder_input = shift_decoder_input
        self.rollout_len = rollout_len

    def init(self, key: jax.Array) -> ErrorVAEParams:
        ks = jax.random.split(key, 6)
        return ErrorVAEParams(
            enc=init_gru(ks[0], self.d, self.hidden),
            fc_mu=init_dense(ks[1], self.hidden, self.latent),
            fc_std=init_dense(ks[2], self.hidden, self.latent),
            z2h=init_dense(ks[3], self.latent, self.hidden),
            dec=init_gru(ks[4], self.d, self.hidden),
            out=init_dense(ks[5], self.hidden, self.d),
        )

    def forward(self, params: ErrorVAEParams, eps_seq: jax.Array, key: jax.Array):
        """Reconstruct a residual sequence.

        eps_seq: (B, T, D) residuals.  Returns (recon (B, T, D), mu, logvar).
        """
        b = eps_seq.shape[0]
        h0 = jnp.zeros((b, self.hidden), eps_seq.dtype)
        _, h_t = gru_scan(params.enc, eps_seq, h0)
        mu = dense(params.fc_mu, h_t)
        logvar = dense(params.fc_std, h_t)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape, mu.dtype)
        h_dec = jnp.tanh(dense(params.z2h, z))
        if self.shift_decoder_input:
            dec_in = jnp.concatenate(
                [jnp.zeros_like(eps_seq[:, :1]), eps_seq[:, :-1]], axis=1)
        else:
            dec_in = eps_seq
        outs, _ = gru_scan(params.dec, dec_in, h_dec)
        return dense(params.out, outs), mu, logvar

    def sample(self, params: ErrorVAEParams, key: jax.Array, batch: int,
               length: Optional[int] = None,
               dtype: Optional[jnp.dtype] = None) -> jax.Array:
        """Free-running error-sequence generation from a random hidden state.

        Mirrors the ``mode='test'`` path (``author_CRVAE.py:174-182``):
        start from x₀ = 0 and h ~ N(0, I), roll ``length`` steps.  The
        reference keeps the leading zero step and returns length+1 steps;
        callers slice as needed.  Returns (B, length + 1, D).

        ``dtype``: optional serving precision (see ``CRVAE._free_run``) —
        the decoder weights, carries, and gate math run in that dtype; the
        returned sequence is float32 either way.
        """
        steps = self.rollout_len if length is None else length
        h0 = jax.random.normal(key, (batch, self.hidden))
        x0 = jnp.zeros((batch, self.d))
        dec, out_p = params.dec, params.out
        if dtype is not None:
            dec, out_p = jax.tree.map(lambda a: a.astype(dtype), (dec, out_p))
            h0, x0 = h0.astype(dtype), x0.astype(dtype)

        def step(carry, _):
            x, h = carry
            h_new = gru_cell(dec, x, h)
            x_new = dense(out_p, h_new)
            return (x_new, h_new), x_new

        _, seq = jax.lax.scan(step, (x0, h0), None, length=steps)
        seq = jnp.swapaxes(seq, 0, 1)                       # (B, steps, D)
        seq = jnp.concatenate([x0[:, None, :], seq], axis=1)
        return seq.astype(jnp.float32) if dtype is not None else seq
