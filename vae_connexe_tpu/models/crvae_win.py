"""CRVAE, explicit-W_in parameterization.

The reference contains two clean-room rewrites of the CRVAE where the causal
structure lives in an explicit per-head input matrix ``W_in[p] ∈ ℝ^{D×H}``
applied *before* a head GRU of input width H, instead of inside the GRU's
own input weights:

- ``/root/reference/CRVAE.py:55-150`` (``W_in`` ParameterList, tanh(z2h(z))
  initial hidden, integrated ErrorVAE, row-group ISTA),
- ``/root/reference/CR-VAE.py:79-224`` (same structure, W_in passed as a
  forward argument, element-wise L1 prox).

Both are configs of this one implementation; the prox-group choice (row vs
element) lives in the trainer, not the model.

Semantics mapped:

- forward (``CRVAE.py:75-102``): encode x_past (B, τ, D) → (μ, logσ),
  z = μ + σ·ε, h₀ = tanh(z2h(z)) shared by all heads; decoder input is the
  teacher-forced [x_past[-1], x_cur[:-1]]; head p consumes dec_in @ W_in[p];
  phase 2 adds the error VAE's reconstruction of the detached residual.
- generate (``CRVAE.py:105-123``): encode the last τ context steps, then roll
  T steps feeding each head the previous emitted value through its W_in (the
  reference materializes the recent window but consumes only its last step,
  ``CRVAE.py:119``) — here one ``lax.scan`` carrying all heads' states.
- granger_matrix (``CRVAE.py:126-131``): row j of head p's W_in has L2 norm
  > thr ⇔ series j causes series p.

TPU-first: heads stacked on a leading axis, W_in as one (D, D, H) tensor so
the causal projection for all heads is a single einsum on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from vae_connexe_tpu.models.error_vae import ErrorVAE, ErrorVAEParams
from vae_connexe_tpu.ops.dispatch import heads_recurrence
from vae_connexe_tpu.ops.gru import (
    GRUParams,
    gru_scan,
    gru_step_heads,
    init_gru,
    init_stacked_gru,
)
from vae_connexe_tpu.utils.layers import Dense, dense, init_dense, init_stacked_dense


@struct.dataclass
class WInCRVAEParams:
    enc: GRUParams          # D -> H
    fc_mu: Dense            # H -> Z
    fc_logsig: Dense        # H -> Z
    z2h: Dense              # Z -> H
    w_in: jax.Array         # (D, D, H): head p's input matrix is w_in[p]
    heads: GRUParams        # stacked (D, 3H, H)
    readout: Dense          # stacked (D, 1, H)
    err: ErrorVAEParams     # error-compensation VAE (D, H//2, Z//2)


class WInCRVAE:
    def __init__(self, d: int, hidden: int = 64, latent: int = 32, tau: int = 10,
                 w_in_init_scale: float = 0.01):
        self.d = d
        self.hidden = hidden
        self.latent = latent
        self.tau = tau
        self.w_in_init_scale = w_in_init_scale
        self.err_vae = ErrorVAE(d, hidden // 2, latent // 2,
                                shift_decoder_input=False)

    def init(self, key: jax.Array) -> WInCRVAEParams:
        ks = jax.random.split(key, 8)
        return WInCRVAEParams(
            enc=init_gru(ks[0], self.d, self.hidden),
            fc_mu=init_dense(ks[1], self.hidden, self.latent),
            fc_logsig=init_dense(ks[2], self.hidden, self.latent),
            z2h=init_dense(ks[3], self.latent, self.hidden),
            w_in=self.w_in_init_scale
            * jax.random.normal(ks[4], (self.d, self.d, self.hidden)),
            heads=init_stacked_gru(ks[5], self.d, self.hidden, self.hidden),
            readout=init_stacked_dense(ks[6], self.d, self.hidden, 1),
            err=self.err_vae.init(ks[7]),
        )

    def encode(self, params: WInCRVAEParams, x: jax.Array):
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), x.dtype)
        _, h_t = gru_scan(params.enc, x, h0)
        return dense(params.fc_mu, h_t), dense(params.fc_logsig, h_t)

    def _heads_decode(self, params: WInCRVAEParams, dec_in: jax.Array,
                      h0: jax.Array) -> jax.Array:
        """dec_in (B, T, D) through per-head W_in + GRU + readout -> (B, T, D)."""
        x_sel = jnp.einsum("btd,pdh->pbth", dec_in, params.w_in)
        outs, _ = heads_recurrence(params.heads, x_sel, h0)   # (D, B, T, H)
        pred = jnp.einsum("pbth,poh->pbto", outs, params.readout.w) \
            + params.readout.b[:, None, None, :]
        return jnp.transpose(pred[..., 0], (1, 2, 0))

    def forward(self, params: WInCRVAEParams, x_past: jax.Array, x_cur: jax.Array,
                key: jax.Array, phase: int = 1):
        """Teacher-forced reconstruction of x_cur.

        Returns (recon, mu, logsig, mu_e, logsig_e); the error-VAE stats are
        None in phase 1.
        """
        k_z, k_e = jax.random.split(key)
        mu, logsig = self.encode(params, x_past)
        z = mu + jnp.exp(logsig) * jax.random.normal(k_z, mu.shape, mu.dtype)
        h0 = jnp.tanh(dense(params.z2h, z))
        h0 = jnp.broadcast_to(h0, (self.d,) + h0.shape)

        dec_in = jnp.concatenate([x_past[:, -1:, :], x_cur[:, :-1, :]], axis=1)
        recon = self._heads_decode(params, dec_in, h0)

        if phase == 1:
            return recon, mu, logsig, None, None
        # Phase 2: the residual is a gradient firewall — the error VAE never
        # backprops into the causal decoder (``CRVAE.py:99``).
        eps = jax.lax.stop_gradient(x_cur - recon)
        eps_hat, mu_e, logvar_e = self.err_vae.forward(params.err, eps, k_e)
        return recon + eps_hat, mu, logsig, mu_e, logvar_e

    def generate(self, params: WInCRVAEParams, x_context: jax.Array,
                 key: jax.Array, length: int,
                 dtype: Optional[jnp.dtype] = None) -> jax.Array:
        """Autoregressive free-running generation.  Returns (B, length, D).

        ``dtype``: optional serving precision (see ``CRVAE._free_run``) —
        the rollout weights (w_in, heads, readout), carries, and gate math
        run in that dtype with float32 output; the one-pass encoder stays
        f32.  Default None is the exact f32 program.
        """
        mu, logsig = self.encode(params, x_context[:, -self.tau:, :])
        z = mu + jnp.exp(logsig) * jax.random.normal(key, mu.shape, mu.dtype)
        h = jnp.tanh(dense(params.z2h, z))
        h = jnp.broadcast_to(h, (self.d,) + h.shape)
        x_last = x_context[:, -1, :]
        w_in, heads, readout = params.w_in, params.heads, params.readout
        if dtype is not None:
            w_in, heads, readout = jax.tree.map(
                lambda a: a.astype(dtype), (w_in, heads, readout))
            x_last, h = x_last.astype(dtype), h.astype(dtype)

        def step(carry, _):
            x_t, h_t = carry
            x_sel = jnp.einsum("bd,pdh->pbh", x_t, w_in)
            h_new = gru_step_heads(heads, x_sel, h_t)
            out = jnp.einsum("pbh,poh->pbo", h_new, readout.w) \
                + readout.b[:, None, :]
            x_new = out[..., 0].T
            return (x_new, h_new), x_new

        _, seq = jax.lax.scan(step, (x_last, h), None, length=length)
        seq = jnp.swapaxes(seq, 0, 1)
        return seq.astype(jnp.float32) if dtype is not None else seq

    def granger_matrix(self, params: WInCRVAEParams, thr: float = 1e-6,
                       threshold: bool = True) -> jax.Array:
        """(D, D) causal matrix: entry (p, j) from ‖W_in[p][j, :]‖₂."""
        scores = jnp.linalg.norm(params.w_in, axis=-1)       # (D, D)
        if threshold:
            return (scores > thr).astype(jnp.float32)
        return scores
