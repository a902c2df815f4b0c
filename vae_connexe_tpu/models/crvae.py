"""CRVAE — causal recurrent VAE, author parameterization (the flagship).

A GRU encoder maps a short past window to a latent Gaussian z; p independent
GRU decoder heads (one per output variable) predict each variable's future
from all variables' pasts; the column norms of each head's input weight
matrix ARE the learned Granger-causal graph.

Reference: ``/root/reference/author_CRVAE.py:100-307`` (clones at
``CRVAE_lorenz96.py:97-304``, ``CR-CS-RAE.py:165-374``).  Semantics mapped:

- Training forward (``author_CRVAE.py:206-224``): with a zero step prepended
  to the (B, T, p) window, the encoder reads steps 1..enc_len (= the first
  enc_len real steps), fc_mu/fc_std produce (μ, logvar), z = μ + σ·ε is used
  *directly* as every head's initial hidden state, and each head decodes the
  teacher-forced input [0, x_{enc_len}..x_{T-2}] to predict targets
  x_{enc_len}..x_{T-1}.  The reference hardcodes enc_len = 10
  (``author_CRVAE.py:211``, slice ``X[:,1:11,:]``); here it is config.
- Free-running generation (``author_CRVAE.py:226-246``): from x₀ = 0 and a
  shared h₀ ~ N(0, I), all heads step together for rollout_len (= 21,
  ``author_CRVAE.py:232``) steps; in the error-compensated mode each emitted
  step adds 0.1·noise_t from the error VAE (``author_CRVAE.py:284-286``).
- GC extraction (``author_CRVAE.py:289-307``): row i of the (p, p) matrix is
  the per-input-column L2 norm of head i's ``w_ih``.

TPU-first design changes (same capabilities, static shapes):

- The reference gathers parent columns with a host-side ``np.where`` inside
  the model (``author_CRVAE.py:118``) and re-instantiates heads with shrunk
  input widths for phase 2 (``author_CRVAE.py:202-204,794``) — both break
  jit.  Here every head keeps full input width p and its ``w_ih`` columns
  are multiplied by a binary parents mask; pruned columns are exactly zero
  (the prox keeps them zero, the train step re-projects), so the forward
  compute and the extracted GC are identical to the gathered version.
- The Python loop over heads becomes one stacked-head batched recurrence
  (``ops.gru.gru_scan_heads``); the 21-step rollout is one ``lax.scan``
  carrying all heads' hidden states instead of 21×p kernel launches.
- Sampling uses explicit PRNG keys (the reference draws from the torch
  global RNG each forward, ``author_CRVAE.py:217``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from vae_connexe_tpu.ops.dispatch import gru_sequence, heads_recurrence
from vae_connexe_tpu.ops.gru import (
    GRUParams,
    gru_step_heads,
    init_gru,
    init_stacked_gru,
)
from vae_connexe_tpu.utils.layers import Dense, dense, init_dense, init_stacked_dense


@struct.dataclass
class CRVAEParams:
    enc: GRUParams       # p -> H shared encoder
    fc_mu: Dense         # H -> H
    fc_std: Dense        # H -> H
    heads: GRUParams     # stacked (p, 3H, p) decoder GRUs
    readout: Dense       # stacked (p, 1, H) per-head output layers


def masked_heads(heads: GRUParams, parents: jax.Array) -> GRUParams:
    """Zero the input-weight columns of non-parents.

    ``parents``: (p, p) binary, row i = parent indicator of variable i — the
    static-shape equivalent of the reference's per-head column gather.
    """
    return heads.replace(w_ih=heads.w_ih * parents[:, None, :].astype(heads.w_ih.dtype))


class CRVAE:
    """Functional CRVAE (author variant)."""

    def __init__(self, p: int, hidden: int = 64, enc_len: int = 10,
                 rollout_len: int = 21, noise_scale: float = 0.1):
        self.p = p
        self.hidden = hidden
        self.enc_len = enc_len
        self.rollout_len = rollout_len
        self.noise_scale = noise_scale

    def init(self, key: jax.Array) -> CRVAEParams:
        ks = jax.random.split(key, 5)
        return CRVAEParams(
            enc=init_gru(ks[0], self.p, self.hidden),
            fc_mu=init_dense(ks[1], self.hidden, self.hidden),
            fc_std=init_dense(ks[2], self.hidden, self.hidden),
            heads=init_stacked_gru(ks[3], self.p, self.p, self.hidden),
            readout=init_stacked_dense(ks[4], self.p, self.hidden, 1),
        )

    # ---------------- encode / forward ----------------

    def encode(self, params: CRVAEParams, x: jax.Array):
        """Past window -> (mu, logvar).  x: (B, T, p), encoder reads the
        first enc_len steps with h0 = 0."""
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), x.dtype)
        _, h_t = gru_sequence(params.enc, x[:, : self.enc_len], h0)
        return dense(params.fc_mu, h_t), dense(params.fc_std, h_t)

    def forward(self, params: CRVAEParams, x: jax.Array, key: jax.Array,
                parents: Optional[jax.Array] = None,
                deterministic: bool = False):
        """Teacher-forced reconstruction of the window's second half.

        Args:
          x: (B, T, p) window, T > enc_len.
          parents: optional (p, p) binary connection mask.
          deterministic: use z = mu (no sampling) — for parity tests and
            deterministic eval.

        Returns:
          (pred (B, T - enc_len, p), mu (B, H), logvar (B, H)) where
          ``pred[:, t, i]`` estimates ``x[:, enc_len + t, i]``.
        """
        if x.shape[1] <= self.enc_len:
            raise ValueError(
                f"window length {x.shape[1]} must exceed enc_len={self.enc_len}: "
                "the encoder reads the first enc_len steps and the decoder "
                "predicts the remaining T - enc_len.")
        heads = params.heads if parents is None else masked_heads(params.heads, parents)
        mu, logvar = self.encode(params, x)
        if deterministic:
            z = mu
        else:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape, mu.dtype)

        # Teacher-forced decoder input: a zero step, then the targets shifted
        # right by one (= [0, x_enc_len .. x_{T-2}]), as author_CRVAE.py:122.
        dec_in = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, self.enc_len:-1]], axis=1)
        h0 = jnp.broadcast_to(z, (self.p,) + z.shape)       # z is every head's h0
        outs, _ = heads_recurrence(heads, dec_in, h0)        # (p, B, Td, H)
        pred = jnp.einsum("pbth,poh->pbto", outs, params.readout.w) \
            + params.readout.b[:, None, None, :]
        return jnp.transpose(pred[..., 0], (1, 2, 0)), mu, logvar

    # ---------------- generation ----------------

    def _free_run(self, params: CRVAEParams, heads: GRUParams, x0: jax.Array,
                  h0: jax.Array, noise: jax.Array,
                  steps: Optional[int] = None,
                  dtype: Optional[jnp.dtype] = None) -> jax.Array:
        """Shared generation core: scan every head one GRU step per emitted
        value, injecting ``noise_scale * noise_t`` (the compensated value
        feeds the next step, ``author_CRVAE.py:284-286``).

        ``dtype``: optional serving precision (e.g. ``jnp.bfloat16``) — the
        weights, carries, and gate math run in that dtype and the output is
        cast back to float32.  Halves the per-step hidden-state working set
        (B·(p+1)·H) that bounds the serving batch, and the parameter +
        state HBM traffic of the sequential rollout chain.  Training and
        eval paths never pass it; the reference has no reduced-precision
        (or any) serving story.
        """
        if steps is not None and noise.shape[1] != steps:
            # The scan length is noise.shape[1]; a silently mismatched noise
            # would change the rollout length (ErrorVAE.sample returns
            # length+1 steps — callers must slice).
            raise ValueError(
                f"noise has {noise.shape[1]} steps but the rollout wants "
                f"{steps}; slice the error-VAE sample to the rollout length")
        readout = params.readout
        if dtype is not None:
            heads, readout = jax.tree.map(lambda a: a.astype(dtype),
                                          (heads, readout))
            x0, h0, noise = (a.astype(dtype) for a in (x0, h0, noise))

        def step(carry, noise_t):
            x_last, h = carry
            h_new = gru_step_heads(heads, x_last, h)         # (p, B, H)
            out = jnp.einsum("pbh,poh->pbo", h_new, readout.w) \
                + readout.b[:, None, :]
            x_t = out[..., 0].T + self.noise_scale * noise_t  # (B, p)
            return (x_t, h_new), x_t

        _, seq = jax.lax.scan(step, (x0, h0), jnp.swapaxes(noise, 0, 1))
        seq = jnp.swapaxes(seq, 0, 1)
        return seq.astype(jnp.float32) if dtype is not None else seq

    def rollout(self, params: CRVAEParams, key: jax.Array, batch: int,
                noise: Optional[jax.Array] = None,
                parents: Optional[jax.Array] = None,
                length: Optional[int] = None,
                dtype: Optional[jnp.dtype] = None) -> jax.Array:
        """Free-running generation (the reference's ``mode='test'``).

        Starts from x₀ = 0 with one shared random h₀ for all heads; each of
        ``length`` steps runs every head one GRU step on the previous output.
        ``noise``: optional (B, length, p) error-VAE sequence added as
        ``noise_scale * noise_t`` to each emitted step (phase-2 compensation,
        ``author_CRVAE.py:284-286``).  Returns (B, length, p).
        """
        steps = self.rollout_len if length is None else length
        heads = params.heads if parents is None else masked_heads(params.heads, parents)
        h0 = jax.random.normal(key, (batch, self.hidden))
        h0 = jnp.broadcast_to(h0, (self.p, batch, self.hidden))
        x0 = jnp.zeros((batch, self.p))
        if noise is None:
            noise = jnp.zeros((batch, steps, self.p))
        return self._free_run(params, heads, x0, h0, noise, steps, dtype=dtype)

    def conditioned_rollout(self, params: CRVAEParams, x_context: jax.Array,
                            key: jax.Array, noise: Optional[jax.Array] = None,
                            parents: Optional[jax.Array] = None,
                            length: Optional[int] = None,
                            dtype: Optional[jnp.dtype] = None) -> jax.Array:
        """Generation conditioned on a real context window.

        The reference's author-variant rollout always cold-starts from
        x₀ = 0 and h₀ ~ N(0, I) (``author_CRVAE.py:227-228``), which puts
        early samples off-manifold; its W_in variant shows the conditioned
        alternative (``CRVAE.py:105-123``).  This is that mode for the
        author parameterization: encode the context exactly as in training,
        use z as every head's initial hidden state, and continue from the
        context's last observation.

        x_context: (B, T ≥ enc_len, p).  Returns (B, length, p).
        """
        if x_context.shape[1] < self.enc_len:
            raise ValueError(
                f"context length {x_context.shape[1]} must be >= "
                f"enc_len={self.enc_len} to condition the latent")
        steps = self.rollout_len if length is None else length
        heads = params.heads if parents is None else masked_heads(params.heads, parents)
        # Encode the LAST enc_len steps so the latent summarizes the state
        # the continuation starts from (the W_in reference's convention,
        # ``CRVAE.py:108``) — encoding the window head would condition on a
        # stale latent for long contexts.
        mu, logvar = self.encode(params, x_context[:, -self.enc_len:, :])
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape, mu.dtype)
        h0 = jnp.broadcast_to(z, (self.p,) + z.shape)
        x0 = x_context[:, -1, :]
        if noise is None:
            noise = jnp.zeros((x0.shape[0], steps, self.p))
        return self._free_run(params, heads, x0, h0, noise, steps, dtype=dtype)

    # ---------------- causal graph ----------------

    def gc(self, params: CRVAEParams, parents: Optional[jax.Array] = None,
           threshold: bool = True) -> jax.Array:
        """Learned Granger-causal matrix.

        Row i, column j = strength (or presence) of "series j causes series
        i", read as the L2 norm over gate rows of head i's input-weight
        column j (``author_CRVAE.py:300``).
        """
        heads = params.heads if parents is None else masked_heads(params.heads, parents)
        scores = jnp.linalg.norm(heads.w_ih, axis=-2)        # (p, p)
        if threshold:
            return (scores > 0).astype(jnp.int32)
        return scores
