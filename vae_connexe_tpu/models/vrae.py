"""Plain variational recurrent autoencoder (the reference's ``VRAE.py``).

Reference: ``/root/reference/VRAE.py:11-204`` — configurable cell
(RNN/GRU/LSTM) encoder; a per-timestep cell-loop decoder with a learnable
start token and *stochastic* teacher forcing (each step flips a coin with
probability ``teacher_forcing_ratio`` to feed the ground truth vs the model's
own output, ``VRAE.py:94-100``); configurable output activation; β-VAE loss
(sum-reduced MSE / B + β·KL, ``VRAE.py:142-147``); ``generate``/``sample``
from the prior; exponential / linear teacher-forcing schedules
(``VRAE.py:173-182``).

TPU-first: the decoder's Python time loop becomes one ``lax.scan`` whose
carry threads (h, [c]) and whose per-step Bernoulli draw is a scan input —
one compiled program per sequence length, not T kernel dispatches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from vae_connexe_tpu.ops.gru import GRUParams, gru_cell, gru_scan, init_gru
from vae_connexe_tpu.ops.rnn_cells import (
    LSTMCellParams,
    RNNCellParams,
    init_lstm_cell,
    init_rnn_cell,
    lstm_cell,
    lstm_scan,
    rnn_cell,
    rnn_scan,
)
from vae_connexe_tpu.utils.layers import Dense, dense, init_dense


@struct.dataclass
class VRAEParams:
    enc_rnn: GRUParams | LSTMCellParams | RNNCellParams
    fc_mu: Dense
    fc_logvar: Dense
    z2h: Dense
    dec_cell: GRUParams | LSTMCellParams | RNNCellParams
    fc_out: Dense
    start_token: jax.Array   # (1, D)


_ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "none": lambda x: x,
}


class VRAE:
    def __init__(self, input_dim: int, hidden_dim: int = 64, latent_dim: int = 2,
                 rnn_type: str = "gru", output_activation: str = "sigmoid"):
        if rnn_type not in ("rnn", "gru", "lstm"):
            raise ValueError(f"unknown rnn_type {rnn_type!r}")
        self.d = input_dim
        self.hidden = hidden_dim
        self.latent = latent_dim
        self.rnn_type = rnn_type
        self.act = _ACTIVATIONS[output_activation]

    def init(self, key: jax.Array) -> VRAEParams:
        ks = jax.random.split(key, 7)
        init_cell = {"rnn": init_rnn_cell, "gru": init_gru, "lstm": init_lstm_cell}[self.rnn_type]
        return VRAEParams(
            enc_rnn=init_cell(ks[0], self.d, self.hidden),
            fc_mu=init_dense(ks[1], self.hidden, self.latent),
            fc_logvar=init_dense(ks[2], self.hidden, self.latent),
            z2h=init_dense(ks[3], self.latent, self.hidden),
            dec_cell=init_cell(ks[4], self.d, self.hidden),
            fc_out=init_dense(ks[5], self.hidden, self.d),
            start_token=jax.random.normal(ks[6], (1, self.d)),
        )

    # ---------------- encoder ----------------

    def encode(self, params: VRAEParams, x: jax.Array):
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), x.dtype)
        if self.rnn_type == "lstm":
            _, (h_t, _) = lstm_scan(params.enc_rnn, x, (h0, jnp.zeros_like(h0)))
        elif self.rnn_type == "gru":
            _, h_t = gru_scan(params.enc_rnn, x, h0)
        else:
            _, h_t = rnn_scan(params.enc_rnn, x, h0)
        return dense(params.fc_mu, h_t), dense(params.fc_logvar, h_t)

    @staticmethod
    def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
        return mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape, mu.dtype)

    # ---------------- decoder ----------------

    def _cell(self, params: VRAEParams, x_in, state):
        if self.rnn_type == "lstm":
            return lstm_cell(params.dec_cell, x_in, state)
        if self.rnn_type == "gru":
            return gru_cell(params.dec_cell, x_in, state), None
        return rnn_cell(params.dec_cell, x_in, state), None

    def decode(self, params: VRAEParams, z: jax.Array, seq_len: int,
               key: jax.Array, target: Optional[jax.Array] = None,
               teacher_forcing_ratio: float = 1.0) -> jax.Array:
        """Autoregressive decode with per-step stochastic teacher forcing.

        With a target, step 0 consumes ``target[:, 0]`` (``VRAE.py:80-81``);
        later steps consume the next target frame with probability
        ``teacher_forcing_ratio`` (one shared coin per step, as the
        reference's single ``torch.rand(1)``), else the model's own output.
        """
        b = z.shape[0]
        h = jnp.tanh(dense(params.z2h, z))
        state = (h, jnp.zeros_like(h)) if self.rnn_type == "lstm" else h

        start = jnp.broadcast_to(params.start_token, (b, self.d))
        if target is None:
            x0 = start
        else:
            # traced-safe version of "target[:, 0] if ratio > 0 else token"
            x0 = jnp.where(jnp.asarray(teacher_forcing_ratio) > 0,
                           target[:, 0, :], start)

        coins = jax.random.uniform(key, (seq_len,)) < teacher_forcing_ratio
        if target is None:
            target_feed = jnp.zeros((seq_len, b, self.d), z.dtype)
            coins = jnp.zeros((seq_len,), bool)
        else:
            # next-frame feed for step t is target[:, t+1]; last step unused.
            target_feed = jnp.swapaxes(
                jnp.concatenate([target[:, 1:, :], target[:, -1:, :]], axis=1), 0, 1)

        def step(carry, inputs):
            x_in, st = carry
            tf_frame, coin = inputs
            if self.rnn_type == "lstm":
                h_new, c_new = self._cell(params, x_in, st)
                st_new = (h_new, c_new)
            else:
                h_new, _ = self._cell(params, x_in, st)
                st_new = h_new
            x_t = self.act(dense(params.fc_out, h_new))
            x_next = jnp.where(coin, tf_frame, x_t)
            return (x_next, st_new), x_t

        _, outs = jax.lax.scan(step, (x0, state), (target_feed, coins))
        return jnp.swapaxes(outs, 0, 1)

    # ---------------- public API ----------------

    def forward(self, params: VRAEParams, x: jax.Array, key: jax.Array,
                teacher_forcing_ratio: float = 1.0):
        k_z, k_tf = jax.random.split(key)
        mu, logvar = self.encode(params, x)
        z = self.reparameterize(k_z, mu, logvar)
        recon = self.decode(params, z, x.shape[1], k_tf, target=x,
                            teacher_forcing_ratio=teacher_forcing_ratio)
        return recon, mu, logvar

    def generate(self, params: VRAEParams, z: jax.Array, seq_len: int) -> jax.Array:
        """Decode latent codes with no teacher forcing."""
        return self.decode(params, z, seq_len, jax.random.key(0), target=None,
                           teacher_forcing_ratio=0.0)

    def sample(self, params: VRAEParams, key: jax.Array, batch: int,
               seq_len: int) -> jax.Array:
        """Sample sequences from the N(0, I) prior."""
        z = jax.random.normal(key, (batch, self.latent))
        return self.generate(params, z, seq_len)

    @staticmethod
    def loss(recon: jax.Array, x: jax.Array, mu: jax.Array, logvar: jax.Array,
             beta: float = 1.0):
        """β-VAE loss, sum-reduced and normalized by batch (``VRAE.py:142-147``)."""
        b = x.shape[0]
        rec = jnp.sum((recon - x) ** 2) / b
        kld = -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar)) / b
        return rec + beta * kld, rec, kld


def exponential_teacher_forcing_schedule(epoch: int, initial_ratio: float = 1.0,
                                         decay_rate: float = 0.05) -> float:
    return initial_ratio * (1.0 - decay_rate) ** epoch


def linear_teacher_forcing_schedule(epoch: int, initial_ratio: float = 1.0,
                                    final_ratio: float = 0.0,
                                    total_epochs: int = 100) -> float:
    return initial_ratio - (initial_ratio - final_ratio) * (epoch / total_epochs)
