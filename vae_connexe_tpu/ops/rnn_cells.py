"""Elman-RNN and LSTM cells (torch semantics) for the plain VRAE.

The reference's VRAE is cell-configurable (RNN/GRU/LSTM,
``/root/reference/VRAE.py:14-27,47-52``); GRU lives in ``ops.gru``, the other
two here.  torch layouts: LSTM gate row order [i; f; g; o] in (4H, D) /
(4H, H) weights; RNN is tanh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RNNCellParams:
    w_ih: jax.Array   # (H, D)
    w_hh: jax.Array   # (H, H)
    b_ih: jax.Array   # (H,)
    b_hh: jax.Array   # (H,)


@struct.dataclass
class LSTMCellParams:
    w_ih: jax.Array   # (4H, D)
    w_hh: jax.Array   # (4H, H)
    b_ih: jax.Array   # (4H,)
    b_hh: jax.Array   # (4H,)


def _uniform_init(key, shapes, hidden, dtype):
    k = 1.0 / jnp.sqrt(hidden)
    keys = jax.random.split(key, len(shapes))
    return [jax.random.uniform(kk, s, dtype, -k, k) for kk, s in zip(keys, shapes)]


def init_rnn_cell(key: jax.Array, d_in: int, hidden: int, dtype=jnp.float32) -> RNNCellParams:
    w_ih, w_hh, b_ih, b_hh = _uniform_init(
        key, [(hidden, d_in), (hidden, hidden), (hidden,), (hidden,)], hidden, dtype)
    return RNNCellParams(w_ih, w_hh, b_ih, b_hh)


def init_lstm_cell(key: jax.Array, d_in: int, hidden: int, dtype=jnp.float32) -> LSTMCellParams:
    w_ih, w_hh, b_ih, b_hh = _uniform_init(
        key, [(4 * hidden, d_in), (4 * hidden, hidden), (4 * hidden,), (4 * hidden,)],
        hidden, dtype)
    return LSTMCellParams(w_ih, w_hh, b_ih, b_hh)


def rnn_cell(p: RNNCellParams, x_t: jax.Array, h: jax.Array) -> jax.Array:
    return jnp.tanh(x_t @ p.w_ih.T + p.b_ih + h @ p.w_hh.T + p.b_hh)


def lstm_cell(p: LSTMCellParams, x_t: jax.Array, state):
    """state = (h, c) -> (h', c')."""
    h, c = state
    gates = x_t @ p.w_ih.T + p.b_ih + h @ p.w_hh.T + p.b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def rnn_scan(p: RNNCellParams, x: jax.Array, h0: jax.Array):
    """x: (B, T, D) -> (outs (B, T, H), h_T)."""
    xp = x @ p.w_ih.T + p.b_ih

    def step(h, xp_t):
        h_new = jnp.tanh(xp_t + h @ p.w_hh.T + p.b_hh)
        return h_new, h_new

    h_t, outs = jax.lax.scan(step, h0, jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(outs, 0, 1), h_t


def lstm_scan(p: LSTMCellParams, x: jax.Array, state0):
    """x: (B, T, D), state0 = (h0, c0) -> (outs (B, T, H), (h_T, c_T))."""
    xp = x @ p.w_ih.T + p.b_ih

    def step(state, xp_t):
        h, c = state
        gates = xp_t + h @ p.w_hh.T + p.b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c_new = f * c + i * jnp.tanh(g)
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    state_t, outs = jax.lax.scan(step, state0, jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(outs, 0, 1), state_t
