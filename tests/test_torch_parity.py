"""Numerical parity against PyTorch golden outputs.

The reference's compute path is torch ``nn.GRU``/``nn.LSTM``/``nn.RNN``;
these tests copy torch-initialized weights into our parameter structs and
require forward agreement to f32 tolerance (SURVEY.md §4 "numerical parity
tests against golden outputs").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vae_connexe_tpu.ops import (  # noqa: E402
    GRUParams,
    LSTMCellParams,
    RNNCellParams,
    gru_scan,
    gru_scan_heads,
    lstm_scan,
    rnn_scan,
)


def _np(t):
    return t.detach().numpy()


def test_gru_scan_matches_torch():
    torch.manual_seed(0)
    b, t, d, h = 4, 9, 5, 12
    m = torch.nn.GRU(d, h, batch_first=True)
    x = torch.randn(b, t, d)
    h0 = torch.randn(1, b, h)
    out_t, ht_t = m(x, h0)

    params = GRUParams(w_ih=jnp.asarray(_np(m.weight_ih_l0)),
                       w_hh=jnp.asarray(_np(m.weight_hh_l0)),
                       b_ih=jnp.asarray(_np(m.bias_ih_l0)),
                       b_hh=jnp.asarray(_np(m.bias_hh_l0)))
    out_j, ht_j = gru_scan(params, jnp.asarray(_np(x)), jnp.asarray(_np(h0[0])))
    np.testing.assert_allclose(np.asarray(out_j), _np(out_t), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ht_j), _np(ht_t[0]), atol=2e-6)


def test_stacked_heads_match_per_head_torch():
    """gru_scan_heads on stacked params == p independent torch GRUs."""
    torch.manual_seed(1)
    p, b, t, d, h = 3, 4, 7, 6, 8
    grus = [torch.nn.GRU(d, h, batch_first=True) for _ in range(p)]
    x = torch.randn(b, t, d)
    h0 = torch.randn(b, h)

    params = GRUParams(
        w_ih=jnp.stack([jnp.asarray(_np(g.weight_ih_l0)) for g in grus]),
        w_hh=jnp.stack([jnp.asarray(_np(g.weight_hh_l0)) for g in grus]),
        b_ih=jnp.stack([jnp.asarray(_np(g.bias_ih_l0)) for g in grus]),
        b_hh=jnp.stack([jnp.asarray(_np(g.bias_hh_l0)) for g in grus]),
    )
    h0_j = jnp.broadcast_to(jnp.asarray(_np(h0)), (p, b, h))
    outs, hts = gru_scan_heads(params, jnp.asarray(_np(x)), h0_j)
    for i, g in enumerate(grus):
        out_t, ht_t = g(x, h0[None])
        np.testing.assert_allclose(np.asarray(outs[i]), _np(out_t), atol=2e-6)
        np.testing.assert_allclose(np.asarray(hts[i]), _np(ht_t[0]), atol=2e-6)


def test_lstm_scan_matches_torch():
    torch.manual_seed(2)
    b, t, d, h = 3, 6, 4, 10
    m = torch.nn.LSTM(d, h, batch_first=True)
    x = torch.randn(b, t, d)
    out_t, (ht_t, ct_t) = m(x)

    params = LSTMCellParams(w_ih=jnp.asarray(_np(m.weight_ih_l0)),
                            w_hh=jnp.asarray(_np(m.weight_hh_l0)),
                            b_ih=jnp.asarray(_np(m.bias_ih_l0)),
                            b_hh=jnp.asarray(_np(m.bias_hh_l0)))
    z = jnp.zeros((b, h))
    out_j, (ht_j, ct_j) = lstm_scan(params, jnp.asarray(_np(x)), (z, z))
    np.testing.assert_allclose(np.asarray(out_j), _np(out_t), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ct_j), _np(ct_t[0]), atol=2e-6)


def test_rnn_scan_matches_torch():
    torch.manual_seed(3)
    b, t, d, h = 3, 6, 4, 10
    m = torch.nn.RNN(d, h, batch_first=True)
    x = torch.randn(b, t, d)
    out_t, ht_t = m(x)

    params = RNNCellParams(w_ih=jnp.asarray(_np(m.weight_ih_l0)),
                           w_hh=jnp.asarray(_np(m.weight_hh_l0)),
                           b_ih=jnp.asarray(_np(m.bias_ih_l0)),
                           b_hh=jnp.asarray(_np(m.bias_hh_l0)))
    out_j, ht_j = rnn_scan(params, jnp.asarray(_np(x)), jnp.zeros((b, h)))
    np.testing.assert_allclose(np.asarray(out_j), _np(out_t), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ht_j), _np(ht_t[0]), atol=2e-6)


def test_masked_columns_equal_gathered_inputs():
    """The static-shape masking design: a GRU whose input-weight columns are
    zeroed at non-parents equals a torch GRU over the gathered parent
    subset — the equivalence that replaces the reference's np.where gather
    (``author_CRVAE.py:118``) and phase-2 re-instantiation."""
    torch.manual_seed(4)
    b, t, p, h = 5, 8, 6, 9
    mask = np.array([1, 0, 1, 1, 0, 1], dtype=np.float32)
    idx = np.flatnonzero(mask)

    small = torch.nn.GRU(len(idx), h, batch_first=True)   # gathered reference
    x = torch.randn(b, t, p)
    out_t, _ = small(x[:, :, idx])

    # Full-width weights: parent columns copied, others arbitrary-but-masked.
    w_full = np.zeros((3 * h, p), dtype=np.float32)
    w_full[:, idx] = _np(small.weight_ih_l0)
    w_full[:, mask == 0] = 123.0    # garbage that the mask must kill
    params = GRUParams(w_ih=jnp.asarray(w_full) * jnp.asarray(mask)[None, :],
                       w_hh=jnp.asarray(_np(small.weight_hh_l0)),
                       b_ih=jnp.asarray(_np(small.bias_ih_l0)),
                       b_hh=jnp.asarray(_np(small.bias_hh_l0)))
    out_j, _ = gru_scan(params, jnp.asarray(_np(x)), jnp.zeros((b, h)))
    np.testing.assert_allclose(np.asarray(out_j), _np(out_t), atol=2e-6)
