"""Fused Pallas GRU: forward and custom-VJP gradient parity vs the lax path.

Runs in interpreter mode (CPU); the same kernels compile on real TPU (the
benchmarks exercise that path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.ops import gru_scan_heads, init_stacked_gru
from vae_connexe_tpu.ops import pallas_gru


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_gru.set_interpret(True)
    yield
    pallas_gru.set_interpret(False)


@pytest.fixture(scope="module")
def setup():
    p, b, t, d, h = 3, 16, 6, 5, 8
    params = init_stacked_gru(jax.random.key(0), p, d, h)
    x = jax.random.normal(jax.random.key(1), (b, t, d))
    h0 = jax.random.normal(jax.random.key(2), (p, b, h))
    tgt = jax.random.normal(jax.random.key(3), (p, b, t, h))
    return params, x, h0, tgt


def test_forward_parity(setup):
    params, x, h0, _ = setup
    o1, h1 = gru_scan_heads(params, x, h0)
    o2, h2 = pallas_gru.fused_gru_scan_heads(params, x, h0, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)


def test_gradient_parity(setup):
    params, x, h0, tgt = setup

    def loss(fn):
        def f(p_, x_, h_):
            outs, ht = fn(p_, x_, h_)
            return jnp.sum((outs - tgt) ** 2) + jnp.sum(ht * 0.3)
        return f

    g1 = jax.grad(loss(gru_scan_heads), argnums=(0, 1, 2))(params, x, h0)
    g2 = jax.grad(loss(pallas_gru.gru_scan_heads_fused), argnums=(0, 1, 2))(
        params, x, h0)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_gradient_parity_per_head_inputs(setup):
    """The W_in-variant call shape: per-head 4D inputs."""
    params, _, h0, _ = setup
    p, b, t, d, h = 3, 16, 6, 5, 8
    x4 = jax.random.normal(jax.random.key(5), (p, b, t, d))
    tgt = jax.random.normal(jax.random.key(6), (p, b, t, h))

    def loss(fn):
        def f(p_, x_, h_):
            outs, _ht = fn(p_, x_, h_)
            return jnp.mean((outs - tgt) ** 2)
        return f

    g1 = jax.grad(loss(gru_scan_heads), argnums=(0, 1, 2))(params, x4, h0)
    g2 = jax.grad(loss(pallas_gru.gru_scan_heads_fused), argnums=(0, 1, 2))(
        params, x4, h0)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_unrolled_matches_scan_path():
    """UNROLL_MAX_T must not change numerics: long-T (scan) vs short-T
    (unrolled) paths agree on a split sequence."""
    from vae_connexe_tpu.ops import gru_scan
    from vae_connexe_tpu.ops import gru as gru_mod

    params = init_stacked_gru(jax.random.key(0), 1, 4, 8)
    params_1 = jax.tree.map(lambda a: a[0], params)
    x = jax.random.normal(jax.random.key(1), (5, 70, 4))   # 70 > UNROLL_MAX_T
    h0 = jnp.zeros((5, 8))
    outs_scan, ht_scan = gru_scan(params_1, x, h0)          # scan path
    old = gru_mod.UNROLL_MAX_T
    try:
        gru_mod.UNROLL_MAX_T = 128                          # force unroll
        outs_unr, ht_unr = gru_scan(params_1, x, h0)
    finally:
        gru_mod.UNROLL_MAX_T = old
    np.testing.assert_allclose(np.asarray(outs_scan), np.asarray(outs_unr),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ht_scan), np.asarray(ht_unr),
                               atol=1e-5)


def test_multitile_parity(monkeypatch):
    """Force a real (head, batch, time)-tiled grid in interpret mode: the
    default test shapes fit one program, leaving the cross-tile machinery
    (h/dh scratch carries, reverse-time dW accumulation, grid-constant
    pre-broadcast b_hh blocks, batch-tile buffering) uncovered off-TPU."""
    monkeypatch.setattr(pallas_gru, "_VMEM_BUDGET", 220 * 1024)
    p, b, t, d, h = 4, 16, 12, 5, 8
    ph, bt, tt = pallas_gru._pick_tiles(p, b, t, h, d, True, "fwd")
    assert (p // ph) * (b // bt) * (t // tt) > 1, (ph, bt, tt)

    params = init_stacked_gru(jax.random.key(7), p, d, h)
    x = jax.random.normal(jax.random.key(8), (b, t, d))
    h0 = jax.random.normal(jax.random.key(9), (p, b, h))
    tgt = jax.random.normal(jax.random.key(10), (p, b, t, h))

    def loss(fn):
        def f(p_, x_, h_):
            outs, ht = fn(p_, x_, h_)
            return jnp.sum((outs - tgt) ** 2) + jnp.sum(ht * 0.3)
        return f

    o1, h1 = gru_scan_heads(params, x, h0)
    o2, h2 = pallas_gru.fused_gru_scan_heads(params, x, h0, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)

    g1 = jax.grad(loss(gru_scan_heads), argnums=(0, 1, 2))(params, x, h0)
    g2 = jax.grad(loss(pallas_gru.gru_scan_heads_fused), argnums=(0, 1, 2))(
        params, x, h0)
    for a, bb in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-4)


def test_multitile_parity_intra_tile_boundary(monkeypatch):
    """Backward boundary-block mixed regime: a budget giving tt > 1 AND
    n_tt > 1, so within each time tile the reverse loop reads h_prev from
    the in-VMEM outs tile for t > 0 but from the per-tile boundary block
    (previous tile's last output / h0) at t == 0 — both branches of the
    kernel's select live.  test_multitile_parity's budget lands on tt=1
    (boundary-only) and the default shapes on n_tt=1 (in-tile-only)."""
    monkeypatch.setattr(pallas_gru, "_VMEM_BUDGET", 500 * 1024)
    p, b, t, d, h = 4, 16, 12, 5, 8
    ph, bt, tt = pallas_gru._pick_tiles(p, b, t, h, d, True, "bwd")
    assert tt > 1 and t // tt > 1, (ph, bt, tt)

    params = init_stacked_gru(jax.random.key(17), p, d, h)
    x = jax.random.normal(jax.random.key(18), (b, t, d))
    h0 = jax.random.normal(jax.random.key(19), (p, b, h))
    tgt = jax.random.normal(jax.random.key(20), (p, b, t, h))

    def loss(fn):
        def f(p_, x_, h_):
            outs, ht = fn(p_, x_, h_)
            return jnp.sum((outs - tgt) ** 2) + jnp.sum(ht * 0.3)
        return f

    g1 = jax.grad(loss(gru_scan_heads), argnums=(0, 1, 2))(params, x, h0)
    g2 = jax.grad(loss(pallas_gru.gru_scan_heads_fused), argnums=(0, 1, 2))(
        params, x, h0)
    for a, bb in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-4)
