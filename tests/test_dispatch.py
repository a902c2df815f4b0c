"""Recurrence dispatch: path selection and numerical equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.ops import dispatch, gru_scan, gru_scan_heads, init_gru, init_stacked_gru
from vae_connexe_tpu.ops import pallas_gru
from vae_connexe_tpu.ops.gru import UNROLL_MAX_T


def test_auto_policy():
    # CPU backend in tests: never fused unless forced.
    assert not dispatch.use_fused(10)
    assert not dispatch.use_fused(UNROLL_MAX_T + 1)
    dispatch.set_fused(True)
    try:
        assert dispatch.use_fused(10)
    finally:
        dispatch.set_fused(None)


def test_forced_fused_matches_lax_through_dispatcher():
    """Force the fused path (interpret mode) through heads_recurrence and
    gru_sequence at long T; outputs must match the lax reference."""
    pallas_gru.set_interpret(True)
    dispatch.set_fused(True)
    try:
        params = init_stacked_gru(jax.random.key(0), 2, 3, 8)
        x = jax.random.normal(jax.random.key(1), (4, UNROLL_MAX_T + 6, 3))
        h0 = jnp.zeros((2, 4, 8))
        o_f, h_f = dispatch.heads_recurrence(params, x, h0)
        o_l, h_l = gru_scan_heads(params, x, h0)
        np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_l), atol=1e-5)

        single = init_gru(jax.random.key(2), 3, 8)
        o1, h1 = dispatch.gru_sequence(single, x, jnp.zeros((4, 8)))
        o2, h2 = gru_scan(single, x, jnp.zeros((4, 8)))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    finally:
        dispatch.set_fused(None)
        pallas_gru.set_interpret(False)


def test_model_forward_invariant_to_dispatch_path():
    """CRVAE forward with a long window must be identical on both paths."""
    from vae_connexe_tpu.models import CRVAE

    pallas_gru.set_interpret(True)
    model = CRVAE(p=3, hidden=8, enc_len=6)
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, UNROLL_MAX_T + 10, 3))
    try:
        dispatch.set_fused(True)
        pred_f = model.forward(params, x, jax.random.key(2), deterministic=True)[0]
        dispatch.set_fused(False)
        pred_l = model.forward(params, x, jax.random.key(2), deterministic=True)[0]
    finally:
        dispatch.set_fused(None)
        pallas_gru.set_interpret(False)
    np.testing.assert_allclose(np.asarray(pred_f), np.asarray(pred_l), atol=1e-5)


class TestIncellProjection:
    """In-cell input projection (large pre-projection regime) vs hoisted."""

    def _setup(self):
        params = init_stacked_gru(jax.random.key(3), 5, 7, 16)
        x = jax.random.normal(jax.random.key(4), (4, 12, 7))
        h0 = jnp.zeros((5, 4, 16))
        return params, x, h0

    def test_dispatch_thresholds(self):
        from vae_connexe_tpu.ops import gru as g
        # Reference north-star shape: hoisted.
        assert not g._use_incell_proj(20, 256, 20, 192)
        # xl (p=128) and p=40/h=128 shapes: in-cell.
        assert g._use_incell_proj(128, 64, 40, 192)
        assert g._use_incell_proj(40, 256, 40, 384)

    def test_incell_matches_hoisted_fwd_and_grad(self, monkeypatch):
        from vae_connexe_tpu.ops import gru as g
        params, x, h0 = self._setup()

        def run(variant):
            monkeypatch.setattr(g, "_INCELL_PROJ", variant)
            def loss(p):
                o, hT = gru_scan_heads(p, x, h0)
                return (o ** 2).sum() + (hT ** 2).sum()
            o, hT = gru_scan_heads(params, x, h0)
            return o, hT, jax.grad(loss)(params)

        o1, h1, g1 = run("1")
        o2, h2, g2 = run("0")
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_batched_dispatch_multiplier(self):
        """batched_dispatch(S) scales the in-cell heuristic by the outer
        vmap axis and restores the old multiplier on exit (even on error)."""
        from vae_connexe_tpu.ops import gru as g
        # North-star shape: hoisted alone, but in-cell once an 8-seed vmap
        # multiplies the hoisted pre-projection (the sweep regime).
        assert not g._use_incell_proj(20, 256, 20, 192)
        with g.batched_dispatch(8):
            assert g._use_incell_proj(20, 256, 20, 192)
            with g.batched_dispatch(1):     # nested: inner wins, then restores
                assert not g._use_incell_proj(20, 256, 20, 192)
            assert g._use_incell_proj(20, 256, 20, 192)
        assert not g._use_incell_proj(20, 256, 20, 192)
        try:
            with g.batched_dispatch(8):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert g._DISPATCH_MULTIPLIER == 1

    def test_incell_per_head_input(self, monkeypatch):
        from vae_connexe_tpu.ops import gru as g
        params, _, h0 = self._setup()
        xp = jax.random.normal(jax.random.key(5), (5, 4, 12, 7))
        monkeypatch.setattr(g, "_INCELL_PROJ", "1")
        o1, h1 = gru_scan_heads(params, xp, h0)
        monkeypatch.setattr(g, "_INCELL_PROJ", "0")
        o2, h2 = gru_scan_heads(params, xp, h0)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6, atol=1e-7)


def test_auto_policy_small_batch_many_heads(monkeypatch):
    """Short-T fused dispatch: only in the many-heads/small-batch regime,
    and only on TPU (measured A/B in RESULTS.md)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert dispatch.use_fused(40, n_heads=128, batch=64)      # xl: fused wins
    assert not dispatch.use_fused(40, n_heads=128, batch=256)  # big batch
    assert not dispatch.use_fused(20, n_heads=20, batch=256)   # north star
    assert not dispatch.use_fused(40, n_heads=40, batch=64)    # few heads
    assert dispatch.use_fused(65, n_heads=2, batch=1024)       # long T always


class TestBF16Residuals:
    """bf16 saved-residual storage (VAE_CONNEXE_BF16_RESID): forward stays
    within bf16 rounding of f32, gradients stay finite and close, and the
    flag restores cleanly."""

    def _setup(self):
        params = init_stacked_gru(jax.random.key(7), 5, 7, 16)
        x = jax.random.normal(jax.random.key(8), (4, 12, 7))
        h0 = jnp.zeros((5, 4, 16))
        return params, x, h0

    @pytest.mark.parametrize("incell", ["0", "1"])
    def test_bf16_close_to_f32(self, monkeypatch, incell):
        from vae_connexe_tpu.ops import gru as g
        params, x, h0 = self._setup()
        monkeypatch.setattr(g, "_INCELL_PROJ", incell)

        def run(bf16):
            monkeypatch.setattr(g, "_BF16_RESID", bf16)

            def loss(p):
                o, hT = gru_scan_heads(p, x, h0)
                return (o.astype(jnp.float32) ** 2).sum() + (hT ** 2).sum()

            o, hT = gru_scan_heads(params, x, h0)
            return o.astype(jnp.float32), hT, jax.grad(loss)(params)

        o_f, h_f, g_f = run(False)
        o_b, h_b, g_b = run(True)
        assert h_b.dtype == jnp.float32           # h_T contract stays f32
        # bf16 has ~3 decimal digits; per-step rounding compounds over T=12.
        np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_f),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_f),
                                   rtol=0.05, atol=0.05)
        for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_f)):
            assert np.all(np.isfinite(np.asarray(a)))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.2, atol=0.05)

    def test_set_bf16_resid_toggle(self):
        from vae_connexe_tpu.ops import gru as g
        old = g._BF16_RESID
        try:
            g.set_bf16_resid(True)
            assert g._BF16_RESID
            g.set_bf16_resid(False)
            assert not g._BF16_RESID
        finally:
            g.set_bf16_resid(old)


class TestSegmentRemat:
    """Segment-remat recurrence (k-step checkpoints with in-segment input
    projection) == the hoisted path, fwd + grad, shared and per-head inputs,
    divisible and ragged segment lengths."""

    def _setup(self, per_head: bool):
        params = init_stacked_gru(jax.random.key(5), 6, 5, 16)
        shape = (6, 8, 20, 5) if per_head else (8, 20, 5)
        x = jax.random.normal(jax.random.key(6), shape)
        h0 = jnp.zeros((6, 8, 16))
        return params, x, h0

    @pytest.mark.parametrize("per_head", [False, True])
    @pytest.mark.parametrize("seg", [4, 7, 20])
    def test_matches_hoisted_fwd_and_grad(self, per_head, seg):
        from vae_connexe_tpu.ops import gru as g
        params, x, h0 = self._setup(per_head)

        def loss(p):
            o, hT = gru_scan_heads(p, x, h0)
            return (o ** 2).sum() + (hT * 1.7).sum()

        ref_o, ref_h = gru_scan_heads(params, x, h0)
        ref_g = jax.grad(loss)(params)
        old = g._SEG_REMAT_T
        try:
            g.set_seg_remat(seg)
            o, hT = gru_scan_heads(params, x, h0)
            grads = jax.grad(loss)(params)
        finally:
            g.set_seg_remat(old)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_h),
                                   rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)

    def test_set_seg_remat_toggle(self):
        from vae_connexe_tpu.ops import gru as g
        old = g._SEG_REMAT_T
        try:
            g.set_seg_remat(5)
            assert g._SEG_REMAT_T == 5
            g.set_seg_remat(0)
            assert g._SEG_REMAT_T == 0
        finally:
            g.set_seg_remat(old)
