"""bf16 serving precision: the generation-path ``dtype`` lever.

The reference has no serving story at all (SURVEY.md §5), and its
generation runs f32 torch on CPU; the TPU serving path exposes an optional
reduced-precision mode (``CRVAE.rollout(dtype=jnp.bfloat16)`` /
``generate_with_compensation(dtype=...)``) that halves the per-step
hidden-state working set bounding the serving batch (``bench.py
pick_serve_batch``).  These tests pin: f32 output contract, distributional
fidelity vs the f32 path, default-path invariance (dtype=None is the exact
float32 program the export-parity tests rely on), and the batch-picker
scaling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.train import generate_with_compensation


@pytest.fixture(scope="module")
def pair():
    p = 6
    model, err = CRVAE(p=p, hidden=32), ErrorVAE(d=p, hidden=32)
    return (model, err, model.init(jax.random.key(0)),
            err.init(jax.random.key(1)))


class TestBf16Rollout:
    def test_output_is_f32_and_finite(self, pair):
        model, _, params, _ = pair
        out = model.rollout(params, jax.random.key(2), 16,
                            dtype=jnp.bfloat16)
        assert out.dtype == jnp.float32
        assert out.shape == (16, model.rollout_len, model.p)
        assert np.isfinite(np.asarray(out)).all()

    def test_close_to_f32_path(self, pair):
        """Same key => same h0 draw; bf16 only perturbs the gate math, so
        the trajectories track the f32 ones to bf16 roundoff accumulated
        over 21 steps."""
        model, _, params, _ = pair
        key = jax.random.key(3)
        f32 = np.asarray(model.rollout(params, key, 64))
        b16 = np.asarray(model.rollout(params, key, 64, dtype=jnp.bfloat16))
        # Elementwise: loose (error compounds along the recurrence)...
        assert np.max(np.abs(f32 - b16)) < 0.15 * (np.abs(f32).max() + 1.0)
        # ...but the sample distribution must match tightly.
        assert np.allclose(f32.mean(axis=(0, 1)), b16.mean(axis=(0, 1)),
                           atol=0.02)
        assert np.allclose(f32.std(axis=(0, 1)), b16.std(axis=(0, 1)),
                           rtol=0.05, atol=0.02)

    def test_conditioned_rollout_dtype(self, pair):
        model, _, params, _ = pair
        ctx = jax.random.normal(jax.random.key(5), (8, model.enc_len, model.p))
        key = jax.random.key(6)
        f32 = np.asarray(model.conditioned_rollout(params, ctx, key))
        b16 = np.asarray(model.conditioned_rollout(params, ctx, key,
                                                   dtype=jnp.bfloat16))
        assert b16.dtype == np.float32
        assert np.allclose(f32.std(), b16.std(), rtol=0.05)

    def test_default_path_unchanged(self, pair):
        """dtype=None must remain the exact float32 program: the export
        parity tests pin bit-identity against it."""
        model, _, params, _ = pair
        key = jax.random.key(7)
        a = np.asarray(model.rollout(params, key, 8))
        b = np.asarray(model.rollout(params, key, 8, dtype=None))
        np.testing.assert_array_equal(a, b)


class TestBf16Compensated:
    def test_errvae_sample_contract(self, pair):
        _, err, _, eparams = pair
        out = err.sample(eparams, jax.random.key(4), 16, 20,
                         dtype=jnp.bfloat16)
        assert out.dtype == jnp.float32
        assert out.shape == (16, 21, err.d)             # length+1 convention
        np.testing.assert_array_equal(np.asarray(out[:, 0]), 0.0)

    def test_generate_with_compensation(self, pair):
        model, err, params, eparams = pair
        key = jax.random.key(8)
        f32 = np.asarray(generate_with_compensation(
            model, err, params, eparams, key, 64))
        b16 = np.asarray(generate_with_compensation(
            model, err, params, eparams, key, 64, dtype=jnp.bfloat16))
        assert b16.dtype == np.float32
        assert np.isfinite(b16).all()
        assert np.allclose(f32.mean(axis=(0, 1)), b16.mean(axis=(0, 1)),
                           atol=0.02)
        assert np.allclose(f32.std(axis=(0, 1)), b16.std(axis=(0, 1)),
                           rtol=0.05, atol=0.02)


class TestServeBatchPicker:
    def test_bf16_doubles_the_batch(self):
        from bench import pick_serve_batch
        f32 = pick_serve_batch(20, 64)
        b16 = pick_serve_batch(20, 64, elem_bytes=2)
        assert f32 == 3072                               # the measured anchor
        assert b16 == 2 * f32

    def test_cap_and_floor(self):
        from bench import pick_serve_batch
        assert pick_serve_batch(1, 8, elem_bytes=2) == 16384   # hi cap
        assert pick_serve_batch(512, 512) == 128               # lo floor
