"""Mesh-sharded serving (``parallel/serve.py``).

Pins: samples equal to the single-device call to float roundoff (the
counter-based PRNG makes the random draws sharding-invariant; only the
per-shard matmul reduction order differs, ~1e-7), batch sharding over
every mesh device, bf16 composition, and the divisibility guard.  The
reference has no serving (let alone distributed serving) story —
SURVEY.md §5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.parallel import make_mesh, make_sharded_generator
from vae_connexe_tpu.train import generate_with_compensation


@pytest.fixture(scope="module")
def pair():
    p = 5
    model, err = CRVAE(p=p, hidden=16), ErrorVAE(d=p, hidden=16)
    return (model, err, model.init(jax.random.key(0)),
            err.init(jax.random.key(1)))


def test_matches_single_device(pair):
    """Same key => same draws; the only deviation is per-shard matmul
    reduction order (observed max |Δ| ≈ 6e-8 over the 21-step chain)."""
    model, err, params, eparams = pair
    mesh = make_mesh()                                   # all 8 devices on dp
    gen = make_sharded_generator(model, err, mesh, 32)
    key = jax.random.key(7)
    out = gen(params, eparams, key)
    ref = generate_with_compensation(model, err, params, eparams, key, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_output_sharded_over_all_devices(pair):
    model, err, params, eparams = pair
    mesh = make_mesh(n_dp=4, n_ep=2)
    gen = make_sharded_generator(model, err, mesh, 16)
    out = gen(params, eparams, jax.random.key(0))
    assert out.shape == (16, model.rollout_len, model.p)
    # Every device holds a distinct 16/8 = 2-sample shard of the batch.
    assert len(out.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, model.rollout_len, model.p)}


def test_bf16_composes(pair):
    model, err, params, eparams = pair
    mesh = make_mesh()
    gen16 = make_sharded_generator(model, err, mesh, 64, dtype=jnp.bfloat16)
    out = np.asarray(gen16(params, eparams, jax.random.key(3)))
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    ref = np.asarray(generate_with_compensation(
        model, err, params, eparams, jax.random.key(3), 64))
    assert np.allclose(out.std(), ref.std(), rtol=0.05, atol=0.02)


def test_indivisible_batch_rejected(pair):
    model, err, *_ = pair
    mesh = make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_generator(model, err, mesh, 12)     # 12 % 8 != 0
