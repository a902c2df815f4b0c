"""Fused serving rollout kernels: parity vs the lax model paths.

Interpreter mode (CPU).  On real TPU these compile and match but measure
SLOWER than the lax paths at serving shapes (see the module docstring of
``ops/pallas_rollout.py``) — the lax paths stay the default; these tests
keep the kernels honest for re-evaluation on other runtimes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.models.crvae import masked_heads
from vae_connexe_tpu.ops.pallas_rollout import (
    crvae_free_run_fused,
    errvae_sample_fused,
)


def test_crvae_rollout_parity():
    p, hidden, b, t = 4, 8, 16, 6
    model = CRVAE(p=p, hidden=hidden, rollout_len=t)
    params = model.init(jax.random.key(0))
    parents = (jax.random.uniform(jax.random.key(9), (p, p)) > 0.3)
    parents = parents.astype(jnp.float32)
    noise = jax.random.normal(jax.random.key(1), (b, t, p))
    key = jax.random.key(2)

    ref = model.rollout(params, key, b, noise=noise, parents=parents)
    heads = masked_heads(params.heads, parents)
    h0 = jax.random.normal(key, (b, hidden))        # rollout's h0 draw
    fused = crvae_free_run_fused(heads, params.readout, jnp.zeros((b, p)),
                                 h0, noise, model.noise_scale,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-6)


def test_crvae_conditioned_start_parity():
    """Nonzero x0 (the conditioned_rollout entry shape)."""
    p, hidden, b, t = 3, 8, 8, 5
    model = CRVAE(p=p, hidden=hidden, rollout_len=t)
    params = model.init(jax.random.key(0))
    x0 = jax.random.normal(jax.random.key(3), (b, p))
    h0 = jax.random.normal(jax.random.key(4), (b, hidden))
    noise = jax.random.normal(jax.random.key(5), (b, t, p))

    h0b = jnp.broadcast_to(h0, (p, b, hidden))
    ref = model._free_run(params, params.heads, x0, h0b, noise)
    fused = crvae_free_run_fused(params.heads, params.readout, x0, h0,
                                 noise, model.noise_scale, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-6)


def test_errvae_sample_parity():
    p, hidden, b, t = 4, 8, 16, 6
    err = ErrorVAE(d=p, hidden=hidden, rollout_len=t)
    eparams = err.init(jax.random.key(3))
    key = jax.random.key(4)

    ref = err.sample(eparams, key, b)
    h0 = jax.random.normal(key, (b, hidden))        # sample's h0 draw
    fused = errvae_sample_fused(eparams.dec, eparams.out, h0, p, t,
                                interpret=True)
    fused = jnp.concatenate([jnp.zeros((b, 1, p)), fused], axis=1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-6)


def test_generate_with_compensation_fused_parity():
    """The adopted latency-serving path (kernel='fused') reproduces the lax
    path exactly: same RNG draws, kernels individually parity-pinned above,
    composition pinned here end to end."""
    from vae_connexe_tpu.train import generate_with_compensation

    p, hidden, b = 4, 8, 8
    model = CRVAE(p=p, hidden=hidden, rollout_len=6)
    err = ErrorVAE(d=p, hidden=hidden, rollout_len=6)
    params = model.init(jax.random.key(0))
    eparams = err.init(jax.random.key(1))
    parents = (jax.random.uniform(jax.random.key(9), (p, p)) > 0.3)
    parents = parents.astype(jnp.float32)
    key = jax.random.key(2)

    ref = generate_with_compensation(model, err, params, eparams, key, b,
                                     parents=parents)
    fused = generate_with_compensation(model, err, params, eparams, key, b,
                                       parents=parents, kernel="fused",
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-6)


def test_generate_with_compensation_fused_rejects_bf16():
    import pytest

    from vae_connexe_tpu.train import generate_with_compensation

    model = CRVAE(p=3, hidden=8, rollout_len=4)
    err = ErrorVAE(d=3, hidden=8, rollout_len=4)
    with pytest.raises(ValueError, match="float32-only"):
        generate_with_compensation(model, err, model.init(jax.random.key(0)),
                                   err.init(jax.random.key(1)),
                                   jax.random.key(2), 4, kernel="fused",
                                   dtype=jnp.bfloat16)


def test_auto_kernel_vmem_gate():
    """'auto' dispatch must not pick the fused chain at shapes whose VMEM
    footprint no batch tile can satisfy (e.g. the xl config p=128, H=128,
    where the per-head weight block alone exceeds the 12 MiB budget) — it
    falls back to the lax path instead of raising, while an explicit
    kernel='fused' still raises loudly."""
    import pytest

    from vae_connexe_tpu.ops.pallas_rollout import fused_chain_fits
    from vae_connexe_tpu.train import generate_with_compensation
    from vae_connexe_tpu.train.crvae_trainer import _fused_serving_fits

    # Flagship shape fits; xl shape does not.
    assert fused_chain_fits(p=20, hidden=64, rollout_len=21,
                            err_hidden=64, err_d=20, batch=8)
    assert not fused_chain_fits(p=128, hidden=128, rollout_len=21,
                                err_hidden=128, err_d=128, batch=8)

    model = CRVAE(p=128, hidden=128, rollout_len=4)
    err = ErrorVAE(d=128, hidden=128, rollout_len=4)
    assert not _fused_serving_fits(model, err, 8)
    params = model.init(jax.random.key(0))
    eparams = err.init(jax.random.key(1))
    # auto (with the interpret platform override) silently takes lax:
    out = generate_with_compensation(model, err, params, eparams,
                                     jax.random.key(2), 8, kernel="auto",
                                     interpret=True)
    assert out.shape == (8, 4, 128)
    # explicit fused raises the informative VMEM error:
    with pytest.raises(ValueError, match="VMEM budget"):
        generate_with_compensation(model, err, params, eparams,
                                   jax.random.key(2), 8, kernel="fused",
                                   interpret=True)
