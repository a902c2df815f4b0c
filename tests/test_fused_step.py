"""Fused phase-1 megakernel (ops/pallas_step.py): parity vs the XLA step.

Interpreter mode (CPU).  The same kernel compiles and matches on real TPU
(verified at the p=20 flagship shape, worst param rel err 8e-7); its
throughput story lives in RESULTS.md "Optimizations evaluated".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE
from vae_connexe_tpu.ops.pallas_step import fused_phase1_step
from vae_connexe_tpu.train import Phase1Config
from vae_connexe_tpu.train.crvae_trainer import Phase1State, make_phase1_step


@pytest.mark.parametrize("masked", [False, True])
def test_fused_step_matches_xla_step(masked):
    p, hidden, e, t, b = 4, 8, 3, 7, 16
    model = CRVAE(p=p, hidden=hidden, enc_len=e)
    params = model.init(jax.random.key(0))
    cfg = Phase1Config(max_iter=1, check_every=1, batch_size=b, lam=0.05,
                       lr=0.03, lam_ridge=0.01, beta=0.1)
    if masked:
        parents = (jax.random.uniform(jax.random.key(9), (p, p)) > 0.4)
        parents = parents.astype(jnp.float32)
    else:
        parents = jnp.ones((p, p))
    batch = jax.random.normal(jax.random.key(1), (b, t, p))

    step = make_phase1_step(model, cfg, batch, parents, fixed_batch=batch)
    key = jax.random.key(42)
    state = Phase1State(params=params, prior=None, best_params=params,
                        best_loss=jnp.array(jnp.inf), key=key,
                        step=jnp.zeros([], jnp.int32))
    new_state, metrics = step(state, None)

    # Reproduce the step's PRNG usage: key -> (key, k_batch, k_z); the
    # reparameterization draw is normal(k_z, mu.shape).
    _, _, k_z = jax.random.split(key, 3)
    eps = jax.random.normal(k_z, (b, hidden))
    fused_params, fmetrics = fused_phase1_step(model, cfg, params, parents,
                                               batch, eps, interpret=True)

    for k in ("loss", "recon", "latent_reg", "mean_loss", "variable_usage"):
        np.testing.assert_allclose(float(metrics[k]), float(fmetrics[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    for va, vb in zip(jax.tree.leaves(new_state.params),
                      jax.tree.leaves(fused_params)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-4, atol=1e-6)


def test_fused_step_multi_iteration_training():
    """Several fused steps in sequence keep tracking the XLA trajectory."""
    p, hidden, e, t, b = 3, 8, 3, 6, 8
    model = CRVAE(p=p, hidden=hidden, enc_len=e)
    params = model.init(jax.random.key(0))
    cfg = Phase1Config(max_iter=1, check_every=1, batch_size=b, lam=0.08,
                       lr=0.05, lam_ridge=0.01, beta=0.1)
    parents = jnp.ones((p, p))
    batch = jax.random.normal(jax.random.key(1), (b, t, p))

    step = make_phase1_step(model, cfg, batch, parents, fixed_batch=batch)
    key = jax.random.key(5)
    state = Phase1State(params=params, prior=None, best_params=params,
                        best_loss=jnp.array(jnp.inf), key=key,
                        step=jnp.zeros([], jnp.int32))
    f_params = params
    losses = []
    for _ in range(5):
        _, _, k_z = jax.random.split(state.key, 3)
        eps = jax.random.normal(k_z, (b, hidden))
        f_params, fmetrics = fused_phase1_step(model, cfg, f_params, parents,
                                               batch, eps, interpret=True)
        state, metrics = step(state, None)
        losses.append(float(fmetrics["loss"]))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(fmetrics["loss"]), rtol=1e-3)
    for va, vb in zip(jax.tree.leaves(state.params), jax.tree.leaves(f_params)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-3, atol=1e-5)
    assert losses[-1] < losses[0]          # it actually trains
