"""Multi-device tests on the 8-way virtual CPU mesh.

The sharded train step must be numerically identical to the single-device
step (same math, different layout), and the seed sweep must run vmapped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.data import arrange_input, lorenz96
from vae_connexe_tpu.models import CRVAE
from vae_connexe_tpu.parallel import make_mesh, sweep_phase1
from vae_connexe_tpu.parallel.sharded import make_sharded_phase1_step
from vae_connexe_tpu.train import Phase1Config


@pytest.fixture(scope="module")
def setup():
    p = 4
    model = CRVAE(p=p, hidden=16, enc_len=6)
    params = model.init(jax.random.key(0))
    cfg = Phase1Config(lam=0.1, lr=5e-2, batch_size=32)
    parents = jnp.ones((p, p), jnp.float32)
    batch = jax.random.normal(jax.random.key(1), (32, 12, p))
    return model, params, cfg, parents, batch


def _reference_step(model, cfg, params, batch, key, parents):
    from vae_connexe_tpu.train.crvae_trainer import _crvae_loss, _project_and_prox

    def loss_fn(prms):
        loss, aux = _crvae_loss(model, cfg, prms, None, batch, key, parents, cfg.beta)
        return loss

    grads = jax.grad(loss_fn)(params)
    params = jax.tree.map(lambda p, g: p - cfg.lr * g, params, grads)
    return _project_and_prox(params, parents, cfg.lam, cfg.lr)


def test_sharded_step_matches_single_device(setup, eight_devices):
    model, params, cfg, parents, batch = setup
    mesh = make_mesh(n_dp=4, n_ep=2, devices=eight_devices)
    step, param_shard, batch_shard = make_sharded_phase1_step(model, cfg, mesh, parents)

    key = jax.random.key(2)
    sharded_params = jax.device_put(params, param_shard)
    sharded_batch = jax.device_put(batch, batch_shard)
    new_sharded, metrics = step(sharded_params, sharded_batch, key)
    expected = _reference_step(model, cfg, params, batch, key, parents)

    for got, want in zip(jax.tree.leaves(new_sharded), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-6)
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_step_dp_only(setup, eight_devices):
    model, params, cfg, parents, batch = setup
    mesh = make_mesh(n_dp=8, n_ep=1, devices=eight_devices)
    step, param_shard, batch_shard = make_sharded_phase1_step(model, cfg, mesh, parents)
    new_params, metrics = step(jax.device_put(params, param_shard),
                               jax.device_put(batch, batch_shard),
                               jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))


def test_seed_sweep_vmapped(eight_devices):
    p = 4
    series = lorenz96(jax.random.key(0), p=p, t=300)
    windows, _ = arrange_input(series, 12)
    model = CRVAE(p=p, hidden=8, enc_len=6)
    cfg = Phase1Config(max_iter=20, check_every=10, batch_size=16)
    mesh = make_mesh(n_dp=8, n_ep=1, devices=eight_devices)
    seeds = jnp.arange(8)
    out = sweep_phase1(model, windows, jnp.ones((p, p)), cfg, seeds, mesh=mesh)
    assert out["gc_scores"].shape == (8, p, p)
    assert bool(jnp.isfinite(out["mean_loss"]).all())
    # Different seeds -> different learned scores.
    assert not np.allclose(np.asarray(out["gc_scores"][0]),
                           np.asarray(out["gc_scores"][1]))


def test_graft_entry_contract(eight_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (256, 10, 10)
    g.dryrun_multichip(8)
