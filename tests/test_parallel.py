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


def test_dryrun_multichip_self_provisions_from_one_device():
    """The driver contract: dryrun_multichip(8) must pass even in a process
    that exposes a single device (the axon relay), by re-execing itself with
    an 8-device virtual CPU backend (VERDICT round 1, item 1)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd="/root/repo", capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_make_mesh_guards(eight_devices):
    with pytest.raises(ValueError, match="only 8 available"):
        make_mesh(n_dp=8, n_ep=2, devices=eight_devices)
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(n_ep=3, devices=eight_devices)
    with pytest.raises(ValueError, match="n_ep"):
        make_mesh(n_dp=4, n_ep=0, devices=eight_devices)


def test_seed_sweep_pads_nondivisible_seed_count(eight_devices):
    """5 seeds on a dp=8 mesh: the seed axis is padded to the dp multiple and
    the results sliced back (VERDICT round 1, item 5)."""
    p = 4
    series = lorenz96(jax.random.key(0), p=p, t=200)
    windows, _ = arrange_input(series, 12)
    model = CRVAE(p=p, hidden=8, enc_len=6)
    cfg = Phase1Config(max_iter=10, check_every=5, batch_size=16)
    mesh = make_mesh(n_dp=8, n_ep=1, devices=eight_devices)
    out = sweep_phase1(model, windows, jnp.ones((p, p)), cfg,
                       jnp.arange(5), mesh=mesh)
    assert out["gc_scores"].shape == (5, p, p)
    assert out["mean_loss"].shape == (5,)
    assert bool(jnp.isfinite(out["mean_loss"]).all())


def test_initialize_multihost_single_process():
    """num_processes=1 smoke test for the multi-host wrapper (VERDICT round 1,
    weak item 3) — run in a subprocess so jax.distributed state cannot leak
    into this test process."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from vae_connexe_tpu.parallel.multihost import initialize_multihost\n"
        "n = initialize_multihost(coordinator_address='localhost:12765',\n"
        "                         num_processes=1, process_id=0)\n"
        "assert n == 2, n\n"
        "import jax.numpy as jnp\n"
        "assert float(jnp.ones(4).sum()) == 4.0\n"
        "print('multihost OK', n)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd="/root/repo", capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "multihost OK 2" in proc.stdout
