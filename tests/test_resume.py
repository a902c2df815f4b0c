"""Mid-phase checkpoint/resume: killed-and-resumed fits ≡ uninterrupted, bitwise.

The reference's only resilience is an in-memory best-model deepcopy
(``/root/reference/author_CRVAE.py:547-561``) — a preempted run restarts from
zero.  ``fit_phase1/2(checkpoint_dir=..., checkpoint_every=N, resume=True)``
snapshot the FULL phase state at chunk boundaries and re-run only the
remaining chunks; because the chunk program is deterministic given its
carried state, the resumed fit must equal the uninterrupted one to the last
ulp — that is what these tests pin, including composed with the (dp, ep)
mesh and the out-of-core streaming path.
"""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.data import arrange_input, lorenz96
from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.train import (
    Phase1Config,
    Phase2Config,
    fit_phase1,
    fit_phase2,
)

P, CTX = 5, 12


class _Kill(Exception):
    """Stands in for SIGKILL: raised from the per-chunk callback after the
    checkpoint for that boundary has been written."""


def _killer(at_step):
    def cb(step, state, metrics):
        if step >= at_step:
            raise _Kill
    return cb


@pytest.fixture(scope="module")
def setup():
    series = lorenz96(jax.random.key(0), p=P, t=300)
    windows, _ = arrange_input(series, CTX)
    model = CRVAE(p=P, hidden=12)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((P, P), jnp.float32)
    return windows, model, params, parents


def _max_diff(a, b):
    return max(jax.tree.leaves(
        jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))


def test_phase1_kill_resume_bitwise(setup, tmp_path):
    windows, model, params, parents = setup
    cfg = Phase1Config(max_iter=24, check_every=4, batch_size=8, lam=0.1)
    key = jax.random.key(2)

    best_u, state_u, m_u = fit_phase1(model, params, windows, parents, cfg, key)

    ck = str(tmp_path / "p1")
    with pytest.raises(_Kill):
        fit_phase1(model, params, windows, parents, cfg, key,
                   checkpoint_dir=ck, checkpoint_every=12,
                   callback=_killer(12))
    best_r, state_r, m_r = fit_phase1(model, params, windows, parents, cfg,
                                      key, checkpoint_dir=ck,
                                      checkpoint_every=12, resume=True)

    assert int(state_r.step) == cfg.max_iter
    assert _max_diff(state_u.params, state_r.params) == 0.0
    assert _max_diff(best_u, best_r) == 0.0
    assert float(state_u.best_loss) == float(state_r.best_loss)
    assert m_u == m_r


def test_phase2_kill_resume_bitwise(setup, tmp_path):
    windows, model, params, parents = setup
    err_model = ErrorVAE(d=P, hidden=12)
    err_params = err_model.init(jax.random.key(3))
    cfg = Phase2Config(max_iter=18, check_every=3, batch_size=8)
    key = jax.random.key(4)

    best_u, err_u, state_u, m_u = fit_phase2(
        model, err_model, params, err_params, windows, parents, cfg, key)

    ck = str(tmp_path / "p2")
    with pytest.raises(_Kill):
        fit_phase2(model, err_model, params, err_params, windows, parents,
                   cfg, key, checkpoint_dir=ck, checkpoint_every=9,
                   callback=_killer(9))
    best_r, err_r, state_r, m_r = fit_phase2(
        model, err_model, params, err_params, windows, parents, cfg, key,
        checkpoint_dir=ck, checkpoint_every=9, resume=True)

    # The snapshot carries the Adam state too — resumed moments must match.
    assert _max_diff(best_u, best_r) == 0.0
    assert _max_diff(err_u, err_r) == 0.0
    assert _max_diff(state_u.err_opt, state_r.err_opt) == 0.0
    assert m_u == m_r


def test_resume_completed_phase_is_pure_restore(setup, tmp_path):
    windows, model, params, parents = setup
    cfg = Phase1Config(max_iter=8, check_every=4, batch_size=8, lam=0.1)
    key = jax.random.key(5)
    ck = str(tmp_path / "done")

    best_a, state_a, m_a = fit_phase1(model, params, windows, parents, cfg,
                                      key, checkpoint_dir=ck)
    calls = []
    best_b, state_b, m_b = fit_phase1(model, params, windows, parents, cfg,
                                      key, checkpoint_dir=ck, resume=True,
                                      callback=lambda *a: calls.append(a))
    assert calls == []          # no chunks re-ran
    assert _max_diff(best_a, best_b) == 0.0
    assert m_a == m_b           # metrics round-trip through the snapshot


def test_resume_rejects_changed_chunking(setup, tmp_path):
    windows, model, params, parents = setup
    cfg = Phase1Config(max_iter=12, check_every=4, batch_size=8, lam=0.1)
    key = jax.random.key(6)
    ck = str(tmp_path / "mis")
    with pytest.raises(_Kill):
        fit_phase1(model, params, windows, parents, cfg, key,
                   checkpoint_dir=ck, checkpoint_every=4,
                   callback=_killer(4))
    import dataclasses
    bad = dataclasses.replace(cfg, check_every=3)
    with pytest.raises(ValueError, match="chunk boundary"):
        fit_phase1(model, params, windows, parents, bad, key,
                   checkpoint_dir=ck, resume=True)


def test_meshed_kill_resume(setup, tmp_path, eight_devices):
    from vae_connexe_tpu.parallel import make_mesh

    windows, model, params, parents = setup
    mesh = make_mesh(n_ep=1)
    cfg = Phase1Config(max_iter=16, check_every=4, batch_size=8, lam=0.1)
    key = jax.random.key(7)

    best_u, state_u, _ = fit_phase1(model, params, windows, parents, cfg,
                                    key, mesh=mesh)
    ck = str(tmp_path / "mesh")
    with pytest.raises(_Kill):
        fit_phase1(model, params, windows, parents, cfg, key, mesh=mesh,
                   checkpoint_dir=ck, checkpoint_every=8,
                   callback=_killer(8))
    best_r, state_r, _ = fit_phase1(model, params, windows, parents, cfg,
                                    key, mesh=mesh, checkpoint_dir=ck,
                                    checkpoint_every=8, resume=True)
    # Same meshed program on both sides of the kill — still bitwise.
    assert _max_diff(best_u, best_r) == 0.0
    assert _max_diff(state_u.params, state_r.params) == 0.0


def test_sp_meshed_kill_resume(tmp_path, eight_devices):
    """Resume composes with sequence parallelism (VERDICT r4 item 7): a fit
    on a (dp=2, sp=4) mesh killed mid-phase and resumed equals the
    uninterrupted sp fit bitwise — same meshed program on both sides of the
    kill, so preempting an sp pod costs only the un-checkpointed chunks."""
    from vae_connexe_tpu.parallel import make_mesh

    ctx = 42                     # decode length 32: divisible by sp=4
    series = lorenz96(jax.random.key(0), p=P, t=300)
    windows, _ = arrange_input(series, ctx)
    model = CRVAE(p=P, hidden=12)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((P, P), jnp.float32)
    mesh = make_mesh(n_dp=2, n_ep=1, n_sp=4)
    cfg = Phase1Config(max_iter=16, check_every=4, batch_size=8, lam=0.1)
    key = jax.random.key(9)

    best_u, state_u, m_u = fit_phase1(model, params, windows, parents, cfg,
                                      key, mesh=mesh)
    ck = str(tmp_path / "sp")
    with pytest.raises(_Kill):
        fit_phase1(model, params, windows, parents, cfg, key, mesh=mesh,
                   checkpoint_dir=ck, checkpoint_every=8,
                   callback=_killer(8))
    best_r, state_r, m_r = fit_phase1(model, params, windows, parents, cfg,
                                      key, mesh=mesh, checkpoint_dir=ck,
                                      checkpoint_every=8, resume=True)
    assert int(state_r.step) == cfg.max_iter
    assert _max_diff(best_u, best_r) == 0.0
    assert _max_diff(state_u.params, state_r.params) == 0.0
    assert m_u == m_r


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_streaming_kill_resume(setup, tmp_path):
    from vae_connexe_tpu.data.native_loader import NativeWindowLoader
    from vae_connexe_tpu.train import fit_phase1_streaming

    _, model, params, parents = setup
    series = lorenz96(jax.random.key(0), p=P, t=300)
    loader = NativeWindowLoader.from_array(np.asarray(series))
    cfg = Phase1Config(max_iter=20, check_every=5, batch_size=8, lam=0.1)
    key = jax.random.key(8)

    best_u, state_u, m_u = fit_phase1_streaming(
        model, params, loader, CTX, parents, cfg, key)
    ck = str(tmp_path / "stream")
    with pytest.raises(_Kill):
        fit_phase1_streaming(model, params, loader, CTX, parents, cfg, key,
                             checkpoint_dir=ck, checkpoint_every=10,
                             callback=_killer(10))
    best_r, state_r, m_r = fit_phase1_streaming(
        model, params, loader, CTX, parents, cfg, key, checkpoint_dir=ck,
        checkpoint_every=10, resume=True)
    # The host key mirror restarts from the restored state key, so the
    # streamed batches — and the fit — are bitwise the uninterrupted run's.
    assert _max_diff(best_u, best_r) == 0.0
    assert _max_diff(state_u.params, state_r.params) == 0.0
    assert m_u == m_r


def test_run_experiment_resume_roundtrip(tmp_path):
    """CLI-level: a completed checkpointed run resumed end-to-end reproduces
    the same results dict (both phase fits become pure restores)."""
    import dataclasses

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    overrides = {
        "t": 256,
        "phase1": dataclasses.replace(exp.phase1, max_iter=8, check_every=4),
        "phase2": dataclasses.replace(exp.phase2, max_iter=8, check_every=4),
    }
    out = str(tmp_path / "run")
    kw = dict(seed=0, out_dir=out, overrides=overrides, verbose=False)
    r1 = run_experiment("lorenz96_crvae", checkpoint_every=4, **kw)
    r2 = run_experiment("lorenz96_crvae", resume=True, **kw)
    assert r1["phase1"] == r2["phase1"]
    assert r1["phase2"] == r2["phase2"]
    assert r1["gc"] == r2["gc"]
