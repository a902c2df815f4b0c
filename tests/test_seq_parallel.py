"""Sequence-parallel recurrence ≡ the single-device recurrence.

The sp pipeline (`parallel/seq_parallel.py`) must return bitwise-comparable
outputs and gradients to ``ops.gru.gru_scan_heads`` — the sharding is a
schedule, not a numerical change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vae_connexe_tpu.ops.gru import gru_scan_heads, init_stacked_gru
from vae_connexe_tpu.parallel.seq_parallel import (seq_sharded_gru,
                                                   seq_sharded_gru_heads)


def _mk(key, p=3, b=8, t=16, d=5, h=7):
    kp, kx, kh = jax.random.split(key, 3)
    params = init_stacked_gru(kp, p, d, h)
    x = jax.random.normal(kx, (b, t, d))
    h0 = jax.random.normal(kh, (p, b, h))
    return params, x, h0


def _sp_mesh(devs, n):
    return Mesh(np.asarray(devs[:n]), axis_names=("sp",))


@pytest.mark.parametrize("n_sp,m", [(1, 1), (2, 2), (4, 4), (4, 2), (8, 4)])
def test_seq_sharded_matches_single_device(eight_devices, n_sp, m):
    params, x, h0 = _mk(jax.random.key(0))
    ref_outs, ref_ht = gru_scan_heads(params, x, h0)
    mesh = _sp_mesh(eight_devices, n_sp)
    outs, h_t = seq_sharded_gru_heads(params, x, h0, mesh, microbatches=m)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(ref_ht),
                               rtol=1e-6, atol=1e-6)


def test_seq_sharded_gradients_match(eight_devices):
    params, x, h0 = _mk(jax.random.key(1), t=12, b=4)
    mesh = _sp_mesh(eight_devices, 4)

    def loss_ref(params, x, h0):
        outs, h_t = gru_scan_heads(params, x, h0)
        return jnp.sum(outs ** 2) + jnp.sum(jnp.sin(h_t))

    def loss_sp(params, x, h0):
        outs, h_t = seq_sharded_gru_heads(params, x, h0, mesh, microbatches=2)
        return jnp.sum(outs ** 2) + jnp.sum(jnp.sin(h_t))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, h0)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(params, x, h0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        g_ref, g_sp)


def test_seq_sharded_unstacked_wrapper(eight_devices):
    from vae_connexe_tpu.ops.gru import gru_scan, init_gru

    params = init_gru(jax.random.key(2), 4, 6)
    x = jax.random.normal(jax.random.key(3), (6, 8, 4))
    h0 = jax.random.normal(jax.random.key(4), (6, 6))
    mesh = _sp_mesh(eight_devices, 2)
    outs, h_t = seq_sharded_gru(params, x, h0, mesh, microbatches=3)
    ref_outs, ref_ht = gru_scan(params, x, h0)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(ref_ht),
                               rtol=1e-6, atol=1e-6)


def test_seq_sharded_divisibility_errors(eight_devices):
    params, x, h0 = _mk(jax.random.key(5), t=10)   # 10 % 4 != 0
    mesh = _sp_mesh(eight_devices, 4)
    with pytest.raises(ValueError, match="not divisible by the 'sp'"):
        seq_sharded_gru_heads(params, x, h0, mesh)
    params, x, h0 = _mk(jax.random.key(6), t=16, b=6)
    with pytest.raises(ValueError, match="microbatches"):
        seq_sharded_gru_heads(params, x, h0, mesh, microbatches=4)


def test_default_microbatches_divide_odd_batch(eight_devices):
    """min(B, S) need not divide B — the default must pick a divisor."""
    mesh = _sp_mesh(eight_devices, 4)
    p, b, t, d, h = 2, 6, 8, 3, 8          # b=6 on sp=4: min(6,4)=4 ∤ 6
    params = init_stacked_gru(jax.random.key(0), p, d, h)
    x = jax.random.normal(jax.random.key(1), (b, t, d))
    h0 = jax.random.normal(jax.random.key(2), (p, b, h))
    o_ref, h_ref = gru_scan_heads(params, x, h0)
    o_sp, h_sp = seq_sharded_gru_heads(params, x, h0, mesh)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_sp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_sp), atol=1e-5)


def test_seq_sharded_batch_axis_composes_with_dp(eight_devices):
    """batch_axis shards the batch over dp while the time axis shards over
    sp — the pipeline runs per dp group on its local slice."""
    params, x, h0 = _mk(jax.random.key(7), b=8, t=16)
    mesh = Mesh(np.asarray(eight_devices).reshape(2, 4),
                axis_names=("dp", "sp"))
    ref_outs, ref_ht = gru_scan_heads(params, x, h0)
    outs, h_t = seq_sharded_gru_heads(params, x, h0, mesh, batch_axis="dp")
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(ref_ht),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# sp as a TRAINING mode: fit_phase1/2(mesh with an sp axis) routes the decode
# recurrence through the pipeline and must equal the single-device fit.
# ---------------------------------------------------------------------------

P_VARS, CTX = 4, 42          # decode length 42 - 10 = 32: divides 1/2/4/8


@pytest.fixture(scope="module")
def fit_setup():
    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE

    series = lorenz96(jax.random.key(0), p=P_VARS, t=300)
    windows, _ = arrange_input(series, CTX)
    model = CRVAE(p=P_VARS, hidden=12)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((P_VARS, P_VARS), jnp.float32)
    return windows, model, params, parents


def _max_diff(a, b):
    return max(jax.tree.leaves(
        jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))


@pytest.mark.parametrize("n_sp", [1, 2, 4, 8])
def test_sp_fit_phase1_matches_single_device(eight_devices, fit_setup, n_sp):
    from vae_connexe_tpu.parallel import make_mesh
    from vae_connexe_tpu.train import Phase1Config, fit_phase1

    windows, model, params, parents = fit_setup
    cfg = Phase1Config(max_iter=8, check_every=4, batch_size=8, lam=0.1)
    key = jax.random.key(2)
    best_ref, state_ref, m_ref = fit_phase1(model, params, windows, parents,
                                            cfg, key)
    mesh = make_mesh(n_dp=1, n_ep=1, n_sp=n_sp)
    best_sp, state_sp, m_sp = fit_phase1(model, params, windows, parents,
                                         cfg, key, mesh=mesh)
    # Same keys, same gathers; the sp pipeline is a schedule, not a
    # numerical change — only reduction-order rounding may differ.
    assert _max_diff(best_ref, best_sp) < 1e-5
    assert _max_diff(state_ref.params, state_sp.params) < 1e-5
    assert abs(m_ref["loss"] - m_sp["loss"]) < 1e-4


def test_sp_fit_phase1_composes_with_dp(eight_devices, fit_setup):
    from vae_connexe_tpu.parallel import make_mesh
    from vae_connexe_tpu.train import Phase1Config, fit_phase1

    windows, model, params, parents = fit_setup
    cfg = Phase1Config(max_iter=6, check_every=3, batch_size=8, lam=0.1)
    key = jax.random.key(3)
    best_ref, _, _ = fit_phase1(model, params, windows, parents, cfg, key)
    mesh = make_mesh(n_dp=2, n_ep=1, n_sp=4)
    best_sp, _, _ = fit_phase1(model, params, windows, parents, cfg, key,
                               mesh=mesh)
    assert _max_diff(best_ref, best_sp) < 1e-5


def test_sp_fit_phase2_matches_single_device(eight_devices, fit_setup):
    from vae_connexe_tpu.models import ErrorVAE
    from vae_connexe_tpu.parallel import make_mesh
    from vae_connexe_tpu.train import Phase2Config, fit_phase2

    windows, model, params, parents = fit_setup
    err_model = ErrorVAE(d=P_VARS, hidden=12)
    err_params = err_model.init(jax.random.key(4))
    cfg = Phase2Config(max_iter=6, check_every=3, batch_size=8)
    key = jax.random.key(5)
    best_ref, err_ref, _, _ = fit_phase2(model, err_model, params, err_params,
                                         windows, parents, cfg, key)
    mesh = make_mesh(n_dp=1, n_ep=1, n_sp=4)
    best_sp, err_sp, _, _ = fit_phase2(model, err_model, params, err_params,
                                       windows, parents, cfg, key, mesh=mesh)
    assert _max_diff(best_ref, best_sp) < 1e-5
    assert _max_diff(err_ref, err_sp) < 1e-5


def test_sp_fit_rejects_bad_meshes(eight_devices, fit_setup):
    from vae_connexe_tpu.parallel import make_mesh
    from vae_connexe_tpu.train import Phase1Config, fit_phase1

    windows, model, params, parents = fit_setup
    cfg = Phase1Config(max_iter=4, check_every=4, batch_size=8, lam=0.1)
    # ep and sp both > 1: unsupported combination, clear error.
    mesh = make_mesh(n_dp=1, n_ep=2, n_sp=4)
    with pytest.raises(ValueError, match="cannot both exceed 1"):
        fit_phase1(model, params, windows, parents, cfg, jax.random.key(0),
                   mesh=mesh)
    # decode length (32) not divisible by... use a context making it odd.
    from vae_connexe_tpu.data import arrange_input, lorenz96
    series = lorenz96(jax.random.key(0), p=P_VARS, t=200)
    win_odd, _ = arrange_input(series, 25)      # decode length 15
    mesh = make_mesh(n_dp=1, n_ep=1, n_sp=4)
    with pytest.raises(ValueError, match="not divisible"):
        fit_phase1(model, params, win_odd, parents, cfg, jax.random.key(0),
                   mesh=mesh)


def test_long_chunk_uses_scan_path(eight_devices):
    """Local chunks beyond UNROLL_MAX_T take the lax.scan body (program-size
    guard) and stay numerically equal to the single-device recurrence."""
    from vae_connexe_tpu.ops.gru import UNROLL_MAX_T

    mesh = _sp_mesh(eight_devices, 2)
    p, b, d, h = 2, 4, 3, 8
    t = 2 * (UNROLL_MAX_T + 4)             # per-device chunk > UNROLL_MAX_T
    params = init_stacked_gru(jax.random.key(0), p, d, h)
    x = jax.random.normal(jax.random.key(1), (b, t, d))
    h0 = jax.random.normal(jax.random.key(2), (p, b, h))
    o_ref, h_ref = gru_scan_heads(params, x, h0)
    o_sp, h_sp = seq_sharded_gru_heads(params, x, h0, mesh)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_sp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_sp), atol=1e-4)


@pytest.fixture
def fused_interpret():
    """Force the fused-kernel dispatch (interpret mode off-TPU) so the sp
    pipeline's per-device compute exercises the Pallas path on CPU."""
    from vae_connexe_tpu.ops import dispatch, pallas_gru

    dispatch.set_fused(True)
    pallas_gru.set_interpret(True)
    yield
    dispatch.set_fused(None)
    pallas_gru.set_interpret(False)


def test_sp_fused_chunks_match_single_device(eight_devices, fused_interpret):
    """The sp pipeline's per-device compute routes through the FUSED Pallas
    recurrence when the dispatch policy picks it (VERDICT round 4 item 3:
    sp's perf story is the longhorizon config, where the single-chip win
    comes from these kernels) — forward parity vs the lax reference."""
    params, x, h0 = _mk(jax.random.key(7), b=8, t=16)
    mesh = _sp_mesh(eight_devices, 4)
    ref_outs, ref_ht = gru_scan_heads(params, x, h0)
    outs, h_t = seq_sharded_gru_heads(params, x, h0, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(ref_ht),
                               rtol=1e-5, atol=1e-5)


def test_sp_fused_chunks_gradients_match(eight_devices, fused_interpret):
    """Fused per-device chunks under shard_map: BACKWARD parity (the custom
    VJP composes with the pipeline's ppermute chain)."""
    params, x, h0 = _mk(jax.random.key(8), t=8, b=4)
    mesh = _sp_mesh(eight_devices, 2)

    def loss_ref(params, x, h0):
        outs, h_t = gru_scan_heads(params, x, h0)
        return jnp.sum(outs ** 2) + jnp.sum(jnp.sin(h_t))

    def loss_sp(params, x, h0):
        outs, h_t = seq_sharded_gru_heads(params, x, h0, mesh, microbatches=2)
        return jnp.sum(outs ** 2) + jnp.sum(jnp.sin(h_t))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, h0)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(params, x, h0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        g_ref, g_sp)


def test_sp_fit_with_fused_chunks_matches_single_device(eight_devices,
                                                        fused_interpret):
    """sp as a TRAINING mode with the fused kernels active per device: a
    longhorizon-shaped fit_phase1 over a (dp, ep=1, sp) mesh equals the
    single-device fit (which routes through the same fused kernels under
    the forced dispatch) — the mode now exercises the kernels it exists
    to scale."""
    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.parallel import make_mesh
    from vae_connexe_tpu.train import Phase1Config, fit_phase1

    p, enc_len, t_dec = 4, 6, 16
    series = lorenz96(jax.random.key(0), p=p, t=200)
    windows, _ = arrange_input(series, enc_len + t_dec)
    model = CRVAE(p=p, hidden=12, enc_len=enc_len)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((p, p), jnp.float32)
    cfg = Phase1Config(max_iter=6, check_every=3, batch_size=8, lam=0.1)
    key = jax.random.key(2)

    mesh = make_mesh(n_dp=2, n_ep=1, n_sp=4)
    best_sp, state_sp, m_sp = fit_phase1(model, params, windows, parents,
                                         cfg, key, mesh=mesh)
    best_1, state_1, m_1 = fit_phase1(model, params, windows, parents,
                                      cfg, key)
    np.testing.assert_allclose(m_sp["loss"], m_1["loss"], rtol=1e-4)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         best_sp, best_1)
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs
