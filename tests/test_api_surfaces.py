"""Exercise exported API surfaces that no pipeline calls directly.

Each of these is a deliberate part of the public API (optax-style prox
transform, reference-parity scalers/penalty values, pluggable writers,
mesh placement helpers) — this file pins their behavior so they cannot
rot into untested exports.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_proximal_sgd_matches_manual_gista_ordering():
    """One optax `proximal_sgd` step == the trainer's manual ordering:
    gradient step first, then column-group soft-threshold on the masked
    leaves only (SURVEY.md §7 hard part #1)."""
    from vae_connexe_tpu.optim import prox_column_groups, proximal_sgd

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"w_ih": jax.random.normal(k1, (4, 12, 5)) * 0.1,
              "other": jax.random.normal(k2, (3, 3))}
    x = jax.random.normal(k3, (4, 5))

    def loss(p):
        return jnp.sum(jnp.einsum("phd,pd->ph", p["w_ih"], x) ** 2) \
            + jnp.sum(p["other"] ** 2)

    # threshold = lr*lam = 0.35 sits inside the post-step column-norm
    # range (~0.28-0.51 for this seed): some columns zero, some survive.
    lr, lam = 0.05, 7.0
    grads = jax.grad(loss)(params)

    tx = proximal_sgd(lr=lr, lam=lam, groups="column",
                      prox_mask={"w_ih": True, "other": False})
    updates, _ = tx.update(grads, tx.init(params), params)
    via_optax = optax.apply_updates(params, updates)

    manual_w = prox_column_groups(
        params["w_ih"] - lr * grads["w_ih"], lam, lr)
    manual_other = params["other"] - lr * grads["other"]

    # atol absorbs the f32 `p + (prox - p)` round-trip on shrunk values.
    np.testing.assert_allclose(via_optax["w_ih"], manual_w, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(via_optax["other"], manual_other, rtol=1e-6, atol=1e-7)
    # The prox actually bit: some column norms must be exactly zero,
    # and some must survive (otherwise the test is vacuous).
    norms = jnp.linalg.norm(via_optax["w_ih"], axis=-2)
    assert bool(jnp.any(norms == 0.0))
    assert bool(jnp.any(norms > 0.0))


def test_proximal_sgd_requires_params():
    from vae_connexe_tpu.optim import proximal_sgd

    tx = proximal_sgd(lr=0.1, lam=0.1)
    state = tx.init({"w": jnp.ones((2, 2))})
    with pytest.raises(ValueError, match="requires params"):
        tx.update({"w": jnp.ones((2, 2))}, state, None)


def test_group_lasso_value_column_groups():
    """Penalty VALUE of the reference's `regularize` (author_CRVAE.py:318-322;
    its phase-1 loop computes this as `nonsmooth` at :535 and never uses it —
    kept here as the reporting surface)."""
    from vae_connexe_tpu.losses import group_lasso_value

    w = jnp.asarray([[[3.0, 0.0], [4.0, 0.0]],
                     [[0.0, 5.0], [0.0, 12.0]]])   # (2 heads, 2 rows, 2 cols)
    # column groups (reduce the row axis): head 0 norms (5, 0), head 1 (0, 13)
    val = group_lasso_value(w, lam=2.0, group_axis=-2)
    np.testing.assert_allclose(val, 2.0 * (5.0 + 0.0 + 0.0 + 13.0), rtol=1e-6)


def test_minmax_scale_matches_reference_formula():
    """utils.minmax_scale == MinMaxScaler at author_CRVAE.py:355-372."""
    from vae_connexe_tpu.utils import minmax_scale

    rng = np.random.default_rng(0)
    data = rng.normal(size=(6, 7, 3)).astype(np.float32) * 4 - 1

    min_val = np.min(np.min(data, axis=0), axis=0)
    shifted = data - min_val
    max_val = np.max(np.max(shifted, axis=0), axis=0)
    ref = shifted / (max_val + 1e-7)

    out = np.asarray(minmax_scale(jnp.asarray(data)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_print_writer(capsys):
    from vae_connexe_tpu.utils import PrintWriter

    w = PrintWriter()
    w.write(7, {"loss": 1.25, "note": "skipped-not-numeric", "kl": jnp.asarray(0.5)})
    w.close()
    outerr = capsys.readouterr()
    assert "[step 7]" in outerr.out
    assert "loss=1.25000" in outerr.out
    assert "kl=0.50000" in outerr.out
    assert "note" not in outerr.out


def test_shard_batch_places_on_dp():
    from vae_connexe_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()          # all (8 virtual) devices on dp
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    sharded = shard_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))
    assert len(sharded.sharding.device_set) == mesh.devices.size
    # Each device holds a (16/dp, 3) shard of the leading axis.
    shard_shape = sharded.sharding.shard_shape(x.shape)
    assert shard_shape == (16 // mesh.devices.shape[0], 3)


def test_enable_nan_debugging_toggles_and_raises():
    from vae_connexe_tpu.utils import enable_nan_debugging

    prev = jax.config.jax_debug_nans
    try:
        enable_nan_debugging(True)
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda v: jnp.log(v))(jnp.asarray(-1.0)).block_until_ready()
        enable_nan_debugging(False)
        assert not jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", prev)
