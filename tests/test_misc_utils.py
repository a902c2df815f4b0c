"""Tests for TimeGAN-surface utils, debug helpers, and trainer callbacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.data import batch_generator, extract_time, train_test_divide


def _seqs(n, t, d, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=(t, d)) for _ in range(n)]


def test_train_test_divide_partitions():
    ori = _seqs(10, 5, 2)
    gen = _seqs(8, 5, 2, seed=1)
    ot, gt = [5] * 10, [5] * 8
    (tr_x, tr_xh, te_x, te_xh, tr_t, tr_th, te_t, te_th) = train_test_divide(
        ori, gen, ot, gt, train_rate=0.8, seed=0)
    assert len(tr_x) == 8 and len(te_x) == 2
    assert len(tr_xh) == 6 and len(te_xh) == 2
    assert len(tr_t) == 8 and len(te_th) == 2


def test_extract_time():
    data = [np.zeros((3, 2)), np.zeros((7, 2)), np.zeros((5, 2))]
    times, max_len = extract_time(data)
    assert times == [3, 7, 5] and max_len == 7


def test_batch_generator():
    data = _seqs(20, 4, 3)
    times = [4] * 20
    xb, tb = batch_generator(data, times, batch_size=6, seed=0)
    assert len(xb) == 6 and len(tb) == 6


def test_nan_debugging_context():
    from vae_connexe_tpu.utils import nan_debugging

    with nan_debugging():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()
    # Restored afterwards: no raise.
    out = jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0))
    assert np.isnan(float(out))


def test_phase1_callback_fires_per_chunk():
    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.train import Phase1Config, fit_phase1

    p = 4
    X, _ = arrange_input(lorenz96(jax.random.key(0), p=p, t=200), 14)
    model = CRVAE(p=p, hidden=8, enc_len=7)
    cfg = Phase1Config(max_iter=40, check_every=10, batch_size=16)
    calls = []
    fit_phase1(model, model.init(jax.random.key(1)), X, jnp.ones((p, p)), cfg,
               jax.random.key(2),
               callback=lambda step, state, m: calls.append((step, m["loss"])))
    assert [s for s, _ in calls] == [10, 20, 30, 40]
    assert all(np.isfinite(v) for _, v in calls)
