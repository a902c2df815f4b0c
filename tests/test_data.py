"""Data-layer tests: generators, ground truths, windowing alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.data import (
    arrange_input,
    coupled_henon,
    coupled_henon_truth,
    henon_chain,
    henon_truth,
    lorenz96,
    lorenz96_truth,
    sample_batch,
    sliding_windows,
    var_process,
    var_truth,
)


def test_lorenz96_shape_and_standardization():
    s = lorenz96(jax.random.key(0), p=7, t=500)
    assert s.shape == (500, 7)
    np.testing.assert_allclose(np.asarray(s.mean(0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s.std(0)), 1.0, atol=1e-3)
    assert bool(jnp.isfinite(s).all())


def test_lorenz96_rhs_via_fixed_point_structure():
    """The ODE RHS must match (x_{i+1} − x_{i−2})·x_{i−1} − x_i + F: checked
    through the module-private _rhs on a hand-computed vector."""
    from vae_connexe_tpu.data.lorenz96 import _rhs

    x = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    f = 10.0
    expected = []
    p = 5
    for i in range(p):
        expected.append((x[(i + 1) % p] - x[(i - 2) % p]) * x[(i - 1) % p] - x[i] + f)
    np.testing.assert_allclose(np.asarray(_rhs(x, f)), np.asarray(expected), rtol=1e-6)


def test_lorenz96_truth_circulant():
    gc = np.asarray(lorenz96_truth(6))
    for i in range(6):
        parents = {i, (i - 1) % 6, (i - 2) % 6, (i + 1) % 6}
        assert set(np.flatnonzero(gc[i])) == parents


def test_henon_chain_matches_recursion():
    s = np.asarray(henon_chain(t=50))
    x, y = 0.1, 0.1
    for t in range(50):
        x, y = 1 - 1.4 * x * x + y, 0.3 * x
        # f32 device recursion vs f64 host recursion: tolerance grows with t.
        np.testing.assert_allclose(s[t], [x, y], rtol=2e-3, atol=2e-4)
        x, y = float(s[t, 0]), float(s[t, 1])   # re-sync to device trajectory


def test_henon_truth_chain():
    gc = np.asarray(henon_truth(4))
    assert gc[0].tolist() == [1, 0, 0, 0]
    assert gc[2].tolist() == [0, 1, 1, 0]


def test_henon_dynamics_truth_matches_generator():
    """The corrected truth matrix must match the actual update equations
    (x_{t+1} = 1 - 1.4x² + y depends on x AND y; y_{t+1} = 0.3x depends on
    x only) — the reference's chain matrix mislabels this system
    (author_CRVAE.py:706-719 vs :734-737)."""
    from vae_connexe_tpu.data import henon_dynamics_truth

    gc = np.asarray(henon_dynamics_truth())
    assert gc.tolist() == [[1, 1], [1, 0]]
    # And it differs from the parity (chain) convention in exactly the two
    # cells the reference mislabels.
    chain = np.asarray(henon_truth(2))
    assert (gc != chain).sum() == 2


def test_henon_experiment_reports_both_truths():
    import dataclasses

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("henon_author")
    res = run_experiment(
        "henon_author", run_phase2=False, verbose=False,
        overrides={"t": 300,
                   "phase1": dataclasses.replace(exp.phase1, max_iter=30,
                                                 check_every=10,
                                                 batch_size=16)})
    assert "gc" in res and "gc_dynamics" in res
    assert "gc_dynamics_best_threshold" in res
    assert 0.0 <= res["gc_dynamics"]["auroc"] <= 1.0


def test_coupled_henon_bounded_and_normalized():
    s = coupled_henon(jax.random.key(3), t=800, d=6)
    assert s.shape == (800, 6)
    assert bool(jnp.isfinite(s).all())
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    assert np.asarray(coupled_henon_truth(6)).sum() == 5


def test_var_process_follows_transition():
    a = var_truth(5)
    x = var_process(jax.random.key(4), a, n=3, t=10, noise_scale=0.0)
    # Noiseless: x_t == A x_{t-1} exactly.
    x_np = np.asarray(x)
    np.testing.assert_allclose(x_np[:, 1], x_np[:, 0] @ np.asarray(a).T, rtol=1e-5)


def test_arrange_input_alignment():
    """inputs[n, i] = series[n+i], targets shifted by one — the exact
    reference indexing (``author_CRVAE.py:335-353``)."""
    series = jnp.arange(40, dtype=jnp.float32).reshape(20, 2)
    inp, tgt = arrange_input(series, 5)
    assert inp.shape == (15, 5, 2)
    np.testing.assert_allclose(np.asarray(inp[3, 2]), np.asarray(series[5]))
    np.testing.assert_allclose(np.asarray(tgt[3, 2]), np.asarray(series[6]))
    np.testing.assert_allclose(np.asarray(inp[:, 1:]), np.asarray(tgt[:, :-1]))


def test_sliding_windows():
    series = jnp.arange(24, dtype=jnp.float32).reshape(12, 2)
    w = sliding_windows(series, 5)
    assert w.shape == (8, 5, 2)
    np.testing.assert_allclose(np.asarray(w[3]), np.asarray(series[3:8]))


def test_sample_batch_bounds():
    w = jnp.arange(60, dtype=jnp.float32).reshape(10, 3, 2)
    b = sample_batch(jax.random.key(0), w, 32)
    assert b.shape == (32, 3, 2)
    assert float(b.max()) <= float(w.max())
