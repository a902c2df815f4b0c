"""GC-metric tests, including AUROC parity with sklearn."""

import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.evals import (
    auroc,
    gc_accuracy,
    gc_metrics,
    precision_recall_f1,
    threshold_sweep,
    variable_usage,
)


def test_accuracy_and_usage():
    truth = jnp.array([[1, 0], [1, 1]])
    est = jnp.array([[1, 1], [0, 1]])
    assert float(gc_accuracy(truth, est)) == pytest.approx(0.5)
    assert float(variable_usage(est)) == pytest.approx(0.75)


def test_precision_recall_f1_hand_case():
    truth = jnp.array([[1, 0, 0], [1, 1, 0], [0, 0, 1]])
    est = jnp.array([[1, 1, 0], [1, 0, 0], [0, 0, 1]])
    p, r, f1 = precision_recall_f1(truth, est)
    assert float(p) == pytest.approx(3 / 4)
    assert float(r) == pytest.approx(3 / 4)
    assert float(f1) == pytest.approx(3 / 4)


def test_precision_zero_when_no_predictions():
    truth = jnp.array([[1, 0], [0, 1]])
    est = jnp.zeros((2, 2), jnp.int32)
    p, r, f1 = precision_recall_f1(truth, est)
    assert float(p) == 0.0 and float(r) == 0.0 and float(f1) == 0.0


def test_auroc_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    truth = (rng.uniform(size=(8, 8)) > 0.6).astype(int)
    truth[0, 0] = 1
    truth[1, 1] = 0
    scores = rng.uniform(size=(8, 8)) + 0.5 * truth
    expected = sklearn_metrics.roc_auc_score(truth.reshape(-1), scores.reshape(-1))
    got = float(auroc(jnp.asarray(truth), jnp.asarray(scores)))
    assert got == pytest.approx(expected, abs=1e-6)


def test_auroc_with_ties_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    truth = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 0]])
    scores = np.array([[0.5, 0.5, 0.9], [0.1, 0.5, 0.1], [0.9, 0.2, 0.5]])
    expected = sklearn_metrics.roc_auc_score(truth.reshape(-1), scores.reshape(-1))
    got = float(auroc(jnp.asarray(truth), jnp.asarray(scores)))
    assert got == pytest.approx(expected, abs=1e-6)


def test_auroc_excluding_diagonal():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(1)
    truth = (rng.uniform(size=(6, 6)) > 0.5).astype(int)
    np.fill_diagonal(truth, 1)
    scores = rng.uniform(size=(6, 6))
    mask = ~np.eye(6, dtype=bool)
    expected = sklearn_metrics.roc_auc_score(truth[mask], scores[mask])
    got = float(auroc(jnp.asarray(truth), jnp.asarray(scores), exclude_diagonal=True))
    assert got == pytest.approx(expected, abs=1e-6)


def test_auroc_degenerate_single_class():
    truth = jnp.ones((3, 3), jnp.int32)
    scores = jnp.ones((3, 3))
    assert np.isnan(float(auroc(truth, scores)))


def test_threshold_sweep_shapes_and_monotone_sparsity():
    truth = jnp.eye(4, dtype=jnp.int32)
    scores = jnp.asarray(np.random.default_rng(2).uniform(size=(4, 4)))
    thrs = jnp.array([0.0, 0.3, 0.6, 0.9, 1.1])
    acc, sparsity = threshold_sweep(truth, scores, thrs)
    assert acc.shape == (5,) and sparsity.shape == (5,)
    assert bool(jnp.all(jnp.diff(sparsity) >= 0))   # higher thr, sparser
    assert float(sparsity[-1]) == 1.0


def test_gc_metrics_summary_keys():
    truth = jnp.eye(5, dtype=jnp.int32)
    scores = jnp.eye(5) * 0.8 + 0.01
    m = gc_metrics(truth, scores, threshold=0.1)
    assert set(m) == {"accuracy", "precision", "recall", "f1", "auroc",
                      "auroc_offdiag", "variable_usage", "true_usage"}
    assert float(m["accuracy"]) == 1.0
    assert float(m["auroc"]) == 1.0


def test_auto_threshold_log_gap():
    from vae_connexe_tpu.evals import auto_threshold

    # Bimodal scores: pruned ~0 vs edges O(1); within-edge gaps larger in
    # absolute terms than the floor..edge gap would be in linear space.
    scores = jnp.array([[0.0, 1e-7, 0.5], [2.5, 0.0, 0.4], [1e-9, 0.3, 9.0]])
    thr = float(auto_threshold(scores))
    est = np.asarray(scores) > thr
    expected = np.asarray(scores) > 0.1
    np.testing.assert_array_equal(est, expected)


def test_auto_threshold_exclude_diagonal():
    from vae_connexe_tpu.evals import auto_threshold

    # Huge self-edges must not shift the boundary when excluded.
    scores = jnp.eye(4) * 100.0 + jnp.array(
        [[0, 0.5, 0, 0], [0, 0, 0.4, 0], [0, 0, 0, 0.6], [0.3, 0, 0, 0]])
    thr = float(auto_threshold(scores, exclude_diagonal=True))
    off = ~np.eye(4, dtype=bool)
    est = np.asarray(scores)[off] > thr
    expected = np.asarray(scores)[off] > 0.1
    np.testing.assert_array_equal(est, expected)


def test_stability_selection_filters_unstable_edges():
    """Edges that only cross the per-seed auto threshold in a minority of
    seeds are voted out; consistently-selected edges stay."""
    from vae_connexe_tpu.evals import stability_selection

    rng = np.random.default_rng(0)
    truth = np.array([[1, 1, 0], [0, 1, 0], [0, 1, 1]])
    stacks = []
    for s in range(8):
        scores = truth * (1.0 + 0.1 * rng.standard_normal((3, 3))) \
            + (1 - truth) * 0.01 * rng.random((3, 3))
        if s < 3:   # a minority of seeds inflates one spurious edge
            scores[0, 2] = 0.9
        stacks.append(np.abs(scores))
    votes, selected, _ = stability_selection(jnp.asarray(np.stack(stacks)))
    assert selected.tolist() == truth.tolist()
    # The spurious edge collected some votes but stays below the majority.
    assert 0.0 < float(votes[0, 2]) < 0.5


def test_auto_vote_threshold_gap_rule():
    """min_frac='auto' lands in the largest vote gap, clamped to
    [0.5, 0.95]; stability_selection('auto') then keeps only the
    persistent edges even when a majority rule would over-select."""
    from vae_connexe_tpu.evals import stability_selection
    from vae_connexe_tpu.evals.gc_metrics import auto_vote_threshold

    # True edges vote 1.0; seed-specific over-selections scatter at
    # 0.5-0.625 (above a 0.5 majority) — the var_crvae failure shape.
    votes = jnp.asarray([[1.0, 1.0, 0.375],
                         [0.0, 1.0, 0.5],
                         [0.125, 0.25, 1.0]])
    thr = auto_vote_threshold(votes, exclude_diagonal=True)
    assert 0.5 < thr < 1.0
    # Degenerate spectra clamp to the stable range.
    assert auto_vote_threshold(jnp.asarray([0.5, 0.5])) == 0.5
    assert auto_vote_threshold(jnp.asarray([0.0, 1.0])) == 0.5
    assert abs(auto_vote_threshold(jnp.asarray([0.9, 1.0])) - 0.95) < 1e-6

    stack = jnp.stack([jnp.asarray([[1.0, 1.0], [0.0, 1.0]])] * 6
                      + [jnp.asarray([[1.0, 0.0], [1.0, 1.0]])] * 2)
    _, sel, frac = stability_selection(stack, min_frac="auto")
    assert 0.5 <= frac <= 0.95
    assert sel.tolist() == [[1, 1], [0, 1]]
