"""Round-3 eval wiring: auto-threshold floor semantics, the win branch's
prediction-MSE comparison (reference ``CRVAE.py:333-350``), operating-point
rows, and the figure artifacts run_experiment now emits."""

import dataclasses as dc
import json

import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.evals import auto_threshold


def test_auto_threshold_relative_floor_ignores_zero_cluster():
    """Exact zeros + small prox survivors + O(1) edges: the threshold must
    land in the survivors/edges gap, not at the zero boundary (the round-2
    committed win results had auto thresholds of ~0 selecting every
    survivor because the absolute 1e-8 floor made the zero-boundary gap
    unbeatable)."""
    s = jnp.array([0.0, 0.0, 0.0, 0.0, 1e-4, 2e-4, 0.3, 0.5])
    thr = float(auto_threshold(s))
    assert 2e-4 < thr < 0.3


def test_auto_threshold_clean_zero_split_still_works():
    """When prox cleanly zeroes all non-edges, the zero-boundary gap is the
    right split and must still be found."""
    s = jnp.array([0.0, 0.0, 0.0, 0.0, 0.3, 0.5, 0.8, 1.0])
    thr = float(auto_threshold(s))
    assert 0.0 < thr < 0.3


def test_auto_threshold_absolute_floor_override():
    s = jnp.array([0.0, 1e-4, 0.3])
    thr_abs = float(auto_threshold(s, floor=1e-8))
    assert thr_abs < 1e-4          # absolute floor: zero-boundary gap wins


@pytest.fixture(scope="module")
def win_results(tmp_path_factory):
    from vae_connexe_tpu.configs import get_experiment, run_experiment

    out = tmp_path_factory.mktemp("win")
    exp = get_experiment("henon6d_win")
    res = run_experiment(
        "henon6d_win",
        overrides={"t": 400,
                   "win": dc.replace(exp.win, stage1_epochs=8,
                                     stage2_epochs=4)},
        out_dir=str(out), verbose=False)
    return res, out


def test_win_branch_reports_prediction_mse_rows(win_results):
    res, _ = win_results
    pm = res["prediction_mse"]
    assert set(pm) == {"phase1_forward", "phase2_forward_with_compensation",
                       "improvement_pct", "stage1_params_phase1_forward"}
    assert all(np.isfinite(v) for v in pm.values())


def test_win_branch_reports_operating_points(win_results):
    res, _ = win_results
    assert "gc_auto" in res and "gc_offdiag_auto" in res
    best = res["gc_offdiag_best_threshold"]
    assert best["oracle"] is True
    assert 0.0 <= best["f1"] <= 1.0


def test_win_branch_reports_stability_selection(win_results):
    """henon6d_win has stability_seeds=8: the unsupervised multi-seed row
    must be present, with per-edge vote fractions in [0, 1] and finite
    binary metrics at the 0.5 vote threshold."""
    res, _ = win_results
    st = res["gc_stability"]
    assert st["seeds"] == 8 and 0.5 <= st["min_frac"] <= 0.95
    votes = st["votes_offdiag"]
    assert len(votes) == 6 * 5
    assert all(0.0 <= v <= 1.0 for v in votes)
    assert 0.0 <= st["f1"] <= 1.0


def test_win_branch_emits_figures(win_results):
    _, out = win_results
    names = {p.name for p in out.iterdir()}
    assert {"w_in_henon6d_win.png", "w_in_norms_henon6d_win.png",
            "gc_heatmap_henon6d_win.png"} <= names


def test_crvae_branch_emits_gc_heatmaps(tmp_path):
    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    run_experiment(
        "lorenz96_crvae",
        overrides={"p": 4, "t": 300, "context": 12, "hidden": 16,
                   "phase1": dc.replace(exp.phase1, max_iter=20,
                                        check_every=10, batch_size=32)},
        out_dir=str(tmp_path), run_phase2=False, verbose=False)
    names = {p.name for p in tmp_path.iterdir()}
    assert "gc_heatmap_lorenz96_crvae.png" in names
    assert "gc_heatmap_auto_lorenz96_crvae.png" in names
    m = json.loads((tmp_path / "metrics_lorenz96_crvae.json").read_text())
    assert "gc_auto" in m


def test_pick_serve_batch_formula():
    """VMEM-locality serving batch: lane-aligned, clamped, and anchored at
    the measured p=20/H=64 optimum (RESULTS.md round-3 batch sweep)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import pick_serve_batch

    # The measured anchor: formula == the observed throughput peak.
    assert pick_serve_batch(20, 64) == 3072
    # Lane alignment and clamping at awkward shapes.
    assert pick_serve_batch(128, 128) == 128      # tiny fit -> lo clamp
    assert pick_serve_batch(10, 64) % 128 == 0
    assert pick_serve_batch(1, 8) == 16384        # huge fit -> hi clamp
    # bf16 serving halves the per-sample state: the auto batch doubles.
    assert pick_serve_batch(20, 64, elem_bytes=2) == 6144
    # Monotone: bigger state per sample -> smaller batch.
    assert pick_serve_batch(40, 64) <= pick_serve_batch(20, 64)
