"""Auxiliary-subsystem tests: checkpointing, metric logging, viz, profiling."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_connexe_tpu.models import CRVAE
from vae_connexe_tpu.utils import (
    JsonlWriter,
    StepTimer,
    load_gc,
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip_exact(tmp_path):
    model = CRVAE(p=4, hidden=8)
    params = model.init(jax.random.key(0))
    gc = np.eye(4)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, gc_matrix=gc)
    restored = restore_checkpoint(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(load_gc(path), gc)


def test_checkpoint_resume_continues_training(tmp_path):
    """Save mid-training, restore, and keep stepping — the resume contract."""
    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.train import Phase1Config, fit_phase1

    p = 4
    X, _ = arrange_input(lorenz96(jax.random.key(0), p=p, t=200), 14)
    model = CRVAE(p=p, hidden=8, enc_len=7)
    cfg = Phase1Config(max_iter=20, check_every=10, batch_size=32)
    best, state, _ = fit_phase1(model, model.init(jax.random.key(1)), X,
                                jnp.ones((p, p)), cfg, jax.random.key(2))
    path = str(tmp_path / "resume")
    save_checkpoint(path, state.params)
    restored = restore_checkpoint(path, state.params)
    best2, state2, m2 = fit_phase1(model, restored, X, jnp.ones((p, p)), cfg,
                                   jax.random.key(3))
    assert np.isfinite(m2["loss"])


def test_jsonl_writer(tmp_path):
    path = tmp_path / "metrics.jsonl"
    with JsonlWriter(str(path)) as w:
        w.write(0, {"loss": jnp.float32(2.0), "note": "start"})
        w.write(50, {"loss": 1.0})
    lines = [json.loads(line) for line in path.read_text().splitlines()]
    assert lines[0] == {"step": 0, "loss": 2.0, "note": "start"}
    assert lines[1]["loss"] == 1.0


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(4):
        time.sleep(0.01)
        t.tick(steps=10)
    sps = t.steps_per_sec()
    assert 100 < sps < 10000


def test_viz_produce_files(tmp_path):
    from vae_connexe_tpu.evals.viz import (
        gc_heatmaps,
        pca_comparison,
        trajectory_overlay,
        w_in_heatmaps,
        w_in_row_norms,
    )

    rng = np.random.default_rng(0)
    ori = rng.normal(size=(40, 21, 4))
    syn = ori + 0.1
    gc_heatmaps(np.eye(4), np.ones((4, 4)), str(tmp_path / "gc.png"))
    pca_comparison(ori, syn, str(tmp_path / "pca.png"))
    trajectory_overlay(ori, syn, str(tmp_path / "traj.png"))
    w_in_heatmaps(rng.normal(size=(4, 4, 8)), str(tmp_path / "w.png"))
    w_in_row_norms(rng.normal(size=(4, 4, 8)), str(tmp_path / "n.png"))
    for f in ("gc.png", "pca.png", "traj.png", "w.png", "n.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_moment_match():
    from vae_connexe_tpu.evals import moment_match

    ori = jnp.zeros((10, 5, 3))
    syn = jnp.ones((10, 5, 3)) * 2.0
    m = moment_match(ori, syn)
    np.testing.assert_allclose(np.asarray(m["mean_abs_gap"]), 2.0)
