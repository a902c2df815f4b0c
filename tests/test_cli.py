"""CLI surface tests (in-process main(), fast paths only)."""

import json

import pytest

from vae_connexe_tpu import cli


def test_list(capsys):
    cli.main(["list"])
    out = capsys.readouterr().out
    for name in ("lorenz96_crvae", "henon6d_win", "vrae_demo", "lorenz96_xl"):
        assert name in out


def test_unknown_subcommand_exits():
    with pytest.raises(SystemExit) as exc:
        cli.main(["frobnicate"])
    assert exc.value.code == 2


def test_run_unknown_experiment_raises():
    with pytest.raises(KeyError, match="unknown experiment"):
        cli.main(["run", "nosuch"])


def test_eval_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        cli.main(["eval", "lorenz96_crvae", str(tmp_path / "missing")])


def test_tiny_run_and_eval_roundtrip(tmp_path, capsys):
    """Smallest end-to-end: override to toy dims, train phase 1, save a
    checkpoint, evaluate it back through the CLI."""
    import dataclasses

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    results = run_experiment(
        "lorenz96_crvae", out_dir=str(tmp_path), save_checkpoints=True,
        run_phase2=False, verbose=False,
        overrides={"p": 4, "t": 200,
                   "phase1": dataclasses.replace(
                       exp.phase1, max_iter=20, check_every=10, batch_size=16)})
    assert "gc" in results and "gc_auto" in results

    # The checkpoint geometry is the override's (p=4), so evaluating it
    # against the stock experiment must fail loudly; against a matching
    # geometry the restore-side API is covered by test_aux/test_review_fixes.
    with pytest.raises(Exception):
        cli.main(["eval", "lorenz96_crvae", str(tmp_path / "ckpt_phase1")])


def test_eval_csrae_family(tmp_path, capsys):
    """cli eval supports the csrae family: restore a checkpoint, report
    recon accuracy + loss components, generate samples."""
    import jax
    import json as _json
    import numpy as np

    from vae_connexe_tpu.configs import get_experiment
    from vae_connexe_tpu.models import MixtureCSRAE
    from vae_connexe_tpu.utils import save_checkpoint

    exp = get_experiment("csrae_binarized")
    c = exp.csrae
    model = MixtureCSRAE(input_dim=exp.context * exp.p,
                         hidden_dims=c.hidden_dims, latent_dim=c.latent_dim,
                         k=c.k, lambda_cs=c.lambda_cs)
    save_checkpoint(str(tmp_path / "ckpt"), model.init(jax.random.key(0)))
    out_npy = str(tmp_path / "gen.npy")
    cli.main(["eval", "csrae_binarized", str(tmp_path / "ckpt"),
              "--generate", "8", "--out", out_npy])
    res = _json.loads(capsys.readouterr().out)
    assert 0.3 < res["recon_accuracy"] < 0.7      # untrained ≈ coin flip
    assert res["loss"]["bce"] > 0
    assert np.load(out_npy).shape == (8, exp.context * exp.p)


def test_run_emits_full_figure_ritual(tmp_path):
    """Two-phase run with out_dir emits the reference's full distribution-
    match ritual: PCA + t-SNE + trajectory for the cold-start rollout and
    PCA + t-SNE for the conditioned mode, plus both moment-gap metrics."""
    import dataclasses

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    results = run_experiment(
        "lorenz96_crvae", out_dir=str(tmp_path), verbose=False,
        overrides={"p": 4, "t": 200,
                   "phase1": dataclasses.replace(
                       exp.phase1, max_iter=20, check_every=10, batch_size=16),
                   "phase2": dataclasses.replace(
                       exp.phase2, max_iter=20, check_every=10, batch_size=16)})
    assert "generation_moment_gap" in results
    assert "generation_moment_gap_conditioned" in results
    for f in ("pca_lorenz96_crvae.png", "tsne_lorenz96_crvae.png",
              "traj_lorenz96_crvae.png", "pca_cond_lorenz96_crvae.png",
              "tsne_cond_lorenz96_crvae.png", "syn_cond_lorenz96_crvae.npy"):
        assert (tmp_path / f).exists(), f


def test_sweep_min_frac_auto(capsys):
    """`sweep --min-frac auto` runs the vmapped sweep and reports the
    auto-placed vote threshold inside the Meinshausen-Buhlmann range."""
    cli.main(["sweep", "--p", "4", "--t", "200", "--iters", "20",
              "--seeds", "2", "--batch", "16", "--min-frac", "auto"])
    out = json.loads(capsys.readouterr().out)
    assert out["seeds"] == 2
    assert 0.5 <= out["stability_min_frac"] <= 0.95
    assert 0.0 <= out["stability_selection"]["f1"] <= 1.0


def test_run_writes_jsonl_training_log(tmp_path):
    """With an out_dir, run_experiment streams one JSONL record per
    check_every chunk for BOTH phases (utils.JsonlWriter integration)."""
    import dataclasses

    from vae_connexe_tpu.configs import get_experiment, run_experiment

    exp = get_experiment("lorenz96_crvae")
    run_experiment(
        "lorenz96_crvae", out_dir=str(tmp_path), verbose=False,
        overrides={"p": 4, "t": 200,
                   "phase1": dataclasses.replace(
                       exp.phase1, max_iter=20, check_every=10, batch_size=16),
                   "phase2": dataclasses.replace(
                       exp.phase2, max_iter=10, check_every=5, batch_size=16)})
    path = tmp_path / "train_log_lorenz96_crvae.jsonl"
    assert path.exists()
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    p1 = [r for r in recs if r["phase"] == "phase1"]
    p2 = [r for r in recs if r["phase"] == "phase2"]
    assert [r["step"] for r in p1] == [10, 20]
    assert [r["step"] for r in p2] == [5, 10]
    assert all("loss" in r or "mean_loss" in r for r in recs)


def test_debug_nans_flag(monkeypatch):
    """--debug-nans enables jax_debug_nans before the run starts."""
    import jax

    seen = {}

    def fake_run(name, **kw):
        seen["debug_nans"] = jax.config.jax_debug_nans
        return {}

    monkeypatch.setattr("vae_connexe_tpu.configs.run_experiment", fake_run)
    try:
        cli.main(["run", "lorenz96_crvae", "--debug-nans", "--quiet"])
        assert seen["debug_nans"] is True
    finally:
        jax.config.update("jax_debug_nans", False)


def test_run_processes_flag_validation():
    """--processes rejects flags that don't compose multi-process, before
    spawning anything."""
    with pytest.raises(SystemExit, match="not supported multi-process"):
        cli.main(["run", "lorenz96_crvae", "--processes", "2", "--mesh"])
    with pytest.raises(SystemExit, match="require --out-dir"):
        cli.main(["run", "lorenz96_crvae", "--processes", "2",
                  "--checkpoint-every", "4"])


def test_run_processes_cli_path(capsys):
    """`cli run <exp> --processes 2`: the user-reachable multi-controller
    entry spawns real worker processes and prints the results JSON (full
    ≡-single-process pinning lives in tests/test_multiprocess.py)."""
    cli.main(["run", "lorenz96_crvae", "--processes", "2",
              "--devices-per-process", "2", "--ep", "2",
              "--iters", "4", "--no-phase2", "--quiet"])
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    assert results["processes"] == 2
    assert results["mesh"] == {"dp": 2, "ep": 2}
    assert "gc" in results and "phase2" not in results
