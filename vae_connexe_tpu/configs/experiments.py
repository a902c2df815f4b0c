"""The reference's experiment drivers, formalized.

| name               | reference driver                      | system        |
|--------------------|---------------------------------------|---------------|
| lorenz96_crvae     | CRVAE_lorenz96.py:731-796             | Lorenz-96 p=10|
| henon_author       | author_CRVAE.py:703-799               | 2-D Hénon     |
| henon6d_win        | CRVAE.py:202-267                      | coupled Hénon |
| var_crvae          | CR-VAE.py:355-453                     | VAR(1) d=5    |
| lorenz96_crcsrae   | CR-CS-RAE.py:821-948                  | Lorenz-96 +CS |
| vrae_demo          | VRAE.py:185-204                       | random seqs   |
| csrae_binarized    | CS-RAE.py:115-155 (driverless in ref) | binarized L96 |
| lorenz96_scaled    | BASELINE.json configs[4] (new)        | Lorenz-96 p=40|

Hyperparameters are the reference's literals (each field cites its source
in the table rows below); ``run_experiment`` executes the full two-phase
pipeline and returns a metrics dict, saving artifacts (GC matrix, samples)
to ``out_dir`` — the reference's ``np.save`` contract
(``author_CRVAE.py:695-696,787``).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_connexe_tpu.train.config import (CSRAETrainConfig, Phase1Config,
                                           Phase2Config, WInTrainConfig)


@dataclasses.dataclass(frozen=True)
class Experiment:
    name: str
    model_family: str              # 'crvae' | 'win' | 'vrae' | 'csrae'
    dataset: str                   # 'lorenz96' | 'henon' | 'coupled_henon' | 'var' | 'random'
    p: int = 10
    t: int = 2048
    context: int = 20
    hidden: int = 64
    latent: int = 32
    tau: int = 10                  # W_in-variant past/current split
    gc_threshold: float = 0.0
    phase1: Phase1Config = Phase1Config()
    phase2: Phase2Config = Phase2Config()
    win: WInTrainConfig = WInTrainConfig()
    csrae: CSRAETrainConfig = CSRAETrainConfig()
    # >1 enables the unsupervised stability-selection row (win family):
    # train this many seeds and vote per-seed auto-threshold selections.
    stability_seeds: int = 0
    notes: str = ""


EXPERIMENTS: dict[str, Experiment] = {
    # CRVAE_lorenz96.py:737-743 (p=10, T=2048), :772-774 (λ=.1, lr=5e-2,
    # 5000 it), :458 (batch 256), :792-794 (phase 2, 10000 it).
    "lorenz96_crvae": Experiment(
        name="lorenz96_crvae", model_family="crvae", dataset="lorenz96",
        p=10, t=2048, context=20, hidden=64,
        phase1=Phase1Config(lam=0.1, lr=5e-2, max_iter=5000, batch_size=256),
        phase2=Phase2Config(lr=5e-2, max_iter=10000, batch_size=256),
        notes="canonical reference workload"),
    # Same workload with λ=0.2: a measured improvement over the reference
    # literal (binary F1 0.95 vs 0.87 at unchanged AUROC 1.0 — RESULTS.md
    # λ-sweep).  lorenz96_crvae stays at the reference λ=0.1 for parity;
    # this is the recommended config for actual use.
    "lorenz96_crvae_tuned": Experiment(
        name="lorenz96_crvae_tuned", model_family="crvae", dataset="lorenz96",
        p=10, t=2048, context=20, hidden=64,
        phase1=Phase1Config(lam=0.2, lr=5e-2, max_iter=5000, batch_size=256),
        phase2=Phase2Config(lr=5e-2, max_iter=10000, batch_size=256),
        notes="recommended: tuned group-lasso weight"),
    # author_CRVAE.py:728 (1000-step 2-D Hénon), :751-753 (λ=.1, 1000 it).
    "henon_author": Experiment(
        name="henon_author", model_family="crvae", dataset="henon",
        p=2, t=1000, context=20, hidden=64,
        phase1=Phase1Config(lam=0.1, lr=5e-2, max_iter=1000, batch_size=256),
        phase2=Phase2Config(lr=5e-2, max_iter=10000, batch_size=256)),
    # CRVAE.py:205 (T=3000 D=6), :242-243 (H=64 Z=32 τ=10, λ=.03 lr=2e-3),
    # :247,261 (2000 + 1000 epochs, bs=256).
    "henon6d_win": Experiment(
        name="henon6d_win", model_family="win", dataset="coupled_henon",
        p=6, t=3000, context=20, hidden=64, latent=32, tau=10,
        gc_threshold=1e-6,
        win=WInTrainConfig(lr=2e-3, lam=0.03, prox_groups="row",
                           batch_size=256, stage1_epochs=2000,
                           stage2_epochs=1000),
        stability_seeds=8),
    # CR-VAE.py:360-364 (D=5 H=64 Z=16 τ=10), :397 (500 seqs), :422
    # (λ=.02, lr_prox=.01, 100 epochs), element-wise prox (:126-128).
    "var_crvae": Experiment(
        name="var_crvae", model_family="win", dataset="var",
        p=5, t=30, context=20, hidden=64, latent=16, tau=10,
        gc_threshold=0.1,
        # The reference's CR-VAE.py excludes W_in from Adam AND its
        # "proximal" step is shrink-only (``CR-VAE.py:122-128,264-272``
        # never applies W_in's gradient) — a notebook artifact under which
        # W_in can only decay.  This build normalizes to a true ISTA
        # (gradient step + shrink, SURVEY.md §7); at the reference's
        # lr_prox=1e-2 that over-prunes, so the prox rides the Adam lr here
        # (lr_prox stays available for parity sweeps).
        win=WInTrainConfig(lr=1e-3, lam=0.02, prox_groups="element",
                           batch_size=16, stage1_epochs=100, stage2_epochs=30,
                           update_w_in_stage2=True),
        stability_seeds=8),
    # CR-CS-RAE.py:888 (λ=.5), :898-900 (2000 it), :899 (K=10, λ_cs=.1),
    # :531 (batch 2048), :660 (phase-2 batch 1024), :944-946 (10000 it).
    "lorenz96_crcsrae": Experiment(
        name="lorenz96_crcsrae", model_family="crvae", dataset="lorenz96",
        p=10, t=2048, context=20, hidden=64,
        phase1=Phase1Config(lam=0.5, lr=5e-2, max_iter=2000, batch_size=2048,
                            latent_reg="cs", lambda_cs=0.1, gmm_components=10),
        # Phase 2 keeps the CS regularizer on the main model and standard KL
        # on the error VAE (``CR-CS-RAE.py:698-747``).
        phase2=Phase2Config(lr=5e-2, max_iter=10000, batch_size=1024,
                            latent_reg="cs", lambda_cs=0.1,
                            gmm_components=10)),
    # VRAE.py:189-199: random (32, 20, 10) data, tanh head, β=0.5,
    # exponential teacher-forcing decay 0.02, 100 epochs.
    "vrae_demo": Experiment(
        name="vrae_demo", model_family="vrae", dataset="random",
        p=10, t=20, hidden=64, latent=32),
    # BASELINE.json configs[4]: scaled long-horizon Lorenz-96 (p=40/128).
    "lorenz96_scaled": Experiment(
        name="lorenz96_scaled", model_family="crvae", dataset="lorenz96",
        p=40, t=4096, context=40, hidden=128,
        phase1=Phase1Config(lam=0.1, lr=5e-2, max_iter=5000, batch_size=512),
        phase2=Phase2Config(lr=5e-2, max_iter=5000, batch_size=512),
        notes="long-horizon scale-out config"),
    # Long-horizon windows: T_dec = 118 > UNROLL_MAX_T exercises the fused
    # Pallas recurrence inside training (SURVEY.md §5 "long-context").
    "lorenz96_longhorizon": Experiment(
        name="lorenz96_longhorizon", model_family="crvae", dataset="lorenz96",
        p=10, t=4096, context=128, hidden=64,
        phase1=Phase1Config(lam=0.1, lr=5e-2, max_iter=2000, batch_size=128),
        phase2=Phase2Config(lr=5e-2, max_iter=2000, batch_size=128),
        notes="long-horizon windows (fused-kernel decode path)"),
    # CS-RAE.py:115-155 model + loss contract (MLP 400, latent 20, K=10);
    # the reference ships it driverless, so the dataset is this build's:
    # binarized Lorenz-96 windows flattened to (N, ctx·p) Bernoulli vectors
    # — structured enough for the GMM prior to have something to learn.
    "csrae_binarized": Experiment(
        name="csrae_binarized", model_family="csrae", dataset="lorenz96",
        p=10, t=2048, context=20,
        csrae=CSRAETrainConfig(hidden_dims=(400,), latent_dim=20, k=10,
                               lambda_cs=1.0, epochs=30, batch_size=128,
                               lr=1e-3),
        notes="MixtureCSRAE on binarized Lorenz-96 windows"),
    "lorenz96_xl": Experiment(
        name="lorenz96_xl", model_family="crvae", dataset="lorenz96",
        p=128, t=8192, context=40, hidden=128,
        # Smaller batch: the decoder's saved activations scale with
        # p * B * T_dec * 3H (~400MB at B=64) and the backward doubles it.
        phase1=Phase1Config(lam=0.1, lr=5e-2, max_iter=3000, batch_size=64),
        phase2=Phase2Config(lr=5e-2, max_iter=3000, batch_size=64),
        notes="extreme-scale config (p=128)"),
}


def get_experiment(name: str) -> Experiment:
    if name not in EXPERIMENTS:
        raise KeyError(f"unknown experiment {name!r}; "
                       f"available: {sorted(EXPERIMENTS)}")
    return EXPERIMENTS[name]


def _sweep(truth, scores) -> dict[str, dict[str, float]]:
    """The reference's threshold sweep (``CR-VAE.py:437-443``): accuracy and
    sparsity of the binarized estimate across a threshold grid."""
    from vae_connexe_tpu.evals import threshold_sweep

    thrs = jnp.array([0.0, 0.01, 0.05, 0.1, 0.2, 0.5])
    acc, sparsity = threshold_sweep(truth, scores, thrs)
    return {f"{float(t):g}": {"accuracy": float(a), "sparsity": float(s)}
            for t, a, s in zip(thrs, acc, sparsity)}


def _make_dataset(exp: Experiment, key: jax.Array):
    from vae_connexe_tpu import data as D

    if exp.dataset == "lorenz96":
        series = D.lorenz96(key, p=exp.p, t=exp.t)
        truth = D.lorenz96_truth(exp.p)
    elif exp.dataset == "henon":
        series = D.henon_chain(t=exp.t)
        truth = D.henon_truth(exp.p)
    elif exp.dataset == "coupled_henon":
        series = D.coupled_henon(key, t=exp.t, d=exp.p)
        truth = D.coupled_henon_truth(exp.p)
    elif exp.dataset == "var":
        a = D.var_truth(exp.p)
        series = D.var_process(key, a, n=500, t=exp.t)  # (N, t, p) stack
        truth = (a > 0).astype(jnp.int32)
    elif exp.dataset == "random":
        series = jax.random.normal(key, (32, exp.t, exp.p))
        truth = None
    else:
        raise ValueError(f"unknown dataset {exp.dataset!r}")
    return series, truth


def make_csrae_inputs(exp: Experiment, series: jax.Array):
    """Binarized flattened windows + the configured MixtureCSRAE.

    Shared by ``run_experiment`` and ``cli eval`` so an eval-time model can
    never be constructed inconsistently with the checkpoint it restores
    (binarization, flattening and model kwargs live in exactly one place).
    Flatten to (N, ctx·p) and binarize at 0 (series is standardized per
    variable, so the split is balanced) — Bernoulli data for the
    BCE-with-logits decoder (``CS-RAE.py:128-135``).
    """
    from vae_connexe_tpu.data import arrange_input
    from vae_connexe_tpu.models import MixtureCSRAE

    windows, _ = arrange_input(series, exp.context)
    x = (windows.reshape(windows.shape[0], -1) > 0).astype(jnp.float32)
    cfgc = exp.csrae
    model = MixtureCSRAE(input_dim=x.shape[-1], hidden_dims=cfgc.hidden_dims,
                         latent_dim=cfgc.latent_dim, k=cfgc.k,
                         lambda_cs=cfgc.lambda_cs, cs_variant=cfgc.cs_variant)
    return x, model


def csrae_eval_metrics(model, params, x: jax.Array, key: jax.Array) -> dict:
    """Reconstruction accuracy + loss decomposition on a 512-row slice —
    the sanity metrics both the experiment driver and ``cli eval`` report."""
    logits, _, _ = model.forward(params, x[:512], key)
    total, bce, cs = model.loss(params, x[:512], key)
    return {
        "recon_accuracy": float(
            ((logits > 0).astype(jnp.float32) == x[:512]).mean()),
        "loss": {"total": float(total), "bce": float(bce), "cs": float(cs)},
    }


def run_experiment(name: str, seed: int = 0, out_dir: str | None = None,
                   overrides: Optional[dict[str, Any]] = None,
                   run_phase2: bool = True, verbose: bool = True,
                   save_checkpoints: bool = False,
                   artifacts_every: int | None = None,
                   mesh=None,
                   out_of_core: bool = False,
                   checkpoint_every: int | None = None,
                   resume: bool = False,
                   log_fn=print) -> dict[str, Any]:
    """Execute a named experiment end to end.  Returns the metrics dict.

    ``save_checkpoints=True`` (requires ``out_dir``) writes orbax
    checkpoints of the trained parameters, with the GC matrix as the
    phase-1 companion artifact (the two-phase handoff format).

    ``artifacts_every=N`` (requires ``out_dir``; CRVAE family) reproduces
    the reference's periodic phase-2 ritual (``author_CRVAE.py:688-696``):
    every N iterations, sample compensated rollouts, save them, and write a
    PCA comparison plus a trajectory overlay against the real windows.

    ``mesh`` (a (dp, ep) ``jax.sharding.Mesh``; CRVAE family) trains BOTH
    phases sharded over the mesh — batch over dp, stacked decoder heads
    over ep — with results equal to the single-device run (same keys).

    ``out_of_core=True`` (CRVAE family) trains BOTH phases through the
    native window loader: the series is written to a raw float32 file,
    memory-mapped by the C++ loader, and minibatches stream host→device per
    scan chunk — the data path for series too long for HBM.  Training is
    bitwise the in-memory run (``train/streaming.py``); eval/figure surfaces
    that need a window block use the first ``min(4096, n)`` windows (at the
    committed configs that is all of them).  Composes with ``mesh``: each
    streamed chunk lands batch-sharded over dp.

    ``checkpoint_every=N`` (requires ``out_dir``; CRVAE family) snapshots the
    full training state of whichever phase is running every N steps under
    ``out_dir/ckpt_mid_phase{1,2}``; ``resume=True`` restores the latest
    snapshot and continues — a killed-and-resumed run equals the
    uninterrupted one bitwise (a completed phase is a pure restore, no
    retraining).  Composes with ``mesh`` and ``out_of_core``.
    """
    exp = get_experiment(name)
    if mesh is not None and exp.model_family != "crvae":
        raise ValueError(
            f"--mesh supports the crvae family (two-phase trainer); "
            f"{name!r} is {exp.model_family!r}")
    if out_of_core and exp.model_family != "crvae":
        raise ValueError(
            f"--out-of-core supports the crvae family (streaming trainers); "
            f"{name!r} is {exp.model_family!r}")
    if (checkpoint_every or resume) and exp.model_family != "crvae":
        raise ValueError(
            f"--checkpoint-every/--resume support the crvae family "
            f"(two-phase trainer); {name!r} is {exp.model_family!r}")
    if (checkpoint_every or resume) and not out_dir:
        raise ValueError("--checkpoint-every/--resume require --out-dir "
                         "(checkpoints live under it)")
    if overrides:
        exp = dataclasses.replace(exp, **overrides)
    key = jax.random.key(seed)
    k_data, k_init, k_run, k_p2, k_gen = jax.random.split(key, 5)
    series, truth = _make_dataset(exp, k_data)
    out = pathlib.Path(out_dir) if out_dir else None
    if out:
        out.mkdir(parents=True, exist_ok=True)
    results: dict[str, Any] = {"experiment": name, "seed": seed}

    if exp.model_family == "crvae":
        from vae_connexe_tpu.data import arrange_input
        from vae_connexe_tpu.evals import gc_metrics
        from vae_connexe_tpu.models import CRVAE, ErrorVAE
        from vae_connexe_tpu.train import (fit_phase1, fit_phase2,
                                           generate_with_compensation)

        model = CRVAE(p=exp.p, hidden=exp.hidden)
        params = model.init(k_init)
        full = jnp.ones((exp.p, exp.p), jnp.float32)
        log_writer = None
        if out:
            # Structured training log: one JSONL record per check_every
            # chunk, both phases — the persistent counterpart of the
            # reference's print-every-50 (``author_CRVAE.py:538-545``).
            from vae_connexe_tpu.utils import JsonlWriter

            log_writer = JsonlWriter(str(out / f"train_log_{name}.jsonl"))

        def _log_phase(phase):
            if log_writer is None:
                return None
            return lambda step, state, metrics: log_writer.write(
                step, {"phase": phase, **metrics})

        def ckpt_kw(phase):
            if not (checkpoint_every or resume):
                return {}
            return {"checkpoint_dir": str(out / f"ckpt_mid_{phase}"),
                    "checkpoint_every": checkpoint_every or 0,
                    "resume": resume}
        loader = None
        if out_of_core:
            import tempfile

            from vae_connexe_tpu.data.native_loader import NativeWindowLoader
            from vae_connexe_tpu.train import (fit_phase1_streaming,
                                               fit_phase2_streaming)

            series_np = np.ascontiguousarray(np.asarray(series), np.float32)
            base = out if out else pathlib.Path(tempfile.mkdtemp())
            series_path = base / f"series_{name}.f32"
            series_np.tofile(series_path)
            loader = NativeWindowLoader.from_file(str(series_path),
                                                  *series_np.shape)
            best, state, m1 = fit_phase1_streaming(
                model, params, loader, exp.context, full, exp.phase1, k_run,
                verbose=verbose, log_fn=log_fn, callback=_log_phase("phase1"),
                mesh=mesh, **ckpt_kw("phase1"))
            # Bounded window block for the eval/figure surfaces below —
            # identical to the in-memory windows' head (gather parity is
            # pinned in tests/test_native_loader.py).
            n_eval = min(4096, loader.t - exp.context)
            windows = jnp.asarray(
                loader.gather(np.arange(n_eval, dtype=np.int64), exp.context))
        else:
            windows, _ = arrange_input(series, exp.context)
            best, state, m1 = fit_phase1(model, params, windows, full,
                                         exp.phase1, k_run, verbose=verbose,
                                         log_fn=log_fn, mesh=mesh,
                                         callback=_log_phase("phase1"),
                                         **ckpt_kw("phase1"))
        scores = model.gc(best, threshold=False)
        gc_est = model.gc(best, threshold=True)
        results["phase1"] = m1
        if truth is not None:
            from vae_connexe_tpu.evals import auto_threshold

            results["gc"] = {k: float(v) for k, v in
                             gc_metrics(truth, scores, exp.gc_threshold).items()}
            thr_auto = float(auto_threshold(scores))
            results["gc_auto"] = {"threshold": thr_auto,
                                  **{k: float(v) for k, v in
                                     gc_metrics(truth, scores, thr_auto).items()}}
            results["threshold_sweep"] = _sweep(truth, scores)
            if exp.dataset == "henon" and exp.p == 2:
                # The reference's own 2-D Hénon truth matrix mislabels its
                # generator (author_CRVAE.py:706-719 vs :734-737; see
                # data.henon.henon_dynamics_truth).  Report the corrected
                # evaluation next to the parity row, including the best
                # operating point over a dense threshold grid.
                from vae_connexe_tpu.data import henon_dynamics_truth

                dyn = henon_dynamics_truth()
                results["gc_dynamics"] = {
                    k: float(v) for k, v in gc_metrics(dyn, scores).items()}
                grid = jnp.linspace(0.0, float(scores.max()), 64)
                accs = [float(gc_metrics(dyn, scores, float(t))["accuracy"])
                        for t in grid]
                best_i = int(np.argmax(accs))
                results["gc_dynamics_best_threshold"] = {
                    "threshold": float(grid[best_i]),
                    **{k: float(v) for k, v in
                       gc_metrics(dyn, scores, float(grid[best_i])).items()}}
        if out:
            np.save(out / f"GC_{name}.npy", np.asarray(gc_est))
            np.save(out / f"GC_scores_{name}.npy", np.asarray(scores))
            if truth is not None:
                # The reference's truth-vs-estimate heatmap pair with red
                # disagreement rectangles (``author_CRVAE.py:763-784``), at
                # the default binarization AND the auto-threshold operating
                # point.
                from vae_connexe_tpu.evals.viz import gc_heatmaps

                gc_heatmaps(np.asarray(truth), np.asarray(gc_est),
                            str(out / f"gc_heatmap_{name}.png"))
                if "gc_auto" in results:
                    gc_heatmaps(
                        np.asarray(truth),
                        np.asarray(scores) > results["gc_auto"]["threshold"],
                        str(out / f"gc_heatmap_auto_{name}.png"))
        if save_checkpoints and out:
            from vae_connexe_tpu.utils import save_checkpoint
            save_checkpoint(str(out / "ckpt_phase1"), best, gc_matrix=gc_est)

        if run_phase2:
            mask = gc_est.astype(jnp.float32)
            p2_params = model.init(jax.random.fold_in(k_init, 1))
            err_model = ErrorVAE(d=exp.p, hidden=exp.hidden)
            err_params = err_model.init(jax.random.fold_in(k_init, 2))

            callback = None
            if artifacts_every and out:
                from vae_connexe_tpu.evals.viz import pca_comparison, trajectory_overlay

                # Real and generated segments must share T for the PCA fit:
                # the rollout is rollout_len steps, windows give T - enc_len.
                t_cmp = min(model.rollout_len,
                            windows.shape[1] - model.enc_len)
                ori = np.asarray(windows[:256, model.enc_len:model.enc_len + t_cmp, :])
                fired = {"last": 0}

                def callback(step, state, metrics):
                    # The trainer calls back once per check_every chunk;
                    # fire on the first boundary at/after each period so
                    # artifacts_every needn't divide check_every.
                    if step - fired["last"] < artifacts_every:
                        return
                    fired["last"] = step
                    gen = generate_with_compensation(
                        model, err_model, state.params, state.err_params,
                        jax.random.fold_in(k_gen, step), 256, parents=mask)
                    syn = np.asarray(gen[:, :t_cmp, :])
                    np.save(out / f"syn_{name}_it{step}.npy", syn)
                    pca_comparison(ori, syn, str(out / f"pca_{name}_it{step}.png"))
                    trajectory_overlay(ori, syn,
                                       str(out / f"traj_{name}_it{step}.png"))

            cbs = [c for c in (_log_phase("phase2"), callback) if c]
            p2_cb = ((lambda step, state, metrics: [c(step, state, metrics)
                                                    for c in cbs])
                     if cbs else None)
            if out_of_core:
                best2, err2, _, m2 = fit_phase2_streaming(
                    model, err_model, p2_params, err_params, loader,
                    exp.context, mask, exp.phase2, k_p2, verbose=verbose,
                    log_fn=log_fn, callback=p2_cb, mesh=mesh,
                    **ckpt_kw("phase2"))
            else:
                best2, err2, _, m2 = fit_phase2(model, err_model, p2_params,
                                                err_params, windows, mask,
                                                exp.phase2, k_p2,
                                                verbose=verbose,
                                                log_fn=log_fn,
                                                callback=p2_cb, mesh=mesh,
                                                **ckpt_kw("phase2"))
            results["phase2"] = m2
            gen = generate_with_compensation(model, err_model, best2, err2,
                                             k_gen, 256, parents=mask)
            results["generated_shape"] = list(gen.shape)
            from vae_connexe_tpu.evals import moment_match
            mm = moment_match(windows, gen)
            results["generation_moment_gap"] = {
                "mean_abs_gap": float(mm["mean_abs_gap"].mean()),
                "std_abs_gap": float(mm["std_abs_gap"].mean()),
            }
            # Conditioned (on-manifold) generation next to the cold start:
            # encode real contexts, continue with error compensation — the
            # mode the reference's W_in variant demonstrates (CRVAE.py:105-123).
            k_c1, k_c2 = jax.random.split(jax.random.fold_in(k_gen, 1))
            ctxs = windows[:256, : model.enc_len, :]
            # ErrorVAE.sample returns length+1 steps (it keeps the leading
            # zero step) — slice to rollout_len exactly as
            # generate_with_compensation does, so the conditioned rollout
            # is rollout_len steps like the cold start.
            noise_c = err_model.sample(err2, k_c1, ctxs.shape[0],
                                       model.rollout_len)
            cond = model.conditioned_rollout(
                best2, ctxs, k_c2, noise=noise_c[:, : model.rollout_len],
                parents=mask)
            mm_c = moment_match(windows, cond)
            results["generation_moment_gap_conditioned"] = {
                "mean_abs_gap": float(mm_c["mean_abs_gap"].mean()),
                "std_abs_gap": float(mm_c["std_abs_gap"].mean()),
            }
            if out:
                np.save(out / f"syn_{name}.npy", np.asarray(gen))
                np.save(out / f"syn_cond_{name}.npy", np.asarray(cond))
                # The reference's distribution-match ritual is PCA AND t-SNE
                # (author_CRVAE.py:376-456); emit both, for both modes.
                from vae_connexe_tpu.evals.viz import (pca_comparison,
                                                       trajectory_overlay,
                                                       tsne_comparison)
                t_cmp = min(model.rollout_len,
                            windows.shape[1] - model.enc_len)
                ori = np.asarray(
                    windows[:256, model.enc_len: model.enc_len + t_cmp, :])
                syn_np = np.asarray(gen[:, :t_cmp, :])
                cond_np = np.asarray(cond[:, :t_cmp, :])
                pca_comparison(ori, syn_np, str(out / f"pca_{name}.png"))
                tsne_comparison(ori, syn_np, str(out / f"tsne_{name}.png"))
                trajectory_overlay(ori, syn_np, str(out / f"traj_{name}.png"))
                pca_comparison(ori, cond_np, str(out / f"pca_cond_{name}.png"))
                tsne_comparison(ori, cond_np,
                                str(out / f"tsne_cond_{name}.png"))
            if save_checkpoints and out:
                from vae_connexe_tpu.utils import save_checkpoint
                save_checkpoint(str(out / "ckpt_phase2"),
                                {"crvae": best2, "error_vae": err2})
        if log_writer is not None:
            log_writer.close()

    elif exp.model_family == "win":
        from vae_connexe_tpu.data import sliding_windows
        from vae_connexe_tpu.evals import gc_metrics
        from vae_connexe_tpu.models import WInCRVAE
        from vae_connexe_tpu.train import WInTrainer

        if series.ndim == 2:
            windows = sliding_windows(series, 2 * exp.tau)
        else:   # (N, t, p) independent sequences -> clip to 2τ
            windows = series[:, : 2 * exp.tau, :]
        model = WInCRVAE(d=exp.p, hidden=exp.hidden, latent=exp.latent,
                         tau=exp.tau)
        params = model.init(k_init)
        trainer = WInTrainer(model, exp.win)
        params, m, stage1_params = trainer.fit(params, windows, k_run,
                                               verbose=verbose, log_fn=log_fn,
                                               return_stage1=True)
        scores = model.granger_matrix(params, threshold=False)
        results["train"] = m
        # Prediction-performance comparison (``CRVAE.py:333-350``): the
        # reference evaluates the FINAL model's phase-1 forward (clean
        # decode) against its phase-2 forward (decode + error
        # compensation) on one batch and reports the improvement.  A third
        # row measures the pruning cost: the pre-prune stage-I params
        # through the same clean forward.
        from vae_connexe_tpu.evals import prediction_mse

        x_past = windows[:, : exp.tau, :]
        x_cur = windows[:, exp.tau: 2 * exp.tau, :]
        k_mse = jax.random.fold_in(k_run, 1)
        pred_clean = model.forward(params, x_past, x_cur, k_mse, phase=1)[0]
        pred_comp = model.forward(params, x_past, x_cur, k_mse, phase=2)[0]
        pred_s1 = model.forward(stage1_params, x_past, x_cur, k_mse,
                                phase=1)[0]
        mse1 = float(prediction_mse(pred_clean, x_cur))
        mse2 = float(prediction_mse(pred_comp, x_cur))
        results["prediction_mse"] = {
            "phase1_forward": mse1,
            "phase2_forward_with_compensation": mse2,
            "improvement_pct": round((1 - mse2 / mse1) * 100, 1),
            "stage1_params_phase1_forward": float(
                prediction_mse(pred_s1, x_cur)),
        }
        if truth is not None:
            from vae_connexe_tpu.evals import auto_threshold

            results["gc"] = {k: float(v) for k, v in
                             gc_metrics(truth, scores, exp.gc_threshold).items()}
            results["threshold_sweep"] = _sweep(truth, scores)
            # Recommended operating points next to the parity row (round-2
            # verdict: the fixed reference thresholds leave the binary
            # metrics far below the AUROC-1.0 ranking's potential).
            thr_auto = float(auto_threshold(scores))
            results["gc_auto"] = {"threshold": thr_auto,
                                  **{k: float(v) for k, v in
                                     gc_metrics(truth, scores, thr_auto).items()}}
            # Off-diagonal-only evaluation: the coupled-Hénon/VAR truths
            # omit self-loops the dynamics genuinely contain (RESULTS.md
            # notes), so the coupling structure the W_in norms encode is
            # the off-diagonal ranking; threshold and score it directly.
            offmask = ~np.eye(exp.p, dtype=bool)
            s_off = jnp.asarray(np.asarray(scores)[offmask])
            t_off = jnp.asarray(np.asarray(truth)[offmask])
            thr_off = float(auto_threshold(s_off))
            results["gc_offdiag_auto"] = {
                "threshold": thr_off,
                **{k: float(v) for k, v in
                   gc_metrics(t_off, s_off, thr_off).items()
                   if k != "auroc_offdiag"}}
            # Best achievable off-diagonal operating point over a dense
            # threshold grid — the ranking's potential, same ritual as
            # henon_author's gc_dynamics_best_threshold.  Oracle-supervised
            # (marked as such): the W_in score distribution decays smoothly
            # between noise survivors and true edges, so no unsupervised
            # gap rule can land here; the reference's own answer is a
            # manual sweep (``CR-VAE.py:437-443``).
            grid = jnp.linspace(0.0, float(s_off.max()), 128)
            f1s = [float(gc_metrics(t_off, s_off, float(t))["f1"])
                   for t in grid]
            best_i = int(np.argmax(f1s))
            results["gc_offdiag_best_threshold"] = {
                "threshold": float(grid[best_i]), "oracle": True,
                **{k: float(v) for k, v in
                   gc_metrics(t_off, s_off, float(grid[best_i])).items()}}
            # Unsupervised stability-selection row: the single-run score
            # spectrum defeats any gap rule here (a lone tiny prox survivor
            # out-gaps the true noise/edge boundary in log space — see
            # RESULTS.md), but noise survivors are seed-specific while true
            # edges persist, so per-seed auto-threshold selections voted
            # across inits recover the support without the truth matrix.
            # The reference's answer is a manual sweep (``CR-VAE.py:437-443``);
            # this is the framework-native unsupervised operating point.
            if exp.stability_seeds > 1:
                from vae_connexe_tpu.evals import stability_selection

                # Stage 2 leaves W_in untouched unless update_w_in_stage2
                # (it only refines the frozen-support fit), so the extra
                # seeds skip it — identical scores, stage 2's epochs saved.
                e2 = (exp.win.stage2_epochs
                      if exp.win.update_w_in_stage2 else 0)
                # All extra seeds train SIMULTANEOUSLY in one vmapped
                # program per epoch block (WInTrainer.fit_many) — the
                # chip-filling form of the sequential per-seed loop.
                s_idx = jnp.arange(1, exp.stability_seeds)
                p_stack = jax.vmap(
                    lambda s: model.init(jax.random.fold_in(k_init, s)))(s_idx)
                seed_keys = jax.vmap(
                    lambda s: jax.random.fold_in(k_run, 100 + s))(s_idx)
                p_stack, _ = trainer.fit_many(p_stack, windows, seed_keys,
                                              stage2_epochs=e2)
                extra = jax.vmap(
                    lambda ps: model.granger_matrix(ps, threshold=False))(
                        p_stack)
                stack = [np.asarray(scores)] + list(np.asarray(extra))
                votes, _, min_frac = stability_selection(
                    jnp.asarray(np.stack(stack)), min_frac="auto",
                    exclude_diagonal=True)
                v_off = jnp.asarray(np.asarray(votes)[offmask])
                results["gc_stability"] = {
                    "seeds": exp.stability_seeds, "min_frac": min_frac,
                    "votes_offdiag": [round(float(v), 3)
                                      for v in np.asarray(votes)[offmask]],
                    **{k: float(v) for k, v in
                       gc_metrics(t_off, v_off, min_frac - 1e-6).items()
                       if k != "auroc_offdiag"}}
        gen = model.generate(params, windows[:8], k_gen, 20)
        results["generated_shape"] = list(gen.shape)
        if out:
            np.save(out / f"GC_scores_{name}.npy", np.asarray(scores))
            np.save(out / f"syn_{name}.npy", np.asarray(gen))
            # The reference's W_in figure ritual (``CRVAE.py:407-435``):
            # per-head weight heatmaps + row-norm bars.
            from vae_connexe_tpu.evals.viz import (gc_heatmaps, w_in_heatmaps,
                                                   w_in_row_norms)

            w_in = np.asarray(params.w_in)
            w_in_heatmaps(w_in, str(out / f"w_in_{name}.png"))
            w_in_row_norms(w_in, str(out / f"w_in_norms_{name}.png"),
                           threshold=exp.win.prune_threshold)
            if truth is not None:
                gc_heatmaps(np.asarray(truth),
                            np.asarray(scores) > results["gc_auto"]["threshold"],
                            str(out / f"gc_heatmap_{name}.png"))
        if save_checkpoints and out:
            from vae_connexe_tpu.utils import save_checkpoint
            gc_bin = model.granger_matrix(params, thr=exp.win.prune_threshold)
            save_checkpoint(str(out / "ckpt_win"), params,
                            gc_matrix=np.asarray(gc_bin))

    elif exp.model_family == "csrae":
        from vae_connexe_tpu.train import fit_csrae

        x, model = make_csrae_inputs(exp, series)
        cfgc = exp.csrae
        params = model.init(k_init)
        init_total, init_bce, init_cs = model.loss(params, x[:512], k_run)
        params, m = fit_csrae(model, params, x, k_run, epochs=cfgc.epochs,
                              batch_size=cfgc.batch_size, lr=cfgc.lr,
                              verbose=verbose, log_fn=log_fn)
        results["train"] = m
        results["initial"] = {"total": float(init_total),
                              "bce": float(init_bce), "cs": float(init_cs)}
        results.update(csrae_eval_metrics(model, params, x, k_gen))
        samples = model.sample(params, k_gen, 64)
        results["generated_shape"] = list(samples.shape)
        if out:
            np.save(out / f"syn_{name}.npy", np.asarray(samples))
            # The reference's distribution-match ritual (PCA + t-SNE,
            # ``author_CRVAE.py:376-456``) applied to the CSRAE's flattened
            # binarized windows: reshape back to (N, ctx, p) window form.
            from vae_connexe_tpu.evals.viz import pca_comparison, tsne_comparison
            shape3 = (-1, exp.context, exp.p)
            ori3 = np.asarray(x[:512]).reshape(shape3)
            syn3 = np.asarray(samples).reshape(shape3)
            pca_comparison(ori3, syn3, str(out / f"pca_{name}.png"))
            tsne_comparison(ori3, syn3, str(out / f"tsne_{name}.png"))
        if save_checkpoints and out:
            from vae_connexe_tpu.utils import save_checkpoint
            save_checkpoint(str(out / "ckpt_csrae"), params)

    elif exp.model_family == "vrae":
        from vae_connexe_tpu.models import VRAE
        from vae_connexe_tpu.models.vrae import exponential_teacher_forcing_schedule
        from vae_connexe_tpu.train import fit_vrae

        model = VRAE(input_dim=exp.p, hidden_dim=exp.hidden,
                     latent_dim=exp.latent, output_activation="tanh")
        params = model.init(k_init)
        params, m = fit_vrae(
            model, params, series, k_run, epochs=100, lr=1e-3, beta=0.5,
            teacher_forcing_schedule=lambda e:
                exponential_teacher_forcing_schedule(e, decay_rate=0.02),
            verbose=verbose, log_fn=log_fn)
        results["train"] = m
        samples = model.sample(params, k_gen, 5, exp.t)
        results["generated_shape"] = list(samples.shape)
        if out:
            np.save(out / f"syn_{name}.npy", np.asarray(samples))
        if save_checkpoints and out:
            from vae_connexe_tpu.utils import save_checkpoint
            save_checkpoint(str(out / "ckpt_vrae"), params)
    else:
        raise ValueError(f"unknown model family {exp.model_family!r}")

    if out:
        (out / f"metrics_{name}.json").write_text(json.dumps(results, indent=2))
    return results
