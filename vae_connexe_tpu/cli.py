"""Command-line interface — the L6 layer the reference lacks.

Subcommands:
  run        execute a named experiment end to end (train + eval + artifacts)
  list       show available experiments
  discover   Granger-causal discovery on YOUR data (.npy/.csv/...)
  sweep      vmapped multi-seed phase-1 causal-discovery sweep
  eval       evaluate / generate from a saved checkpoint
  export     phase-2 checkpoint -> self-contained StableHLO serving artifact
  generate   sample from an exported artifact (no model code needed)
  serve      HTTP serving daemon for an exported artifact
  bench      the headline throughput benchmark (same as repo-root bench.py)

Examples:
  python -m vae_connexe_tpu.cli list
  python -m vae_connexe_tpu.cli run lorenz96_crvae --iters 500 --no-phase2
  python -m vae_connexe_tpu.cli run lorenz96_xl --mesh --ep 2   # sharded fit
  python -m vae_connexe_tpu.cli discover my_series.csv --seeds 8 --out-dir out/
  python -m vae_connexe_tpu.cli sweep --p 10 --seeds 8 --iters 1000
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_list(args):
    from vae_connexe_tpu.configs import EXPERIMENTS

    for name, exp in sorted(EXPERIMENTS.items()):
        print(f"{name:20s} family={exp.model_family:6s} dataset={exp.dataset:14s} "
              f"p={exp.p} hidden={exp.hidden} {exp.notes}")


def _cmd_run(args):
    from vae_connexe_tpu.configs import run_experiment

    if args.debug_nans:
        from vae_connexe_tpu.utils import enable_nan_debugging

        enable_nan_debugging()

    if args.processes:
        # Multi-controller execution: N cooperating OS processes, one global
        # (dp, ep) mesh with dp crossing the process boundaries — the pod
        # programming model (one process per host on real hardware).
        from vae_connexe_tpu.parallel.multiprocess import (
            launch_multiprocess_experiment)

        unsupported = [flag for flag, on in (
            ("--mesh", args.mesh), ("--out-of-core", args.out_of_core),
            ("--save-checkpoints", args.save_checkpoints),
            ("--artifacts-every", bool(args.artifacts_every)),
            ("--sp", args.sp > 1)) if on]
        if unsupported:
            sys.exit(f"--processes implies a meshed fit and composes with "
                     f"--ep/--iters/--checkpoint-every/--resume/--no-phase2; "
                     f"{' '.join(unsupported)} not supported multi-process")
        if (args.checkpoint_every or args.resume) and not args.out_dir:
            sys.exit("--checkpoint-every/--resume require --out-dir")
        overrides = None
        if args.iters is not None:
            overrides = {"phase1": {"max_iter": args.iters},
                         "phase2": {"max_iter": args.iters}}
        results, _, _ = launch_multiprocess_experiment(
            args.experiment, num_processes=args.processes,
            devices_per_process=(args.devices_per_process
                                 or max(1, 8 // args.processes)),
            n_ep=args.ep, seed=args.seed, overrides=overrides,
            run_phase2=not args.no_phase2, out_dir=args.out_dir,
            checkpoint_every=args.checkpoint_every, resume=args.resume)
        print(json.dumps(results, indent=2, default=str))
        return

    overrides = {}
    if args.iters is not None:
        from vae_connexe_tpu.configs import get_experiment
        import dataclasses
        exp = get_experiment(args.experiment)
        overrides["phase1"] = dataclasses.replace(exp.phase1, max_iter=args.iters)
        overrides["phase2"] = dataclasses.replace(exp.phase2, max_iter=args.iters)
        overrides["win"] = dataclasses.replace(
            exp.win, stage1_epochs=max(1, args.iters // 10),
            stage2_epochs=max(1, args.iters // 20))
    mesh = None
    if args.mesh:
        from vae_connexe_tpu.parallel import make_mesh

        mesh = make_mesh(n_ep=args.ep, n_sp=args.sp)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
              file=sys.stderr)
    results = run_experiment(args.experiment, seed=args.seed,
                             out_dir=args.out_dir, overrides=overrides or None,
                             run_phase2=not args.no_phase2,
                             save_checkpoints=args.save_checkpoints,
                             artifacts_every=args.artifacts_every,
                             mesh=mesh,
                             out_of_core=args.out_of_core,
                             checkpoint_every=args.checkpoint_every,
                             resume=args.resume,
                             verbose=not args.quiet)
    print(json.dumps(results, indent=2, default=str))


def _cmd_sweep(args):
    import jax.numpy as jnp

    from vae_connexe_tpu.data import arrange_input, lorenz96, lorenz96_truth
    from vae_connexe_tpu.evals import auroc
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.parallel import make_mesh, sweep_phase1
    from vae_connexe_tpu.train import Phase1Config
    import jax

    series = lorenz96(jax.random.key(args.seed), p=args.p, t=args.t)
    windows, _ = arrange_input(series, args.context)
    model = CRVAE(p=args.p, hidden=args.hidden)
    cfg = Phase1Config(lam=args.lam, lr=5e-2, max_iter=args.iters,
                       batch_size=args.batch)
    mesh = make_mesh() if args.mesh else None
    seeds = jnp.arange(args.seeds)
    out = sweep_phase1(model, windows, jnp.ones((args.p, args.p)), cfg,
                       seeds, mesh=mesh)
    truth = lorenz96_truth(args.p)
    aurocs = [float(auroc(truth, out["gc_scores"][i])) for i in range(args.seeds)]
    from vae_connexe_tpu.evals import gc_metrics, stability_selection

    min_frac = "auto" if args.min_frac == "auto" else float(args.min_frac)
    votes, selected, min_frac = stability_selection(out["gc_scores"],
                                                    min_frac=min_frac)
    stab = gc_metrics(truth, votes, min_frac - 1e-9)
    print(json.dumps({
        "seeds": args.seeds,
        "aurocs": aurocs,
        "auroc_mean": sum(aurocs) / len(aurocs),
        "mean_loss": [float(x) for x in out["mean_loss"]],
        "stability_min_frac": min_frac,
        "stability_selection": {k: float(v) for k, v in stab.items()},
    }, indent=2))


def _cmd_discover(args):
    """Granger-causal discovery on a user-supplied series file."""
    import pathlib

    import numpy as np

    from vae_connexe_tpu.data.io import load_series
    from vae_connexe_tpu.discover import discover

    shape = tuple(args.shape) if args.shape else None
    series, names = load_series(args.data, shape=shape,
                                delimiter=args.delimiter)
    threshold = args.threshold if args.threshold == "auto" \
        else float(args.threshold)
    min_frac = args.min_frac if args.min_frac == "auto" \
        else float(args.min_frac)
    mesh = None
    if args.mesh:
        from vae_connexe_tpu.parallel import make_mesh

        mesh = make_mesh(n_ep=args.ep)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
              file=sys.stderr)
    res = discover(series, context=args.context, hidden=args.hidden,
                   enc_len=args.enc_len,
                   lam=args.lam, lr=args.lr, max_iter=args.iters,
                   batch_size=args.batch, seeds=args.seeds, seed=args.seed,
                   threshold=threshold, min_frac=min_frac,
                   standardize=not args.no_standardize, diff=args.diff,
                   family=args.family, prox=args.prox, latent=args.latent,
                   generate=args.generate, phase2_iters=args.phase2_iters,
                   names=names, mesh=mesh, verbose=not args.quiet,
                   log_fn=lambda *a: print(*a, file=sys.stderr))

    summary = {
        "data": args.data,
        "shape": list(series.shape),
        "variables": names,
        "family": args.family,
        "seeds": args.seeds,
        "threshold": res.threshold,
        "confidence": res.confidence,
        "n_edges": int(res.gc.sum()),
        "edges": [{"cause": c, "effect": e, "score": s}
                  for c, e, s in res.edges()],
        "metrics": res.metrics,
    }
    if res.confidence is not None and res.confidence < 0.5:
        p_vars = res.gc.shape[0]
        off = int(res.gc.sum()) - int(res.gc.diagonal().sum())
        print(f"WARNING: low discovery confidence "
              f"({res.confidence:.2f} < 0.5) — the seed ensemble rules out "
              f"only {100 * res.confidence:.0f}% of candidate edges "
              f"({off}/{p_vars * (p_vars - 1)} off-diagonal edges selected). "
              f"Either the system is genuinely dense or the lag-window "
              f"estimator cannot discriminate (typical for smooth, densely "
              f"sampled flows). Treat the graph as exploratory; try --diff "
              f"(differenced series), a larger --lam, or a longer "
              f"--context.", file=sys.stderr)
    if args.out_dir:
        out = pathlib.Path(args.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        stem = pathlib.Path(args.data).stem
        np.save(out / f"GC_{stem}.npy", res.gc)
        np.save(out / f"GC_scores_{stem}.npy", res.scores)
        if res.votes is not None:
            np.save(out / f"GC_votes_{stem}.npy", res.votes)
        if res.samples is not None:
            np.save(out / f"generated_{stem}.npy", res.samples)
        from vae_connexe_tpu.evals.viz import discovery_heatmap

        fig = out / f"discovery_{stem}.png"
        discovery_heatmap(res.scores, res.gc, str(fig), names=names,
                          threshold=res.threshold)
        with open(out / f"discovery_{stem}.json", "w") as f:
            json.dump(summary, f, indent=2)
        summary["artifacts"] = str(out)
    print(json.dumps(summary, indent=2))


def _cmd_eval(args):
    """Load a phase-1 checkpoint and re-evaluate / generate without training."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_connexe_tpu.configs import get_experiment
    from vae_connexe_tpu.configs.experiments import _make_dataset, _sweep
    from vae_connexe_tpu.evals import gc_metrics
    from vae_connexe_tpu.models import CRVAE, WInCRVAE
    from vae_connexe_tpu.utils import load_gc, restore_checkpoint

    exp = get_experiment(args.experiment)
    results = {"experiment": args.experiment, "checkpoint": args.checkpoint}
    series, truth = _make_dataset(exp, jax.random.key(args.seed))

    if exp.model_family == "crvae":
        model = CRVAE(p=exp.p, hidden=exp.hidden)
        params = restore_checkpoint(args.checkpoint,
                                    model.init(jax.random.key(0)))
        gc = jnp.asarray(load_gc(args.checkpoint), jnp.float32)
        scores = model.gc(params, parents=gc, threshold=False)
        if args.generate:
            roll = model.rollout(params, jax.random.key(args.seed + 1),
                                 args.generate, parents=gc)
    elif exp.model_family == "win":
        model = WInCRVAE(d=exp.p, hidden=exp.hidden, latent=exp.latent,
                         tau=exp.tau)
        params = restore_checkpoint(args.checkpoint,
                                    model.init(jax.random.key(0)))
        scores = model.granger_matrix(params, threshold=False)
        if args.generate:
            if series.ndim == 2:
                ctx = series[None, : 2 * exp.tau, :]
            else:
                ctx = series[:1, : 2 * exp.tau, :]
            ctx = jnp.broadcast_to(ctx, (args.generate,) + ctx.shape[1:])
            roll = model.generate(params, ctx, jax.random.key(args.seed + 1), 20)
    elif exp.model_family == "vrae":
        from vae_connexe_tpu.models import VRAE

        model = VRAE(input_dim=exp.p, hidden_dim=exp.hidden,
                     latent_dim=exp.latent, output_activation="tanh")
        params = restore_checkpoint(args.checkpoint,
                                    model.init(jax.random.key(0)))
        scores = truth = None   # no causal graph for the plain VRAE
        if args.generate:
            roll = model.sample(params, jax.random.key(args.seed + 1),
                                args.generate, exp.t)
    elif exp.model_family == "csrae":
        from vae_connexe_tpu.configs.experiments import (
            csrae_eval_metrics,
            make_csrae_inputs,
        )

        x, model = make_csrae_inputs(exp, series)
        params = restore_checkpoint(args.checkpoint,
                                    model.init(jax.random.key(0)))
        scores = truth = None   # no causal graph for the CS-RAE
        results.update(csrae_eval_metrics(model, params, x,
                                          jax.random.key(args.seed)))
        if args.generate:
            roll = model.sample(params, jax.random.key(args.seed + 1),
                                args.generate)
    else:
        sys.exit(f"eval does not support the {exp.model_family!r} family")

    if truth is not None:
        results["gc"] = {k: float(v) for k, v in
                         gc_metrics(truth, scores, exp.gc_threshold).items()}
        results["threshold_sweep"] = _sweep(truth, scores)
    if args.generate:
        results["generated_shape"] = list(roll.shape)
        if args.out:
            np.save(args.out, np.asarray(roll))
            results["saved"] = args.out
    print(json.dumps(results, indent=2))


def _cmd_export(args):
    """Export a phase-2 checkpoint as a self-contained serving artifact."""
    import pathlib

    import jax

    from vae_connexe_tpu.configs import get_experiment
    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.serving import export_generator
    from vae_connexe_tpu.utils import restore_checkpoint

    exp = get_experiment(args.experiment)
    if exp.model_family == "crvae":
        model = CRVAE(p=exp.p, hidden=exp.hidden)
        err_model = ErrorVAE(d=exp.p, hidden=exp.hidden)
        target = {"crvae": model.init(jax.random.key(0)),
                  "error_vae": err_model.init(jax.random.key(0))}
        ckpt = restore_checkpoint(args.checkpoint, target)
        blob = export_generator(model, err_model, ckpt["crvae"],
                                ckpt["error_vae"], batch=args.batch,
                                length=args.length,
                                platforms=args.platforms,
                                serve_dtype=args.serve_dtype,
                                kernel=args.serve_kernel)
    elif exp.model_family == "win":
        from vae_connexe_tpu.models import WInCRVAE
        from vae_connexe_tpu.serving import export_win_generator

        if args.serve_kernel != "lax":
            sys.exit(f"--serve-kernel {args.serve_kernel!r} is not supported "
                     f"for the win family (context-conditioned export has no "
                     f"fused kernel); use the default 'lax'")
        model = WInCRVAE(d=exp.p, hidden=exp.hidden, latent=exp.latent,
                         tau=exp.tau)
        params = restore_checkpoint(args.checkpoint,
                                    model.init(jax.random.key(0)))
        blob = export_win_generator(model, params, batch=args.batch,
                                    length=args.length or 21,
                                    platforms=args.platforms,
                                    serve_dtype=args.serve_dtype)
    else:
        sys.exit(f"export supports the crvae and win families; "
                 f"{args.experiment!r} is {exp.model_family!r}")
    pathlib.Path(args.out).write_bytes(blob)
    print(json.dumps({"artifact": args.out, "bytes": len(blob),
                      "batch": args.batch,
                      "platforms": args.platforms or ["default"]}, indent=2))


def _cmd_serve(args):
    """Run the HTTP serving daemon on one or more exported artifacts."""
    from vae_connexe_tpu.server import GeneratorServer

    arts = args.artifact if len(args.artifact) > 1 else args.artifact[0]
    srv = GeneratorServer(arts, host=args.host, port=args.port)
    print(json.dumps({"serving": args.artifact, "host": srv.host,
                      "port": srv.port, "batch": srv.meta["batch"],
                      "routes": sorted(srv._artifacts),
                      "serve_dtype": srv.meta.get("serve_dtype", "float32"),
                      "warmup_s": round(srv._warmup_s, 3)}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


def _cmd_generate(args):
    """Sample from an exported serving artifact (no model code needed)."""
    import numpy as np

    from vae_connexe_tpu.serving import load_generator

    fn, meta = load_generator(args.artifact)
    if meta["kind"] == "win_conditioned_generator":
        if not args.context:
            sys.exit("this artifact is context-conditioned; pass --context "
                     "ctx.npy of shape (batch, >=tau, p)")
        ctx = np.load(args.context)
        samples = fn(args.seed, ctx[:, -meta["tau"]:, :])
    else:
        samples = fn(args.seed)
    result = {"artifact": args.artifact, "meta": meta, "seed": args.seed,
              "shape": list(samples.shape)}
    if args.out:
        np.save(args.out, samples)
        result["saved"] = args.out
    print(json.dumps(result, indent=2))


def _cmd_bench(args):
    import pathlib
    import runpy

    import vae_connexe_tpu

    bench = pathlib.Path(vae_connexe_tpu.__file__).resolve().parent.parent / "bench.py"
    if not bench.exists():
        sys.exit(f"bench.py not found at {bench} — run from a source checkout "
                 "(the benchmark script lives at the repo root, not in the "
                 "installed package)")
    sys.argv = [str(bench)] + (["--quick"] if args.quick else [])
    runpy.run_path(str(bench), run_name="__main__")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vae_connexe_tpu",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list experiments").set_defaults(fn=_cmd_list)

    p_run = sub.add_parser("run", help="run a named experiment")
    p_run.add_argument("experiment")
    p_run.add_argument("--seed", type=int, default=0)
    p_run.add_argument("--out-dir", default=None)
    p_run.add_argument("--iters", type=int, default=None,
                       help="override phase iteration counts (smoke runs)")
    p_run.add_argument("--no-phase2", action="store_true")
    p_run.add_argument("--save-checkpoints", action="store_true",
                       help="write orbax checkpoints (+GC companion) to --out-dir")
    p_run.add_argument("--checkpoint-every", type=int, default=None,
                       dest="checkpoint_every", metavar="N",
                       help="snapshot the full mid-phase training state "
                            "every N steps under --out-dir (crvae family); "
                            "a killed run restarts with --resume, bitwise "
                            "equal to the uninterrupted run")
    p_run.add_argument("--resume", action="store_true",
                       help="restore the latest mid-phase checkpoint under "
                            "--out-dir and continue (completed phases are "
                            "pure restores); composes with --mesh and "
                            "--out-of-core")
    p_run.add_argument("--artifacts-every", type=int, default=None,
                       help="phase-2: save samples + PCA/trajectory plots "
                            "every N iterations (needs --out-dir)")
    p_run.add_argument("--mesh", action="store_true",
                       help="train both phases sharded over all devices "
                            "(batch over dp, decoder heads over ep; "
                            "crvae family)")
    p_run.add_argument("--debug-nans", action="store_true", dest="debug_nans",
                       help="trap the first NaN/Inf inside jitted code "
                            "(jax_debug_nans; reruns the offending op "
                            "un-jitted for a precise traceback)")
    p_run.add_argument("--out-of-core", action="store_true",
                       dest="out_of_core",
                       help="stream minibatches from a disk-backed series "
                            "via the native C++ window loader (crvae "
                            "family); training is bitwise the in-memory run; "
                            "composes with --mesh (chunks land dp-sharded)")
    p_run.add_argument("--ep", type=int, default=1,
                       help="ep (head-parallel) mesh size for --mesh; "
                            "dp = n_devices / (ep * sp)")
    p_run.add_argument("--sp", type=int, default=1,
                       help="sp (sequence-parallel) mesh size for --mesh: "
                            "the decode recurrence's time axis shards over "
                            "sp devices, hidden state handed over ICI "
                            "(long-decode configs; requires (context - "
                            "enc_len) divisible by sp and ep=1)")
    p_run.add_argument("--processes", type=int, default=None, metavar="N",
                       help="run the experiment as N cooperating "
                            "multi-controller processes (jax.distributed) "
                            "over ONE global mesh — phase 1 → GC handoff → "
                            "phase 2, results equal to the single-process "
                            "run; composes with --ep, --iters, "
                            "--checkpoint-every and --resume (a killed "
                            "worker set resumes at the last snapshot); "
                            "crvae family")
    p_run.add_argument("--devices-per-process", type=int, default=None,
                       dest="devices_per_process", metavar="M",
                       help="virtual CPU devices per worker for --processes "
                            "(default 8 // N; on a real pod run one worker "
                            "per host via python -m "
                            "vae_connexe_tpu.parallel.multiprocess instead)")
    p_run.add_argument("--quiet", action="store_true")
    p_run.set_defaults(fn=_cmd_run)

    p_sw = sub.add_parser("sweep", help="multi-seed causal-discovery sweep")
    p_sw.add_argument("--p", type=int, default=10)
    p_sw.add_argument("--t", type=int, default=2048)
    p_sw.add_argument("--context", type=int, default=20)
    p_sw.add_argument("--hidden", type=int, default=64)
    p_sw.add_argument("--batch", type=int, default=256)
    p_sw.add_argument("--lam", type=float, default=0.1)
    p_sw.add_argument("--iters", type=int, default=1000)
    p_sw.add_argument("--seeds", type=int, default=8)
    p_sw.add_argument("--seed", type=int, default=0, help="data seed")
    p_sw.add_argument("--min-frac", default="0.5", dest="min_frac",
                      help="stability-selection vote threshold in [0,1], or "
                           "'auto' (largest vote-spectrum gap, clamped to "
                           "[0.5, 0.95])")
    p_sw.add_argument("--mesh", action="store_true",
                      help="shard the seed axis over the device mesh")
    p_sw.set_defaults(fn=_cmd_sweep)

    p_d = sub.add_parser(
        "discover",
        help="Granger-causal discovery on YOUR time series "
             "(.npy/.npz/.csv/.tsv/.txt/raw-f32)")
    p_d.add_argument("data", help="series file: rows = time steps, columns "
                                  "= variables; (T, p) or (N, T, p)")
    p_d.add_argument("--context", type=int, default=20,
                     help="lag window length (how far back causes may act)")
    p_d.add_argument("--hidden", type=int, default=64)
    p_d.add_argument("--enc-len", type=int, default=None, dest="enc_len",
                     help="encoder read length per window "
                          "(default: context // 2)")
    p_d.add_argument("--lam", type=float, default=0.1,
                     help="group-lasso strength; larger = sparser graph")
    p_d.add_argument("--lr", type=float, default=None,
                     help="learning rate (default per family)")
    p_d.add_argument("--family", choices=("crvae", "win"), default="crvae",
                     help="causal parameterization: crvae = GRU input-"
                          "weight column groups (flagship); win = explicit "
                          "per-head W_in matrix")
    p_d.add_argument("--prox", choices=("row", "element"), default=None,
                     help="win family's sparsity groups (default row)")
    p_d.add_argument("--latent", type=int, default=32,
                     help="win family's latent width")
    p_d.add_argument("--iters", type=int, default=2000)
    p_d.add_argument("--batch", type=int, default=256)
    p_d.add_argument("--seeds", type=int, default=1,
                     help=">1: vmapped multi-seed sweep + stability-"
                          "selection voting instead of a single-run "
                          "threshold")
    p_d.add_argument("--seed", type=int, default=0)
    p_d.add_argument("--threshold", default="auto",
                     help="score threshold (seeds=1): float or 'auto'")
    p_d.add_argument("--min-frac", default="auto", dest="min_frac",
                     help="vote threshold (seeds>1): float in [0,1] or 'auto'")
    p_d.add_argument("--no-standardize", action="store_true",
                     dest="no_standardize",
                     help="skip per-variable z-scoring of the input")
    p_d.add_argument("--diff", action="store_true",
                     help="first-difference the series along time before "
                          "standardizing (discrete-derivative proxy) — the "
                          "structural lever for smooth densely-sampled "
                          "flows where discovery reads confidently dense "
                          "(low confidence warning)")
    p_d.add_argument("--generate", type=int, default=0, metavar="BATCH",
                     help="also train phase 2 on the selected graph and "
                          "sample BATCH synthetic rollouts")
    p_d.add_argument("--phase2-iters", type=int, default=None,
                     dest="phase2_iters")
    p_d.add_argument("--shape", type=int, nargs="+", default=None,
                     help="shape for raw float32 files, e.g. --shape 8192 20")
    p_d.add_argument("--delimiter", default=None,
                     help="text-file delimiter override")
    p_d.add_argument("--out-dir", default=None,
                     help="write GC/scores/votes .npy, the discovery "
                          "heatmap and a JSON summary here")
    p_d.add_argument("--mesh", action="store_true",
                     help="shard over all devices (batch over dp — or the "
                          "seed axis when --seeds > 1)")
    p_d.add_argument("--ep", type=int, default=1)
    p_d.add_argument("--quiet", action="store_true")
    p_d.set_defaults(fn=_cmd_discover)

    p_e = sub.add_parser("eval", help="evaluate / generate from a checkpoint")
    p_e.add_argument("experiment", help="experiment name (model geometry)")
    p_e.add_argument("checkpoint", help="path written by run --save-checkpoints")
    p_e.add_argument("--seed", type=int, default=0)
    p_e.add_argument("--generate", type=int, default=0, metavar="BATCH",
                     help="also sample BATCH free-running rollouts")
    p_e.add_argument("--out", default=None, help=".npy path for samples")
    p_e.set_defaults(fn=_cmd_eval)

    p_x = sub.add_parser("export", help="export a phase-2 checkpoint as a "
                                        "self-contained StableHLO artifact")
    p_x.add_argument("experiment", help="experiment name (model geometry)")
    p_x.add_argument("checkpoint", help="ckpt_phase2 dir from run "
                                        "--save-checkpoints")
    p_x.add_argument("--out", required=True, help="artifact path (.vcx)")
    p_x.add_argument("--batch", type=int, default=64,
                     help="rollouts per call (baked into the artifact)")
    p_x.add_argument("--length", type=int, default=None,
                     help="rollout length override")
    p_x.add_argument("--platforms", nargs="+", default=None,
                     help="lowering targets, e.g. --platforms cpu tpu")
    p_x.add_argument("--serve-dtype", choices=["float32", "bfloat16"],
                     default=None,
                     help="bake reduced serving precision into the "
                          "artifact (bfloat16 halves the rollout's VMEM "
                          "working set; output stays float32)")
    p_x.add_argument("--serve-kernel", choices=["auto", "lax", "fused"],
                     default="lax",
                     help="crvae family: rollout kernel to bake — fused = "
                          "the Pallas chain (single-stream latency winner "
                          "at batch <= 8, f32, TPU-only lowering); auto = "
                          "fused iff the batch is under the measured "
                          "crossover; default lax = portable throughput "
                          "path")
    p_x.set_defaults(fn=_cmd_export)

    p_g = sub.add_parser("generate", help="sample from an exported artifact")
    p_g.add_argument("artifact", help=".vcx path from cli export")
    p_g.add_argument("--seed", type=int, default=0)
    p_g.add_argument("--out", default=None, help=".npy path for samples")
    p_g.add_argument("--context", default=None,
                     help=".npy context windows (batch, >=tau, p) for "
                          "context-conditioned (win-family) artifacts")
    p_g.set_defaults(fn=_cmd_generate)

    p_s = sub.add_parser("serve", help="HTTP serving daemon for exported "
                                       "artifacts (GET /healthz /artifacts "
                                       "/meta[/<name>], POST "
                                       "/generate[/<name>] with optional "
                                       "n_samples)")
    p_s.add_argument("artifact", nargs="+",
                     help=".vcx path(s) from cli export; the first is the "
                          "default route, each is also served at "
                          "/generate/<file-stem>")
    p_s.add_argument("--host", default="127.0.0.1")
    p_s.add_argument("--port", type=int, default=8799)
    p_s.set_defaults(fn=_cmd_serve)

    p_b = sub.add_parser("bench", help="headline throughput benchmark")
    p_b.add_argument("--quick", action="store_true")
    p_b.set_defaults(fn=_cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
