"""Multi-process execution: meshed training across real OS process boundaries.

The reference is single-process, single-device by construction
(``/root/reference/author_CRVAE.py:18`` selects one device; no
torch.distributed / NCCL / MPI anywhere — SURVEY.md §2).  The TPU-native
equivalent of a multi-host pod run is multi-controller JAX: every process
calls ``jax.distributed.initialize`` (``parallel/multihost.py``), sees the
GLOBAL device set, builds the same ``Mesh`` over it, and runs the SAME
program; pjit partitions each step over all hosts' devices and the
collectives (gradient psums over dp, head-axis layout over ep) ride the
interconnect — ICI within a slice, DCN/Gloo across hosts.

Two worker bodies run under that model:

- ``_worker_payload_fit`` — the minimal proof harness: a multi-chunk meshed
  ``fit_phase1`` on synthetic data with deterministic keys, asserted
  bitwise-comparable to the single-process fit (``tests/test_multiprocess.py``
  and the driver dry run).
- ``_worker_payload_experiment`` — the FRAMEWORK path: a named experiment
  from ``configs/experiments.py`` (real data generators, real configs)
  through phase 1 → GC handoff → phase 2, with the exact key derivation of
  ``run_experiment`` so the result is comparable params-for-params to the
  single-process ``cli run``.  Composes with mid-phase checkpoint/resume
  (``TrainCheckpointer`` snapshots are collective orbax saves; a killed
  worker set relaunched with ``resume=True`` equals the uninterrupted run).
  Reachable as ``cli run <exp> --processes N``.

``launch_multiprocess_*`` spawn N such workers as OS subprocesses, each with
``devices_per_process`` virtual CPU devices (the same fake-mesh technique the
test suite uses, but with the mesh's dp axis crossing process boundaries).
On a real pod the worker body runs unchanged — one process per host via
``python -m vae_connexe_tpu.parallel.multiprocess '<payload json>'`` with
``force_cpu`` off; only the launcher's env forcing is test scaffolding.
"""

from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys
import tempfile


def _free_port() -> int:
    """Bind-and-release an ephemeral port for the jax.distributed coordinator."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _replicated_host_tree(tree, mesh):
    """All-gather a (possibly cross-process ep-sharded) pytree onto every
    process and materialize it as host numpy — the identity jit's
    out_shardings make XLA insert the cross-process collectives."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    rep_tree = jax.tree.map(lambda _: rep, tree)
    tree = jax.jit(lambda t: t, out_shardings=rep_tree)(tree)
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _worker_payload_fit(payload: dict) -> None:
    """Body of one multi-controller process (after distributed init)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.parallel.mesh import make_mesh
    from vae_connexe_tpu.train import fit_phase1
    from vae_connexe_tpu.train.config import Phase1Config

    p = payload["p"]
    mesh = make_mesh(n_dp=payload["n_dp"], n_ep=payload["n_ep"],
                     devices=jax.devices())
    model = CRVAE(p=p, hidden=payload["hidden"], enc_len=payload["enc_len"])
    cfg = Phase1Config(lam=payload["lam"], lr=payload["lr"],
                       batch_size=payload["batch_size"],
                       max_iter=payload["max_iter"],
                       check_every=payload["check_every"])
    # Deterministic inputs: every process derives the identical windows /
    # params / fit key from the payload seeds, exactly as the single-process
    # fit in the comparing test does.
    windows = jax.random.normal(jax.random.key(payload["data_seed"]),
                                (payload["n_windows"], payload["ctx"], p))
    params = model.init(jax.random.key(payload["init_seed"]))
    parents = jnp.ones((p, p), jnp.float32)

    best, state, metrics = fit_phase1(model, params, windows, parents, cfg,
                                      jax.random.key(payload["fit_seed"]),
                                      mesh=mesh)

    best_host = _replicated_host_tree(best, mesh)
    flat = {f"leaf{i}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(best_host))}
    if jax.process_index() == 0:
        np.savez(payload["out_path"], loss=metrics["loss"], **flat)
    print(f"proc {jax.process_index()}/{jax.process_count()}: "
          f"fit_phase1 {cfg.max_iter} steps over "
          f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"({len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices) loss={metrics['loss']:.5f}", flush=True)


def _worker_payload_experiment(payload: dict) -> None:
    """Run a NAMED experiment (crvae family) multi-controller: phase 1 →
    GC handoff → phase 2 over the global (dp, ep) mesh.

    Mirrors ``configs.experiments.run_experiment``'s key derivation EXACTLY
    (``jax.random.split(jax.random.key(seed), 5)``; phase-2 inits fold
    ``k_init``) so the multi-process run is comparable params-for-params and
    metric-for-metric to the single-process ``cli run``.  Process 0 writes
    ``mp_results.json`` (phase metrics + GC metrics), ``GC_<exp>.npy`` and
    ``mp_params.npz`` (best phase-1 / phase-2 / error-VAE leaves) under
    ``out_dir``.  ``checkpoint_every`` / ``resume`` compose: snapshots are
    collective orbax saves at chunk boundaries, so a killed worker set
    relaunched with ``resume=True`` equals the uninterrupted one.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_connexe_tpu.configs.experiments import _make_dataset, get_experiment
    from vae_connexe_tpu.data import arrange_input
    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.parallel.mesh import make_mesh
    from vae_connexe_tpu.train import fit_phase1, fit_phase2

    exp = get_experiment(payload["experiment"])
    if exp.model_family != "crvae":
        raise ValueError(
            f"--processes supports the crvae family (two-phase meshed "
            f"trainer); {exp.name!r} is {exp.model_family!r}")
    ov = payload.get("overrides") or {}
    if "t" in ov:
        exp = dataclasses.replace(exp, t=int(ov["t"]))
    if "phase1" in ov:
        exp = dataclasses.replace(
            exp, phase1=dataclasses.replace(exp.phase1, **ov["phase1"]))
    if "phase2" in ov:
        exp = dataclasses.replace(
            exp, phase2=dataclasses.replace(exp.phase2, **ov["phase2"]))

    mesh = make_mesh(n_dp=payload["n_dp"], n_ep=payload["n_ep"],
                     devices=jax.devices())
    proc0 = jax.process_index() == 0
    out = pathlib.Path(payload["out_dir"])
    if proc0:
        out.mkdir(parents=True, exist_ok=True)

    # EXACT key derivation of run_experiment (configs/experiments.py).
    key = jax.random.key(payload["seed"])
    k_data, k_init, k_run, k_p2, _k_gen = jax.random.split(key, 5)
    series, truth = _make_dataset(exp, k_data)
    windows, _ = arrange_input(series, exp.context)
    model = CRVAE(p=exp.p, hidden=exp.hidden)
    params = model.init(k_init)
    full = jnp.ones((exp.p, exp.p), jnp.float32)

    def ckpt_kw(phase):
        if not (payload.get("checkpoint_every") or payload.get("resume")):
            return {}
        return {"checkpoint_dir": str(out / f"ckpt_mid_{phase}"),
                "checkpoint_every": payload.get("checkpoint_every") or 0,
                "resume": bool(payload.get("resume"))}

    def kill_cb(phase):
        # Test scaffolding for the kill/resume guarantee: raise AFTER the
        # checkpoint for that chunk boundary landed (stands in for SIGKILL,
        # same technique as tests/test_resume.py).
        at = (payload.get("kill_at") or {}).get(phase)
        if at is None:
            return None

        def cb(step, state, metrics):
            if step >= at:
                raise RuntimeError(f"kill_at[{phase}]={at} reached (test kill)")
        return cb

    best, _, m1 = fit_phase1(model, params, windows, full, exp.phase1, k_run,
                             mesh=mesh, verbose=proc0,
                             callback=kill_cb("phase1"), **ckpt_kw("phase1"))
    best = _replicated_host_tree(best, mesh)
    scores = model.gc(best, threshold=False)
    gc_est = model.gc(best, threshold=True)
    results = {"experiment": exp.name, "seed": payload["seed"],
               "processes": jax.process_count(),
               "mesh": dict(zip(mesh.axis_names,
                                (int(s) for s in mesh.devices.shape))),
               "phase1": m1}
    if truth is not None:
        from vae_connexe_tpu.evals import gc_metrics
        results["gc"] = {k: float(v) for k, v in
                         gc_metrics(truth, scores, exp.gc_threshold).items()}
    arrays = {f"p1_{i}": np.asarray(x)
              for i, x in enumerate(jax.tree.leaves(best))}

    if payload.get("run_phase2", True):
        mask = gc_est.astype(jnp.float32)
        p2_params = model.init(jax.random.fold_in(k_init, 1))
        err_model = ErrorVAE(d=exp.p, hidden=exp.hidden)
        err_params = err_model.init(jax.random.fold_in(k_init, 2))
        best2, err2, _, m2 = fit_phase2(
            model, err_model, p2_params, err_params, windows, mask,
            exp.phase2, k_p2, mesh=mesh, verbose=proc0,
            callback=kill_cb("phase2"), **ckpt_kw("phase2"))
        best2 = _replicated_host_tree(best2, mesh)
        err2 = _replicated_host_tree(err2, mesh)
        results["phase2"] = m2
        arrays.update({f"p2_{i}": np.asarray(x)
                       for i, x in enumerate(jax.tree.leaves(best2))})
        arrays.update({f"err_{i}": np.asarray(x)
                       for i, x in enumerate(jax.tree.leaves(err2))})

    if proc0:
        np.save(out / f"GC_{exp.name}.npy", np.asarray(gc_est))
        np.savez(out / "mp_params.npz", **arrays)
        (out / "mp_results.json").write_text(json.dumps(results))
    print(f"proc {jax.process_index()}/{jax.process_count()}: experiment "
          f"{exp.name} phase1 {exp.phase1.max_iter} steps"
          + (f" + phase2 {exp.phase2.max_iter} steps"
             if payload.get("run_phase2", True) else "")
          + f" over mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"({len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices)", flush=True)


def worker_main(argv: list[str]) -> None:
    """Entry for ``python -m vae_connexe_tpu.parallel.multiprocess <json>``."""
    payload = json.loads(argv[0])
    import jax
    if payload.get("force_cpu"):
        jax.config.update("jax_platforms", "cpu")
    from vae_connexe_tpu.parallel.multihost import initialize_multihost
    initialize_multihost(
        coordinator_address=payload["coordinator_address"],
        num_processes=payload["num_processes"],
        process_id=payload["process_id"])
    if payload.get("mode") == "experiment":
        _worker_payload_experiment(payload)
    else:
        _worker_payload_fit(payload)


def _run_workers(payload: dict, num_processes: int, devices_per_process: int,
                 timeout: float) -> list[str]:
    """Spawn N worker subprocesses on this host (each with
    ``devices_per_process`` virtual CPU devices), wait, and return their
    logs; raises with all logs if any worker fails."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""          # disable axon registration
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_VAE_CONNEXE_DRYRUN_REEXECED", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(num_processes):
        args = json.dumps({**payload, "process_id": pid})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vae_connexe_tpu.parallel.multiprocess",
             args],
            env=env, cwd=repo_root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs, failed = [], []
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            failed.append((pid, "timeout"))
        logs.append(out)
        if proc.returncode != 0:
            failed.append((pid, proc.returncode))
    if failed:
        raise RuntimeError(
            f"multiprocess run failed: {failed}\n" + "\n".join(
                f"--- proc {i} ---\n{log}" for i, log in enumerate(logs)))
    return logs


def launch_multiprocess_fit(num_processes: int = 2,
                            devices_per_process: int = 4,
                            n_dp: int | None = None, n_ep: int = 2,
                            p: int = 4, hidden: int = 16, ctx: int = 12,
                            enc_len: int = 6, n_windows: int = 64,
                            batch_size: int = 8, max_iter: int = 24,
                            check_every: int = 8, lam: float = 0.1,
                            lr: float = 5e-2, data_seed: int = 5,
                            init_seed: int = 6, fit_seed: int = 7,
                            port: int | None = None, timeout: float = 600.0):
    """Spawn ``num_processes`` OS processes running the meshed ``fit_phase1``
    over one global mesh, and return (best-params leaves, final loss, logs).

    The minimal proof harness (synthetic data, phase 1 only) — for the
    framework path running real experiments through both phases, use
    ``launch_multiprocess_experiment`` / ``cli run <exp> --processes N``.
    """
    n_total = num_processes * devices_per_process
    if n_dp is None:
        n_dp = n_total // n_ep
    if port is None:
        port = _free_port()
    out_path = tempfile.mktemp(suffix=".npz", prefix="vae_connexe_mp_")
    payload = dict(coordinator_address=f"localhost:{port}",
                   num_processes=num_processes, force_cpu=True,
                   n_dp=n_dp, n_ep=n_ep, p=p, hidden=hidden, ctx=ctx,
                   enc_len=enc_len, n_windows=n_windows,
                   batch_size=batch_size, max_iter=max_iter,
                   check_every=check_every, lam=lam, lr=lr,
                   data_seed=data_seed, init_seed=init_seed,
                   fit_seed=fit_seed, out_path=out_path)
    logs = _run_workers(payload, num_processes, devices_per_process, timeout)
    import numpy as np
    with np.load(out_path) as data:
        loss = float(data["loss"])
        leaves = [data[f"leaf{i}"] for i in range(len(data.files) - 1)]
    os.unlink(out_path)
    return leaves, loss, logs


def launch_multiprocess_experiment(experiment: str, num_processes: int = 2,
                                   devices_per_process: int = 4,
                                   n_dp: int | None = None, n_ep: int = 1,
                                   seed: int = 0,
                                   overrides: dict | None = None,
                                   run_phase2: bool = True,
                                   out_dir: str | None = None,
                                   checkpoint_every: int | None = None,
                                   resume: bool = False,
                                   kill_at: dict | None = None,
                                   port: int | None = None,
                                   timeout: float = 1800.0):
    """Run a NAMED experiment (crvae family) as ``num_processes``
    cooperating multi-controller workers: phase 1 → GC handoff → phase 2
    over one global (dp, ep) mesh whose dp axis crosses process boundaries.
    The ``cli run <exp> --processes N`` backend.

    Returns ``(results, arrays, logs)``: the metrics dict process 0 wrote
    (same key derivation as the single-process ``run_experiment``, so
    directly comparable), the saved best-params arrays
    (``p1_<i>`` / ``p2_<i>`` / ``err_<i>`` leaves in ``jax.tree.leaves``
    order), and the worker logs.

    ``overrides``: optional JSON-able config deltas —
    ``{"t": int, "phase1": {max_iter/check_every/batch_size...},
    "phase2": {...}}``.  ``checkpoint_every`` / ``resume``: mid-phase
    snapshots under ``out_dir/ckpt_mid_phase{1,2}`` (collective orbax
    saves); a killed worker set relaunched with ``resume=True`` equals the
    uninterrupted run.  ``kill_at``: test scaffolding —
    ``{"phase1": step}`` makes every worker raise after that step's
    checkpoint lands (stands in for preemption).
    """
    n_total = num_processes * devices_per_process
    if n_dp is None:
        n_dp = n_total // n_ep
    if port is None:
        port = _free_port()
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="vae_connexe_mpexp_")
    payload = dict(mode="experiment",
                   coordinator_address=f"localhost:{port}",
                   num_processes=num_processes, force_cpu=True,
                   n_dp=n_dp, n_ep=n_ep, experiment=experiment, seed=seed,
                   overrides=overrides, run_phase2=run_phase2,
                   out_dir=str(out_dir), checkpoint_every=checkpoint_every,
                   resume=resume, kill_at=kill_at)
    logs = _run_workers(payload, num_processes, devices_per_process, timeout)
    import numpy as np
    out = pathlib.Path(out_dir)
    results = json.loads((out / "mp_results.json").read_text())
    with np.load(out / "mp_params.npz") as data:
        arrays = {k: np.asarray(data[k]) for k in data.files}
    return results, arrays, logs


if __name__ == "__main__":
    worker_main(sys.argv[1:])
