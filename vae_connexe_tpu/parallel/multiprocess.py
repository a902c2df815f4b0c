"""Multi-process execution: the meshed fit across real OS process boundaries.

The reference is single-process, single-device by construction
(``/root/reference/author_CRVAE.py:18`` selects one device; no
torch.distributed / NCCL / MPI anywhere — SURVEY.md §2).  The TPU-native
equivalent of a multi-host pod run is multi-controller JAX: every process
calls ``jax.distributed.initialize`` (``parallel/multihost.py``), sees the
GLOBAL device set, builds the same ``Mesh`` over it, and runs the SAME
program; pjit partitions each step over all hosts' devices and the
collectives (gradient psums over dp, head-axis layout over ep) ride the
interconnect — ICI within a slice, DCN/Gloo across hosts.

This module provides both halves needed to *prove* that path without pod
hardware:

- ``worker_main`` — the per-process program: initialize distributed, build
  the global (dp, ep) mesh, run a multi-chunk meshed ``fit_phase1`` (and
  optionally ``fit_phase2``) with deterministic keys, all-gather the best
  params to every host, and have process 0 write them to an ``.npz``.
- ``launch_multiprocess_fit`` — spawn N such workers as OS subprocesses,
  each with 8//N virtual CPU devices (the same fake-mesh technique the
  test suite uses, but now with the mesh's dp axis crossing process
  boundaries), wait, and return process 0's result.

The launched fit is asserted bitwise-comparable (same keys, same gathers)
to the single-process fit in ``tests/test_multiprocess.py`` and in the
driver dry run (``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile


def _free_port() -> int:
    """Bind-and-release an ephemeral port for the jax.distributed coordinator."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_payload_fit(payload: dict) -> None:
    """Body of one multi-controller process (after distributed init)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

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

    # Replicate the (ep-sharded) best params onto every process so each can
    # materialize them on the host; the identity jit's out_shardings makes
    # XLA insert the cross-process all-gather.
    rep = NamedSharding(mesh, P())
    rep_tree = jax.tree.map(lambda _: rep, best)
    best_rep = jax.jit(lambda t: t, out_shardings=rep_tree)(best)
    flat = {f"leaf{i}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(best_rep))}
    if jax.process_index() == 0:
        np.savez(payload["out_path"], loss=metrics["loss"], **flat)
    print(f"proc {jax.process_index()}/{jax.process_count()}: "
          f"fit_phase1 {cfg.max_iter} steps over "
          f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"({len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices) loss={metrics['loss']:.5f}", flush=True)


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
    _worker_payload_fit(payload)


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

    Each worker gets ``devices_per_process`` virtual CPU devices; the global
    mesh is (n_dp, n_ep) over ``num_processes * devices_per_process`` devices
    with dp spanning the process boundary.  On a real pod the same worker
    body runs unchanged — only the env forcing differs.
    """
    n_total = num_processes * devices_per_process
    if n_dp is None:
        n_dp = n_total // n_ep
    if port is None:
        port = _free_port()
    out_path = tempfile.mktemp(suffix=".npz", prefix="vae_connexe_mp_")
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""          # disable axon registration
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_VAE_CONNEXE_DRYRUN_REEXECED", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    payload = dict(coordinator_address=f"localhost:{port}",
                   num_processes=num_processes, force_cpu=True,
                   n_dp=n_dp, n_ep=n_ep, p=p, hidden=hidden, ctx=ctx,
                   enc_len=enc_len, n_windows=n_windows,
                   batch_size=batch_size, max_iter=max_iter,
                   check_every=check_every, lam=lam, lr=lr,
                   data_seed=data_seed, init_seed=init_seed,
                   fit_seed=fit_seed, out_path=out_path)
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
            f"multiprocess fit failed: {failed}\n" + "\n".join(
                f"--- proc {i} ---\n{log}" for i, log in enumerate(logs)))
    import numpy as np
    with np.load(out_path) as data:
        loss = float(data["loss"])
        leaves = [data[f"leaf{i}"] for i in range(len(data.files) - 1)]
    os.unlink(out_path)
    return leaves, loss, logs


if __name__ == "__main__":
    worker_main(sys.argv[1:])
