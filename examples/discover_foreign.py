"""Causal discovery on systems the framework has never seen.

Every committed discovery result so far scores against generators that live
in ``vae_connexe_tpu/data`` — the framework's own zoo.  This demo is the
foreign-data proof: the two generators below exist ONLY in this script,
the series goes to a plain CSV, and discovery runs through the public CLI
exactly as a user would run it on their own measurements:

    python examples/discover_foreign.py --system narma \
        --out-dir results/discover_demo
    python examples/discover_foreign.py --system rossler \
        --out-dir results/discover_demo

which executes

    cli discover <system>.csv --seeds 8 [--generate 256] --out-dir ...

and then — separately, as the demo's scorecard — grades the recovered
graph against the dynamics-true adjacency derived from the equations.
The reference's only answer to threshold choice is a manual sweep against
a KNOWN truth (``/root/reference/CR-VAE.py:437-443``); the point here is
that the stability-selection vote needs no truth, and the truth (which the
CLI never sees) is used only to grade the answer afterwards.

Systems:

- ``narma`` — a sparse network of NARMA-style nonlinear autoregressive
  nodes: each node keeps a 10-step running-mean memory of itself and is
  driven by tanh-saturated lagged inputs from its parents (a directed
  ring + chords) plus private noise:

      x_j(t) = 0.4 x_j(t-1) + 0.3 x_j(t-1) m_j(t-1)
               + 0.8 Σ_{i∈pa(j)} tanh(x_i(t-2)) + 0.1 ε_j(t),
      m_j(t) = mean(x_j(t-9..t))

  Truth: self-loops (every node) + the parent edges.

- ``rossler`` — a ring of K chaotic Rössler oscillators coupled through
  their x components (3K observed variables):

      dx_i/dt = -y_i - z_i + eps (x_{i-1} - x_i)
      dy_i/dt =  x_i + a y_i
      dz_i/dt =  b + z_i (x_i - c)

  Truth per oscillator: x_i ← {x_i, y_i, z_i, x_{i-1}}, y_i ← {x_i, y_i},
  z_i ← {x_i, z_i}.  This one is the committed HARD case: lag-window
  Granger discovery on a smooth slow-fast chaotic flow at these sampling
  rates recovers the graph only partially (scores AUROC ≈ 0.70 across a
  λ/sampling/noise grid — the demo records it rather than hiding it).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A, B, C = 0.2, 0.2, 5.7            # classic chaotic Rössler parameters


# ---------------------------------------------------------------------------
# rossler: ring-coupled chaotic oscillators (continuous flow, RK4)
# ---------------------------------------------------------------------------

def rossler_ring(k: int, t_obs: int, eps: float, dt: float = 0.02,
                 obs_every: int = 5, burn_in: float = 100.0,
                 seed: int = 0) -> np.ndarray:
    """Integrate K ring-coupled Rössler oscillators (RK4, fixed step) and
    return (t_obs, 3K) observations sampled every ``obs_every`` steps."""
    rng = np.random.default_rng(seed)
    state = rng.uniform(-1.0, 1.0, size=(k, 3))
    state[:, 2] += 1.0                              # z > 0 basin

    def rhs(s):
        x, y, z = s[:, 0], s[:, 1], s[:, 2]
        dx = -y - z + eps * (np.roll(x, 1) - x)     # x_{i-1} couples in
        dy = x + A * y
        dz = B + z * (x - C)
        return np.stack([dx, dy, dz], axis=1)

    def rk4(s):
        k1 = rhs(s)
        k2 = rhs(s + 0.5 * dt * k1)
        k3 = rhs(s + 0.5 * dt * k2)
        k4 = rhs(s + dt * k3)
        return s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    for _ in range(int(burn_in / dt)):
        state = rk4(state)
    out = np.empty((t_obs, k, 3), np.float64)
    for t in range(t_obs):
        for _ in range(obs_every):
            state = rk4(state)
        out[t] = state
    # Observation order: x0, y0, z0, x1, y1, z1, ...
    return out.reshape(t_obs, 3 * k).astype(np.float32)


def rossler_truth(k: int) -> np.ndarray:
    """(3K, 3K) adjacency from the equations (row effect <- column cause)."""
    p = 3 * k
    truth = np.zeros((p, p), int)
    for i in range(k):
        x, y, z = 3 * i, 3 * i + 1, 3 * i + 2
        x_prev = 3 * ((i - 1) % k)
        truth[x, [x, y, z, x_prev]] = 1
        truth[y, [x, y]] = 1
        truth[z, [x, z]] = 1
    return truth


# ---------------------------------------------------------------------------
# narma: sparse nonlinear autoregressive network (discrete, noise-driven)
# ---------------------------------------------------------------------------

def narma_adjacency(p: int, seed: int = 0) -> np.ndarray:
    """Directed ring + one chord per node (row effect <- column cause),
    self-loops included (every node is autoregressive)."""
    rng = np.random.default_rng(seed)
    truth = np.eye(p, dtype=int)
    for j in range(p):
        truth[j, (j - 1) % p] = 1                   # ring parent
        chord = int(rng.integers(p))
        if chord not in (j, (j - 1) % p):
            truth[j, chord] = 1                     # occasional chord
    return truth


def narma_network(p: int, t_obs: int, seed: int = 0,
                  burn_in: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Simulate the NARMA-style network; returns (series (T, p), truth).

    Stability by construction: the only unbounded term is the 0.5 linear
    self-recursion (slope < 1); the NARMA product-with-memory term and the
    parent drive are tanh-saturated.
    """
    truth = narma_adjacency(p, seed)
    parents = truth - np.eye(p, dtype=int)          # off-diagonal causes
    rng = np.random.default_rng(seed + 1)
    mem = 10
    x = np.zeros((burn_in + t_obs + 2, p), np.float64)
    x[:2] = 0.1 * rng.standard_normal((2, p))
    for t in range(2, burn_in + t_obs + 2):
        m = x[max(0, t - mem):t].mean(axis=0)
        drive = np.tanh(x[t - 2]) @ parents.T       # Σ_{i∈pa(j)} tanh(x_i)
        x[t] = (0.5 * x[t - 1] + 0.25 * np.tanh(x[t - 1] * m)
                + 0.6 * drive + 0.3 * rng.standard_normal(p))
    return x[burn_in + 2:].astype(np.float32), truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", choices=("narma", "rossler"), default="narma")
    ap.add_argument("--p", type=int, default=10,
                    help="narma: network nodes")
    ap.add_argument("--k", type=int, default=3,
                    help="rossler: oscillators in the ring")
    ap.add_argument("--t", type=int, default=4096, help="observed time steps")
    ap.add_argument("--eps", type=float, default=0.5,
                    help="rossler: ring coupling")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--lam", type=float, default=0.1)
    ap.add_argument("--context", type=int, default=20)
    ap.add_argument("--generate", type=int, default=256)
    ap.add_argument("--diff", action="store_true",
                    help="run discovery on the DIFFERENCED series "
                         "(discover --diff) — the structural lever for the "
                         "Rössler hard case (smooth flow; see "
                         "docs/causal-discovery.md); artifacts get a _diff "
                         "suffix so the baseline rows stay comparable")
    ap.add_argument("--out-dir", default="results/discover_demo")
    args = ap.parse_args()

    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    name = args.system + ("_diff" if args.diff else "")

    # 1. The "user's data": a CSV the framework did not make.
    if args.system == "narma":
        series, truth = narma_network(args.p, args.t)
        names = [f"x{i}" for i in range(args.p)]
    else:
        series = rossler_ring(args.k, args.t, args.eps)
        truth = rossler_truth(args.k)
        names = [f"{c}{i}" for i in range(args.k) for c in ("x", "y", "z")]
    csv = out / f"{name}.csv"
    np.savetxt(csv, series, delimiter=",", header=",".join(names),
               comments="")
    print(f"wrote {csv} shape={series.shape}", file=sys.stderr)

    # 2. Discovery through the public CLI, exactly as a user would run it.
    from vae_connexe_tpu.cli import main as cli_main
    argv = ["discover", str(csv),
            "--seeds", str(args.seeds),
            "--iters", str(args.iters),
            "--lam", str(args.lam),
            "--context", str(args.context),
            "--out-dir", str(out)]
    if args.generate:
        argv += ["--generate", str(args.generate)]
    if args.diff:
        argv += ["--diff"]
    cli_main(argv)

    # 3. Scorecard: grade the truth-blind answer against the equations.
    from vae_connexe_tpu.evals import gc_metrics, vote_confidence
    from vae_connexe_tpu.evals.viz import gc_heatmaps

    gc = np.load(out / f"GC_{name}.npy")
    votes = np.load(out / f"GC_votes_{name}.npy")
    scores = np.load(out / f"GC_scores_{name}.npy")
    grade = {
        "system": name,
        "selected": {k: float(v) for k, v in
                     gc_metrics(truth, gc, 0.5).items()},
        "votes_auroc": float(gc_metrics(truth, votes)["auroc"]),
        "scores_auroc": float(gc_metrics(truth, scores)["auroc"]),
        "n_edges_true": int(truth.sum()),
        "n_edges_selected": int(gc.sum()),
        # The truth-blind distrust signal the CLI reports/warns on —
        # recorded next to the (truth-aware) grade for calibration.
        "confidence": vote_confidence(votes),
    }
    np.save(out / f"truth_{name}.npy", truth)
    gc_heatmaps(truth, gc, str(out / f"truth_vs_selected_{name}.png"))
    with open(out / f"grade_{name}.json", "w") as f:
        json.dump(grade, f, indent=2)
    print(json.dumps(grade, indent=2))


if __name__ == "__main__":
    main()
