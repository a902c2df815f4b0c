"""Measure the PyTorch reference's CPU training throughput.

The upstream repo (anonyme-Zheng/VAE-connexe) publishes no benchmark numbers
(its README is one line), so the comparison anchor for BASELINE.md must be
measured.  This script reproduces the reference workload *behaviorally*
(CRVAE phase-1 on Lorenz-96: `/root/reference/CRVAE_lorenz96.py:737-774`,
batch=256, ctx=20, hidden=64, lam=0.1, lr=5e-2, manual SGD + group-lasso
proximal update) with an independent, minimal torch implementation, times a
few hundred iterations on CPU, and prints steps/sec.

Run:  python benchmarks/torch_reference_baseline.py [--p 10] [--iters 100]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn


def lorenz96_series(p: int, T: int, F: float = 10.0, dt: float = 0.1,
                    sd: float = 0.1, burn_in: int = 1000, seed: int = 0) -> np.ndarray:
    """Lorenz-96 trajectory via fixed-step RK4, standardized per variable.

    Mirrors the reference generator (`CRVAE_lorenz96.py:700-728`) which uses
    scipy.integrate.odeint on a uniform dt=0.1 grid; RK4 on the same grid is
    an equivalent uniform-step integration and keeps this script dependency
    light.  Returns (T, p) float32.
    """
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=0.01, size=p)

    def rhs(x):
        return (np.roll(x, -1) - np.roll(x, 2)) * np.roll(x, 1) - x + F

    out = np.empty((burn_in + T, p))
    for t in range(burn_in + T):
        k1 = rhs(x)
        k2 = rhs(x + 0.5 * dt * k1)
        k3 = rhs(x + 0.5 * dt * k2)
        k4 = rhs(x + dt * k3)
        x = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        out[t] = x
    out += rng.normal(scale=sd, size=out.shape)
    series = out[burn_in:]
    series = (series - series.mean(0)) / (series.std(0) + 1e-8)
    return series.astype(np.float32)


class HeadGRU(nn.Module):
    """One per-variable decoder head: GRU(p -> H) + Linear(H -> 1)."""

    def __init__(self, p: int, hidden: int):
        super().__init__()
        self.gru = nn.GRU(p, hidden, batch_first=True)
        self.out = nn.Linear(hidden, 1)

    def forward(self, x, h0):
        seq, h = self.gru(x, h0)
        return self.out(seq), h


class TorchCRVAE(nn.Module):
    """Minimal reference-equivalent CRVAE (encoder + p GRU heads)."""

    def __init__(self, p: int, hidden: int):
        super().__init__()
        self.p, self.hidden = p, hidden
        self.enc = nn.GRU(p, hidden, batch_first=True)
        self.fc_mu = nn.Linear(hidden, hidden)
        self.fc_std = nn.Linear(hidden, hidden)
        self.heads = nn.ModuleList(HeadGRU(p, hidden) for _ in range(p))

    def forward(self, X):
        # X: (B, T, p).  Encoder sees the first 10 steps; decoder input is
        # teacher-forced [0, X[:,10:T-1]]; targets are X[:, 10:].
        B = X.shape[0]
        h0 = torch.zeros(1, B, self.hidden)
        _, h = self.enc(X[:, :10, :], h0)
        mu, logvar = self.fc_mu(h), self.fc_std(h)
        z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        dec_in = torch.cat([torch.zeros_like(X[:, :1, :]), X[:, 10:-1, :]], 1)
        preds = [head(dec_in, z)[0] for head in self.heads]
        return preds, mu, logvar


def prox_group_columns(W: torch.Tensor, lam: float, lr: float) -> torch.Tensor:
    norm = W.norm(dim=0, keepdim=True)
    return (W / norm.clamp(min=lam * lr)) * (norm - lam * lr).clamp(min=0.0)


def lorenz96_truth(p: int) -> np.ndarray:
    """Circulant ground-truth GC matrix (`CRVAE_lorenz96.py:756-764`):
    row i depends on columns i, i-1, i-2, i+1 (mod p)."""
    gc = np.zeros((p, p), dtype=int)
    for i in range(p):
        for j in (i, (i - 1) % p, (i - 2) % p, (i + 1) % p):
            gc[i, j] = 1
    return gc


def score_gc(gc_true: np.ndarray, scores: np.ndarray) -> dict:
    """AUROC on the raw column norms + binary metrics on norm > 0 (the
    reference's `GC(threshold=True)`, `CRVAE_lorenz96.py:297-302`)."""
    from sklearn.metrics import roc_auc_score

    est = (scores > 0).astype(int)
    t, e = gc_true.ravel(), est.ravel()
    tp = int(((t == 1) & (e == 1)).sum())
    fp = int(((t == 0) & (e == 1)).sum())
    fn = int(((t == 1) & (e == 0)).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        "auroc": float(roc_auc_score(t, scores.ravel())),
        "accuracy": float((t == e).mean()),
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / max(precision + recall, 1e-12),
        "variable_usage": float(est.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=10)
    ap.add_argument("--T", type=int, default=2048)
    ap.add_argument("--context", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lam", type=float, default=0.1)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--full", action="store_true",
                    help="run the reference p=10 phase-1 config to completion "
                         "(max_iter=5000, check_every=50, best-model restore, "
                         "`CRVAE_lorenz96.py:771-774`) and report the achieved "
                         "AUROC/F1 against the circulant truth — the quality "
                         "anchor for BASELINE.md")
    args = ap.parse_args()

    torch.manual_seed(0)
    series = torch.from_numpy(lorenz96_series(args.p, args.T))
    # Sliding windows (N, ctx, p), one fixed random batch as the reference does.
    N = args.T - args.context
    windows = torch.stack([series[i:i + args.context] for i in range(N)])
    idx = torch.from_numpy(np.random.default_rng(1).integers(0, N, args.batch))
    X = windows[idx]

    model = TorchCRVAE(args.p, args.hidden)
    mse = nn.MSELoss()

    def step():
        preds, mu, logvar = model(X)
        loss = sum(mse(preds[i][:, :, 0], X[:, 10:, i]) for i in range(args.p))
        kl = (-0.5 * (1 + logvar - mu ** 2 - logvar.exp()).sum(-1).sum(0)).mean(0)
        total = loss + 0.1 * kl
        model.zero_grad()
        total.backward()
        with torch.no_grad():
            for prm in model.parameters():
                prm -= args.lr * prm.grad
            for head in model.heads:
                W = head.gru.weight_ih_l0
                W.copy_(prox_group_columns(W, args.lam, args.lr))
        return float(total)

    if args.full:
        # Reference protocol to completion: 5000 iters on the one fixed
        # batch, best-model tracking every 50 by (recon + ridge)/p computed
        # after the update, restore best at the end
        # (`CRVAE_lorenz96.py:457-560`, driver literals at :771-774).
        import copy

        max_iter, check_every = 5000, 50
        best_loss, best_model = np.inf, None
        t0 = time.perf_counter()
        for it in range(max_iter):
            step()
            if it % check_every == 0:
                with torch.no_grad():
                    preds, _, _ = model(X)
                    recon = sum(mse(preds[i][:, :, 0], X[:, 10:, i])
                                for i in range(args.p))
                    mean_loss = float(recon) / args.p
                if mean_loss < best_loss:
                    best_loss = mean_loss
                    best_model = copy.deepcopy(model)
        dt = time.perf_counter() - t0
        with torch.no_grad():
            scores = np.stack([
                head.gru.weight_ih_l0.norm(dim=0).numpy()
                for head in best_model.heads])
        result = {
            "workload": f"crvae_lorenz96_phase1_full p={args.p} "
                        f"ctx={args.context} hidden={args.hidden} "
                        f"batch={args.batch} max_iter={max_iter}",
            "hardware": "cpu (torch)",
            "steps_per_sec": max_iter / dt,
            "train_seconds": dt,
            "best_mean_loss": best_loss,
            **score_gc(lorenz96_truth(args.p), scores),
        }
        print(json.dumps(result))
        return

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0

    result = {
        "workload": f"crvae_lorenz96_phase1 p={args.p} ctx={args.context} "
                    f"hidden={args.hidden} batch={args.batch}",
        "hardware": "cpu (torch)",
        "steps_per_sec": args.iters / dt,
        "iters": args.iters,
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
