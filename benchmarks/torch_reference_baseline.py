"""Measure the PyTorch reference's CPU training throughput.

The upstream repo (anonyme-Zheng/VAE-connexe) publishes no benchmark numbers
(its README is one line), so the comparison anchor for BASELINE.md must be
measured.  This script reproduces the reference workload *behaviorally*
(CRVAE phase-1 on Lorenz-96: `/root/reference/CRVAE_lorenz96.py:737-774`,
batch=256, ctx=20, hidden=64, lam=0.1, lr=5e-2, manual SGD + group-lasso
proximal update) with an independent, minimal torch implementation, times a
few hundred iterations on CPU, and prints steps/sec.

Run:  python benchmarks/torch_reference_baseline.py [--p 10] [--iters 100]

Round-5 extension (VERDICT r4 item 5): the VRAE and CSRAE bench workloads
need measured CPU anchors too.  ``--workload vrae`` times the reference's
full-batch Adam epoch (`/root/reference/VRAE.py:150-169`: whole (N, T, D)
tensor per step, stochastic-teacher-forcing cell-loop decoder) and
``--workload csrae`` times the MixtureCSRAE minibatch Adam step
(`/root/reference/CS-RAE.py:115-155`: BCE-with-logits + lambda_cs * CS
divergence against a learnable GMM prior) — both at the exact shapes
`bench.py --workload vrae|csrae` uses, so vs_baseline is shape-for-shape.
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


class TorchVRAE(nn.Module):
    """Minimal reference-equivalent plain VRAE (`/root/reference/VRAE.py:11-139`):
    GRU encoder -> (mu, logvar); latent -> tanh(z2h) initial hidden; GRUCell
    decoder loop with a learnable start token and one shared stochastic
    teacher-forcing coin per step (`VRAE.py:94-100`); tanh output head."""

    def __init__(self, d: int, hidden: int, latent: int):
        super().__init__()
        self.d, self.hidden = d, hidden
        self.enc = nn.GRU(d, hidden, batch_first=True)
        self.fc_mu = nn.Linear(hidden, latent)
        self.fc_logvar = nn.Linear(hidden, latent)
        self.z2h = nn.Linear(latent, hidden)
        self.dec_cell = nn.GRUCell(d, hidden)
        self.fc_out = nn.Linear(hidden, d)
        self.start_token = nn.Parameter(torch.randn(1, d))

    def forward(self, x, tf_ratio: float):
        b, t, _ = x.shape
        _, h = self.enc(x, torch.zeros(1, b, self.hidden))
        mu, logvar = self.fc_mu(h[0]), self.fc_logvar(h[0])
        z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        st = torch.tanh(self.z2h(z))
        x_in = x[:, 0, :] if tf_ratio > 0 else self.start_token.expand(b, -1)
        outs = []
        for step in range(t):
            st = self.dec_cell(x_in, st)
            x_t = torch.tanh(self.fc_out(st))
            outs.append(x_t)
            feed = x[:, min(step + 1, t - 1), :]
            x_in = feed if float(torch.rand(1)) < tf_ratio else x_t
        return torch.stack(outs, dim=1), mu, logvar


def vrae_loss(recon, x, mu, logvar, beta=1.0):
    b = x.shape[0]
    rec = ((recon - x) ** 2).sum() / b
    kld = -0.5 * (1 + logvar - mu ** 2 - logvar.exp()).sum() / b
    return rec + beta * kld


def bench_vrae_torch(args):
    """One step = one full-batch Adam epoch (`VRAE.py:150-169`), at the
    bench.py vrae shapes: D=10, T=20, hidden=64, latent=32, N=2048,
    tf_ratio=0.5, Adam lr=1e-3."""
    torch.manual_seed(0)
    model = TorchVRAE(args.p, args.hidden, 32)
    data = torch.randn(args.batch, args.t, args.p)
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)

    def step():
        recon, mu, logvar = model(data, 0.5)
        total = vrae_loss(recon, data, mu, logvar, 1.0)
        optim.zero_grad()
        total.backward()
        optim.step()
        return float(total)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "workload": f"vrae_fullbatch d={args.p} t={args.t} "
                    f"hidden={args.hidden} n={args.batch}",
        "hardware": "cpu (torch)",
        "steps_per_sec": args.iters / dt,
        "iters": args.iters,
        "threads": torch.get_num_threads(),
    }))


class TorchMixtureCSRAE(nn.Module):
    """Minimal reference-equivalent MixtureCSRAE (`CS-RAE.py:47-155`):
    MLP encoder/decoder, learnable diagonal-GMM prior, closed-form CS
    divergence between N(mu_q, var_q) and the K-component mixture."""

    def __init__(self, d_in: int, hidden: int, latent: int, k: int,
                 lambda_cs: float):
        super().__init__()
        self.enc = nn.Sequential(nn.Linear(d_in, hidden), nn.ReLU())
        self.fc_mu = nn.Linear(hidden, latent)
        self.fc_logvar = nn.Linear(hidden, latent)
        self.dec = nn.Sequential(nn.Linear(latent, hidden), nn.ReLU(),
                                 nn.Linear(hidden, d_in))
        self.prior_mu = nn.Parameter(torch.randn(k, latent))
        self.prior_logvar = nn.Parameter(torch.zeros(k, latent))
        self.lambda_cs = lambda_cs
        self.k = k

    @staticmethod
    def _gauss_overlap(mu_a, var_a, mu_b, var_b):
        # N(mu_a | mu_b, var_a + var_b), diagonal covs (`CS-RAE.py:70-79`).
        var = var_a + var_b
        return torch.exp(-0.5 * ((mu_a - mu_b) ** 2 / var
                                 + torch.log(2 * torch.pi * var)).sum(-1))

    def loss(self, x):
        h = self.enc(x)
        mu_q, logvar_q = self.fc_mu(h), self.fc_logvar(h)
        z = mu_q + torch.exp(0.5 * logvar_q) * torch.randn_like(mu_q)
        logits = self.dec(z)
        recon = nn.functional.binary_cross_entropy_with_logits(
            logits, x, reduction="sum") / x.shape[0]
        var_q = logvar_q.exp()                           # (B, Z)
        mu_p, var_p = self.prior_mu, self.prior_logvar.exp()  # (K, Z)
        # term1 = 1/K sum_k N(mu_q | mu_k, var_q + var_k)  (`CS-RAE.py:86-93`)
        t1 = self._gauss_overlap(mu_q[:, None], var_q[:, None],
                                 mu_p[None], var_p[None]).mean(-1)
        # term2 = 1/K^2 sum_{k,k'} N(mu_k | mu_k', 2 var_k') via the
        # reference's K^2 Python loop (`CS-RAE.py:95-104`) — the loop IS
        # part of the reference step's real cost, so the anchor keeps it.
        t2 = torch.stack([
            self._gauss_overlap(mu_p[k:k + 1], torch.zeros_like(var_p[k:k + 1]),
                                mu_p[kp:kp + 1], 2 * var_p[kp:kp + 1])
            for k in range(self.k) for kp in range(self.k)]).mean()
        # term3 = N(mu_q | mu_q, 2 var_q)  (`CS-RAE.py:106-108`)
        t3 = self._gauss_overlap(mu_q, var_q, mu_q, var_q)
        cs = (-t1.log() + 0.5 * t2.log() + 0.5 * t3.log()).clamp(min=0).mean()
        return recon + self.lambda_cs * cs


def bench_csrae_torch(args):
    """One step = one minibatch Adam update (`CS-RAE.py:115-155`), at the
    bench.py csrae shapes: binarized flattened Lorenz-96 windows
    (d_in = ctx*p = 200), hidden=400, latent=20, K=10, lambda_cs=1.0,
    batch=128, Adam lr=1e-3."""
    torch.manual_seed(0)
    series = lorenz96_series(args.p, args.T)
    n = args.T - args.context
    wins = np.stack([series[i:i + args.context] for i in range(n)])
    x_all = torch.from_numpy(
        (wins.reshape(n, -1) > 0).astype(np.float32))
    model = TorchMixtureCSRAE(x_all.shape[1], 400, 20, 10, 1.0)
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.default_rng(1)

    def step():
        idx = torch.from_numpy(rng.integers(0, n, args.batch))
        total = model.loss(x_all[idx])
        optim.zero_grad()
        total.backward()
        optim.step()
        return float(total)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "workload": f"csrae_adam d_in={x_all.shape[1]} hidden=400 "
                    f"latent=20 k=10 batch={args.batch}",
        "hardware": "cpu (torch)",
        "steps_per_sec": args.iters / dt,
        "iters": args.iters,
        "threads": torch.get_num_threads(),
    }))


class TorchErrorVAE(nn.Module):
    """Reference-equivalent VRAE4E (`author_CRVAE.py:126-182`): GRU encoder
    over residuals -> fc_mu/fc_std (latent == hidden), tanh(z2h) initial
    hidden, GRU decoder over the zero-prepended shifted residuals, Linear
    readout; `sample` free-runs 21 steps from h ~ N(0, I)."""

    def __init__(self, d: int, hidden: int):
        super().__init__()
        self.d, self.hidden = d, hidden
        self.enc = nn.GRU(d, hidden, batch_first=True)
        self.fc_mu = nn.Linear(hidden, hidden)
        self.fc_std = nn.Linear(hidden, hidden)
        self.z2h = nn.Linear(hidden, hidden)
        self.dec = nn.GRU(d, hidden, batch_first=True)
        self.dec_cell = None  # built lazily from self.dec for sampling
        self.out = nn.Linear(hidden, d)

    def forward(self, eps):
        b = eps.shape[0]
        _, h = self.enc(eps, torch.zeros(1, b, self.hidden))
        mu, logvar = self.fc_mu(h[0]), self.fc_std(h[0])
        z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        h_dec = torch.tanh(self.z2h(z)).unsqueeze(0)
        dec_in = torch.cat([torch.zeros_like(eps[:, :1]), eps[:, :-1]], 1)
        outs, _ = self.dec(dec_in, h_dec)
        return self.out(outs), mu, logvar

    def sample(self, batch: int, length: int):
        h = torch.randn(1, batch, self.hidden)
        x = torch.zeros(batch, 1, self.d)
        seq = [x]
        for _ in range(length):
            o, h = self.dec(x, h)
            x = self.out(o)
            seq.append(x)
        return torch.cat(seq, dim=1)            # (B, length + 1, D)


def bench_phase2_torch(args):
    """One step = the reference's phase-2 iteration
    (`author_CRVAE.py:612-646`): CRVAE forward + backward + manual SGD
    (lam=0, so no prox) PLUS the error VAE's Adam step on the detached
    residuals — at the bench.py phase2 shapes (p=20, ctx=20, hidden=64,
    batch=256)."""
    torch.manual_seed(0)
    series = torch.from_numpy(lorenz96_series(args.p, args.T))
    n = args.T - args.context
    windows = torch.stack([series[i:i + args.context] for i in range(n)])
    idx = torch.from_numpy(np.random.default_rng(1).integers(0, n, args.batch))
    X = windows[idx]

    crvae = TorchCRVAE(args.p, args.hidden)
    errvae = TorchErrorVAE(args.p, args.hidden)
    optim_e = torch.optim.Adam(errvae.parameters(), lr=1e-3)
    mse = nn.MSELoss()

    def step():
        preds, mu, logvar = crvae(X)
        loss = sum(mse(preds[i][:, :, 0], X[:, 10:, i]) for i in range(args.p))
        kl = (-0.5 * (1 + logvar - mu ** 2 - logvar.exp()).sum(-1).sum(0)).mean(0)
        smooth = loss + 0.1 * kl
        error = (X[:, 10:, :]
                 - torch.stack(preds)[:, :, :, 0].permute(1, 2, 0)).detach()
        pred_e, mu_e, logvar_e = errvae(error)
        kl_e = (-0.5 * (1 + logvar_e - mu_e ** 2
                        - logvar_e.exp()).sum(-1).sum(0)).mean(0)
        smooth_e = mse(pred_e, error) * error.numel() / error.shape[0] \
            + 0.1 * kl_e
        optim_e.zero_grad()
        smooth_e.backward()
        optim_e.step()
        crvae.zero_grad()
        smooth.backward()
        with torch.no_grad():
            for prm in crvae.parameters():
                prm -= args.lr * prm.grad
        return float(smooth.detach())

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "workload": f"crvae_lorenz96_phase2 p={args.p} ctx={args.context} "
                    f"hidden={args.hidden} batch={args.batch}",
        "hardware": "cpu (torch)",
        "steps_per_sec": args.iters / dt,
        "iters": args.iters,
        "threads": torch.get_num_threads(),
    }))


class TorchWInCRVAE(nn.Module):
    """Reference-equivalent explicit-W_in CRVAE (`CRVAE.py:55-150`): shared
    GRU encoder -> (mu, log sigma), tanh(z2h) shared initial hidden, per-head
    input matrix W_in[p] (D x H) before a head GRU + Linear(H -> 1)."""

    def __init__(self, d: int, hidden: int, latent: int):
        super().__init__()
        self.d, self.hidden = d, hidden
        self.enc = nn.GRU(d, hidden, batch_first=True)
        self.fc_mu = nn.Linear(hidden, latent)
        self.fc_logsig = nn.Linear(hidden, latent)
        self.z2h = nn.Linear(latent, hidden)
        self.w_in = nn.ParameterList(
            nn.Parameter(0.01 * torch.randn(d, hidden)) for _ in range(d))
        self.heads = nn.ModuleList(
            nn.GRU(hidden, hidden, batch_first=True) for _ in range(d))
        self.readouts = nn.ModuleList(nn.Linear(hidden, 1) for _ in range(d))

    def forward(self, x_past, x_cur):
        b = x_past.shape[0]
        _, h = self.enc(x_past, torch.zeros(1, b, self.hidden))
        mu, logsig = self.fc_mu(h[0]), self.fc_logsig(h[0])
        z = mu + torch.exp(logsig) * torch.randn_like(mu)
        h0 = torch.tanh(self.z2h(z)).unsqueeze(0)
        dec_in = torch.cat([x_past[:, -1:, :], x_cur[:, :-1, :]], 1)
        preds = []
        for p in range(self.d):
            seq, _ = self.heads[p](dec_in @ self.w_in[p], h0)
            preds.append(self.readouts[p](seq))
        return torch.cat(preds, dim=-1), mu, logsig


def bench_win_torch(args):
    """One step = the W_in variant's stage-1 ISTA iteration
    (`CRVAE.py:153-199`): forward + backward + Adam on everything but W_in
    + row-group ISTA on W_in — at the bench.py win shapes (d=6, tau=10,
    hidden=64, latent=32, batch=256, Adam lr=2e-3, lam=0.03)."""
    torch.manual_seed(0)
    # Coupled Henon chain, standardized — the henon6d_win data family; for
    # a throughput anchor the generator just has to give real windows.
    rng = np.random.default_rng(0)
    d, t = args.p, args.T
    x = np.zeros((t + 100, d))
    x[:2] = rng.normal(0, 0.1, (2, d))
    for i in range(2, t + 100):
        x[i, 0] = 1.4 - x[i - 1, 0] ** 2 + 0.3 * x[i - 2, 0]
        for j in range(1, d):
            x[i, j] = 1.4 - (0.5 * x[i - 1, j - 1] + 0.5 * x[i - 1, j]) ** 2 \
                + 0.3 * x[i - 2, j]
    series = x[100:]
    series = (series - series.mean(0)) / (series.std(0) + 1e-8)
    series = torch.from_numpy(series.astype(np.float32))
    tau = args.context // 2
    n = t - 2 * tau
    windows = torch.stack([series[i:i + 2 * tau] for i in range(n)])

    model = TorchWInCRVAE(d, args.hidden, 32)
    non_win = [p for name, p in model.named_parameters()
               if not name.startswith("w_in")]
    optim = torch.optim.Adam(non_win, lr=2e-3)
    lam, lr_prox = 0.03, 2e-3
    rng_b = np.random.default_rng(1)

    def step():
        idx = torch.from_numpy(rng_b.integers(0, n, args.batch))
        batch = windows[idx]
        x_past, x_cur = batch[:, :tau], batch[:, tau:2 * tau]
        recon, mu, logsig = model(x_past, x_cur)
        kl = (-0.5 * (1 + 2 * logsig - mu ** 2
                      - (2 * logsig).exp()).sum(-1)).mean()
        loss = ((recon - x_cur) ** 2).mean() + kl
        optim.zero_grad()
        for w in model.w_in:
            if w.grad is not None:
                w.grad = None
        loss.backward()
        optim.step()
        with torch.no_grad():
            for w in model.w_in:
                w_new = w - lr_prox * w.grad
                norm = w_new.norm(dim=1, keepdim=True)
                w.copy_((w_new / norm.clamp(min=lam * lr_prox))
                        * (norm - lam * lr_prox).clamp(min=0.0))
        return float(loss.detach())

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "workload": f"win_stage1 d={d} tau={tau} hidden={args.hidden} "
                    f"batch={args.batch}",
        "hardware": "cpu (torch)",
        "steps_per_sec": args.iters / dt,
        "iters": args.iters,
        "threads": torch.get_num_threads(),
    }))


def _compensated_rollout(crvae: "TorchCRVAE", errvae: TorchErrorVAE,
                         batch: int, rollout_len: int = 21,
                         noise_scale: float = 0.1):
    """Reference generation (`author_CRVAE.py:682-684` + `:284-286`): draw
    an error sequence from the error VAE, free-run every head one GRU step
    per emitted value, inject noise_scale * error_t."""
    with torch.no_grad():
        noise = errvae.sample(batch, rollout_len)[:, :rollout_len]
        x = torch.zeros(batch, 1, crvae.p)
        hs = [torch.randn(1, batch, crvae.hidden) for _ in range(crvae.p)]
        seq = []
        for step in range(rollout_len):
            outs = []
            for i, head in enumerate(crvae.heads):
                o, hs[i] = head.gru(x, hs[i])
                outs.append(head.out(o))
            x = (torch.cat(outs, dim=-1)
                 + noise_scale * noise[:, step:step + 1, :])
            seq.append(x)
        return torch.cat(seq, dim=1)


def bench_generate_torch(args):
    """Compensated-rollout serving throughput (samples/sec) at the bench.py
    generate batch (pick_serve_batch(p=20, H=64) = 3072 at f32)."""
    torch.manual_seed(0)
    crvae = TorchCRVAE(args.p, args.hidden)
    errvae = TorchErrorVAE(args.p, args.hidden)
    batch = args.batch
    for _ in range(2):
        _compensated_rollout(crvae, errvae, batch)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = _compensated_rollout(crvae, errvae, batch)
        _ = float(out.sum())
        rates.append(batch / (time.perf_counter() - t0))
    rates.sort()
    print(json.dumps({
        "workload": f"generate p={args.p} hidden={args.hidden} batch={batch}",
        "hardware": "cpu (torch)",
        "samples_per_sec": rates[1],
        "range": [rates[0], rates[-1]],
        "threads": torch.get_num_threads(),
    }))


def bench_latency_torch(args):
    """Single-request (B=1) compensated-rollout latency, ms/generation."""
    torch.manual_seed(0)
    crvae = TorchCRVAE(args.p, args.hidden)
    errvae = TorchErrorVAE(args.p, args.hidden)
    for _ in range(5):
        _compensated_rollout(crvae, errvae, 1)
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = _compensated_rollout(crvae, errvae, 1)
        _ = float(out.sum())
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    print(json.dumps({
        "workload": f"latency p={args.p} hidden={args.hidden} batch=1",
        "hardware": "cpu (torch)",
        "ms_per_generation_p50": times[len(times) // 2],
        "range": [times[0], times[-1]],
        "threads": torch.get_num_threads(),
    }))


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
    ap.add_argument("--workload",
                    choices=["crvae", "vrae", "csrae", "phase2", "win",
                             "generate", "latency"],
                    default="crvae",
                    help="crvae = phase-1 step (default); vrae = full-batch "
                         "Adam epoch (VRAE.py:150-169); csrae = minibatch "
                         "Adam step (CS-RAE.py:115-155); phase2 = CRVAE SGD "
                         "+ error-VAE Adam (author_CRVAE.py:612-646); win = "
                         "W_in stage-1 ISTA step (CRVAE.py:153-199); "
                         "generate/latency = compensated 21-step rollouts "
                         "(author_CRVAE.py:682-684) — all at bench.py shapes")
    args = ap.parse_args()

    if args.workload == "phase2":
        if args.p == 10:             # bench.py phase2 geometry is p=20
            args.p = 20
        return bench_phase2_torch(args)
    if args.workload == "win":
        if args.p == 10:             # bench.py win geometry
            args.p = 6
        return bench_win_torch(args)
    if args.workload == "generate":
        if args.batch == 256:        # bench.py pick_serve_batch(20, 64) f32
            args.batch = 3072
        if args.p == 10:
            args.p = 20
        return bench_generate_torch(args)
    if args.workload == "latency":
        if args.p == 10:
            args.p = 20
        return bench_latency_torch(args)
    if args.workload == "vrae":
        # bench.py vrae geometry: t = seq len 20, batch = full-batch N 2048.
        args.t = 20
        if args.batch == 256:
            args.batch = 2048
        return bench_vrae_torch(args)
    if args.workload == "csrae":
        if args.batch == 256:        # bench.py csrae geometry
            args.batch = 128
        return bench_csrae_torch(args)

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
