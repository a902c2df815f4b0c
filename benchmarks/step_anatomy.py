"""Step anatomy for the p=20 north-star phase-1 step (VERDICT round 1, item 6).

Where do the ~325 us of one training step go?  Two decompositions:

1. Component ablation — time chunk-of-100 scans of progressively larger
   subgraphs (forward loss -> +grad -> +SGD -> +prox -> full step with
   best-model tracking), each jitted and timed with a scalar device->host
   sync (the relay can return early from block_until_ready).
2. Batch scaling — time the full step at B in {32..1024}; a linear fit
   separates the fixed per-step cost (dispatch + scan floor + small-op
   latency) from the per-sample streaming cost (the HBM story).

Run: python benchmarks/step_anatomy.py [--p 20] [--chunk 100]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chunk(fn, state, chunk_reads, warmup=6, reps=10):
    """Seconds per chunk, pipelined: dispatch ``reps`` chunks back-to-back
    and sync ONCE at the end via a scalar fetch (bench.py methodology — a
    per-chunk sync adds a full relay round trip per chunk, ~30 ms, which
    inflated the first version of this script by ~300 us/step)."""
    out = None
    for _ in range(warmup):
        out = fn(state)
    _ = float(chunk_reads(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(state)
    _ = float(chunk_reads(out))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--context", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=100)
    args = ap.parse_args()

    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.train import Phase1Config
    from vae_connexe_tpu.train.crvae_trainer import (Phase1State, _crvae_loss,
                                                     _project_and_prox,
                                                     make_phase1_step)

    p, H, B, ctx, chunk = (args.p, args.hidden, args.batch, args.context,
                           args.chunk)
    series = lorenz96(jax.random.key(0), p=p, t=2048)
    windows, _ = arrange_input(series, ctx)
    model = CRVAE(p=p, hidden=H)
    cfg = Phase1Config(lam=0.1, lr=5e-2, batch_size=B, check_every=100,
                       resample_batches=True)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((p, p), jnp.float32)

    def sample_batch(key):
        idx = jax.random.randint(key, (B,), 0, windows.shape[0])
        return jnp.take(windows, idx, axis=0)

    def loss_only(carry, _):
        key = jax.random.fold_in(carry["key"], carry["i"])
        batch = sample_batch(key)
        loss, aux = _crvae_loss(model, cfg, carry["params"], None, batch, key,
                                parents, cfg.beta)
        return {**carry, "i": carry["i"] + 1, "loss": loss}, None

    def loss_grad(carry, _):
        key = jax.random.fold_in(carry["key"], carry["i"])
        batch = sample_batch(key)

        def f(prms):
            loss, aux = _crvae_loss(model, cfg, prms, None, batch, key,
                                    parents, cfg.beta)
            return loss
        loss, g = jax.value_and_grad(f)(carry["params"])
        # Consume g so XLA cannot DCE the backward.
        gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return {**carry, "i": carry["i"] + 1, "loss": loss + 0.0 * gsum}, None

    def grad_sgd(carry, _):
        key = jax.random.fold_in(carry["key"], carry["i"])
        batch = sample_batch(key)

        def f(prms):
            loss, aux = _crvae_loss(model, cfg, prms, None, batch, key,
                                    parents, cfg.beta)
            return loss
        loss, g = jax.value_and_grad(f)(carry["params"])
        new = jax.tree.map(lambda a, b: a - cfg.lr * b, carry["params"], g)
        return {**carry, "i": carry["i"] + 1, "params": new, "loss": loss}, None

    def grad_sgd_prox(carry, _):
        key = jax.random.fold_in(carry["key"], carry["i"])
        batch = sample_batch(key)

        def f(prms):
            loss, aux = _crvae_loss(model, cfg, prms, None, batch, key,
                                    parents, cfg.beta)
            return loss
        loss, g = jax.value_and_grad(f)(carry["params"])
        new = jax.tree.map(lambda a, b: a - cfg.lr * b, carry["params"], g)
        new = _project_and_prox(new, parents, cfg.lam, cfg.lr)
        return {**carry, "i": carry["i"] + 1, "params": new, "loss": loss}, None

    carry0 = {"params": params, "key": jax.random.key(2),
              "i": jnp.zeros([], jnp.int32), "loss": jnp.zeros([])}
    variants = [("forward", loss_only), ("forward+grad", loss_grad),
                ("+sgd", grad_sgd), ("+prox", grad_sgd_prox)]
    report = {}
    for name, body in variants:
        fn = jax.jit(lambda c, body=body: jax.lax.scan(body, c, None,
                                                       length=chunk)[0])
        sec = time_chunk(fn, carry0, lambda out: out["loss"])
        report[name] = sec / chunk

    # Full production step (adds best-model tracking + metrics dict).
    step = make_phase1_step(model, cfg, windows, parents)
    full = jax.jit(lambda s: jax.lax.scan(step, s, None, length=chunk))
    state0 = Phase1State(params=params, prior=None, best_params=params,
                         best_loss=jnp.array(jnp.inf), key=jax.random.key(2),
                         step=jnp.zeros([], jnp.int32))
    sec = time_chunk(full, state0, lambda out: out[1]["loss"][-1])
    report["full_step"] = sec / chunk

    print(json.dumps({"per_step_seconds": report,
                      "config": dict(p=p, hidden=H, batch=B, ctx=ctx)}))

    # Batch scaling of the full step.
    scaling = {}
    for b in (32, 64, 128, 256, 512, 1024):
        cfg_b = Phase1Config(lam=0.1, lr=5e-2, batch_size=b, check_every=100,
                             resample_batches=True)
        step_b = make_phase1_step(model, cfg_b, windows, parents)
        full_b = jax.jit(lambda s: jax.lax.scan(step_b, s, None, length=chunk))
        sec = time_chunk(full_b, state0, lambda out: out[1]["loss"][-1])
        scaling[b] = sec / chunk
    bs = np.array(sorted(scaling))
    ts = np.array([scaling[int(b)] for b in bs])
    # Fit the production regime only (B <= args.batch): past it XLA re-tiles
    # the head matmuls and the cost turns superlinear, which would poison a
    # single linear fit (first run measured a nonsense negative intercept).
    mask = bs <= args.batch
    slope, fixed = np.polyfit(bs[mask], ts[mask], 1)
    print(json.dumps({
        "batch_scaling_us": {int(b): round(1e6 * scaling[int(b)], 1) for b in bs},
        "fit_range_max_batch": int(args.batch),
        "fixed_overhead_us": round(1e6 * fixed, 1),
        "per_sample_ns": round(1e9 * slope, 1),
    }))


if __name__ == "__main__":
    main()
