"""Single-stream serving latency A/B: lax-scan vs fused Pallas rollout.

``bench.py --workload latency`` measures the production path (lax scan,
`generate_with_compensation`).  This script A/Bs it against composing the
two fused Pallas rollout kernels (`ops/pallas_rollout.py`) at small serving
batches — the regime the round-2 throughput measurements rejected them in
was large-batch serving (B >= 1024, where XLA's scan pipeline wins on
bandwidth); at B ~ 1 the chain is latency-bound (tiny per-step dots whose
per-dispatch overhead dominates) and a single kernel that keeps every
carry in VMEM for the whole 21-step chain attacks exactly that overhead.

Both paths compute the same compensated generation (parity pinned in
tests/test_pallas_rollout.py); RNG draws are identical by construction.

Usage:  python -m benchmarks.latency_ab [--batches 1,8,64] [--gens 200]
Prints one JSON line per (batch, path) with ms/generation (device-side:
``gens`` generations serialized in one dispatch via a scan carry).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.models.crvae import masked_heads
from vae_connexe_tpu.ops.pallas_rollout import (
    crvae_free_run_fused,
    errvae_sample_fused,
)
from vae_connexe_tpu.train import generate_with_compensation


def fused_generate(model: CRVAE, err: ErrorVAE, params, err_params,
                   key: jax.Array, batch: int, parents) -> jax.Array:
    """`generate_with_compensation` on the fused kernels, same RNG draws."""
    k_e, k_r = jax.random.split(key)
    t = model.rollout_len
    h0e = jax.random.normal(k_e, (batch, err.hidden))      # sample's h0 draw
    errs = errvae_sample_fused(err_params.dec, err_params.out, h0e,
                               err.d, t)
    # The reference keeps sample's leading zero step and the caller slices
    # to rollout_len (train/crvae_trainer.py::generate_with_compensation).
    noise = jnp.concatenate([jnp.zeros((batch, 1, err.d)), errs],
                            axis=1)[:, :t]
    heads = masked_heads(params.heads, parents)
    h0 = jax.random.normal(k_r, (batch, model.hidden))     # rollout's h0 draw
    return crvae_free_run_fused(heads, params.readout,
                                jnp.zeros((batch, model.p)), h0, noise,
                                model.noise_scale)


def time_chain(gen_fn, params, err_params, batch: int, n_gens: int):
    """Median ms/generation over 3 timed dispatches of an n_gens chain."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(prms, eprms, key, n):
        def one(acc, k):
            return acc + gen_fn(prms, eprms, k).sum(), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0),
                              jax.random.split(key, n), length=n)
        return acc

    for i in range(6):                                     # relay warmup
        _ = float(chain(params, err_params, jax.random.key(i), n_gens))
    ms = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(chain(params, err_params, jax.random.key(99 + i), n_gens))
        ms.append((time.perf_counter() - t0) * 1e3 / n_gens)
    ms.sort()
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--gens", type=int, default=200)
    args = ap.parse_args()

    model = CRVAE(p=args.p, hidden=args.hidden)
    err = ErrorVAE(d=args.p, hidden=args.hidden)
    params = model.init(jax.random.key(0))
    err_params = err.init(jax.random.key(1))
    parents = jnp.ones((args.p, args.p), jnp.float32)

    for batch in [int(b) for b in args.batches.split(",")]:
        paths = {
            "lax": lambda prms, eprms, k: generate_with_compensation(
                model, err, prms, eprms, k, batch, parents=parents),
            "fused": lambda prms, eprms, k: fused_generate(
                model, err, prms, eprms, k, batch, parents),
        }
        for name, fn in paths.items():
            try:
                ms = time_chain(fn, params, err_params, batch, args.gens)
            except Exception as e:  # fused may reject a shape — record it
                print(json.dumps({"batch": batch, "path": name,
                                  "error": f"{type(e).__name__}: {e}"[:200]}))
                continue
            print(json.dumps({
                "batch": batch, "path": name,
                "ms_per_generation": round(ms[1], 4),
                "range": [round(ms[0], 4), round(ms[-1], 4)],
                "samples_per_sec": round(batch / (ms[1] / 1e3), 1),
            }))


if __name__ == "__main__":
    main()
