"""Headline benchmark: CRVAE Lorenz-96 phase-1 training steps/sec on TPU.

North-star workload (BASELINE.json): p=20, T=2048, ctx=20, hidden=64,
batch=256, λ=0.1, lr=5e-2 — the exact reference configuration of
``CRVAE_lorenz96.py`` scaled to p=20.  The denominator is the measured
PyTorch CPU anchor from BASELINE.md (7.618 steps/sec at p=20).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

TORCH_CPU_BASELINE_P20 = 7.618  # steps/sec, BASELINE.md "Measured anchor"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=20)
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--context", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2000)
    # The axon relay's first ~5 post-compile dispatches run ~10x slow;
    # under-warming biases short measurements (see BASELINE.md notes).
    ap.add_argument("--warmup-chunks", type=int, default=6)
    ap.add_argument("--quick", action="store_true", help="300 timed steps")
    ap.add_argument("--workload", choices=["train", "generate"], default="train",
                    help="train = phase-1 steps/sec (headline); generate = "
                         "compensated-rollout serving throughput")
    args = ap.parse_args()
    if args.quick:
        args.steps = 300

    if args.workload == "generate":
        return bench_generate(args)

    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.train import Phase1Config
    from vae_connexe_tpu.train.crvae_trainer import Phase1State, make_phase1_step

    key = jax.random.key(0)
    series = lorenz96(key, p=args.p, t=args.t)
    windows, _ = arrange_input(series, args.context)

    model = CRVAE(p=args.p, hidden=args.hidden)
    cfg = Phase1Config(lam=0.1, lr=5e-2, batch_size=args.batch,
                       check_every=100, resample_batches=True)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((args.p, args.p), jnp.float32)
    step = make_phase1_step(model, cfg, windows, parents)

    chunk_len = 100

    @jax.jit
    def run_chunk(state):
        return jax.lax.scan(step, state, None, length=chunk_len)

    state = Phase1State(params=params, prior=None, best_params=params,
                        best_loss=jnp.array(jnp.inf), key=jax.random.key(2),
                        step=jnp.zeros([], jnp.int32))

    m = None
    for _ in range(args.warmup_chunks):
        state, m = run_chunk(state)
    # Scalar fetch, not block_until_ready: the relay can return early from
    # the latter, which would leak warmup work into the timed window.
    if m is not None:
        _ = float(m["loss"][-1])

    n_chunks = max(1, args.steps // chunk_len)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, m = run_chunk(state)
    # Sync via a device->host value fetch: a scalar read cannot complete
    # before the dependency chain has executed, unlike block_until_ready,
    # which has been observed to return early through this runtime's relay.
    final_loss = float(m["loss"][-1])
    dt = time.perf_counter() - t0

    steps_per_sec = n_chunks * chunk_len / dt
    device = jax.devices()[0]
    print(json.dumps({
        "metric": f"crvae_lorenz96_phase1_p{args.p}_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / TORCH_CPU_BASELINE_P20, 2),
        "device": str(device.device_kind),
        "timed_steps": n_chunks * chunk_len,
        "final_loss": final_loss,
    }))


def bench_generate(args):
    """Serving throughput: compensated 21-step rollouts (samples/sec)."""
    import jax.numpy as jnp

    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.train import generate_with_compensation

    model = CRVAE(p=args.p, hidden=args.hidden)
    err = ErrorVAE(d=args.p, hidden=args.hidden)
    params = model.init(jax.random.key(0))
    err_params = err.init(jax.random.key(1))
    parents = jnp.ones((args.p, args.p), jnp.float32)
    batch = 1024

    # Params as jit arguments, not closure constants — baked-in constants
    # blow the remote-compile request size at scaled configs (CLAUDE.md).
    @jax.jit
    def gen(prms, eprms, key):
        return generate_with_compensation(model, err, prms, eprms, key,
                                          batch, parents=parents)

    for i in range(8):
        out = gen(params, err_params, jax.random.key(i))
    _ = float(out[0, 0, 0])
    n_calls = 50
    t0 = time.perf_counter()
    for i in range(n_calls):
        out = gen(params, err_params, jax.random.key(100 + i))
    _ = float(out[0, 0, 0])
    dt = time.perf_counter() - t0
    samples_per_sec = n_calls * batch / dt
    print(json.dumps({
        "metric": f"crvae_p{args.p}_rollout_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/sec",
        "vs_baseline": None,
        "rollout_len": model.rollout_len,
        "batch": batch,
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
