"""XLA cost-model audit for the north-star training step.

Compares the compiled executable's ``cost_analysis()`` against
``bench.py``'s analytic roofline model, and derives the measured-rate
traffic *sandwich* that pins RESULTS.md's "real traffic ~ 2x the
analytic lower bound" claim:

    analytic_lb  <=  real bytes/step  <=  hbm_peak / measured steps_per_sec

(the right side holds for any HBM-bound step: if it moved more than
that, it could not hit the measured rate).

Interpretation caveats, measured on this backend (round 3):

- XLA visits a ``lax.scan``/while body ONCE, without multiplying by the
  trip count — so the cost of a jitted chunk of N steps ~ the cost of
  one step (plus boundary ops).  We therefore compile a chunk and read
  its totals as per-step numbers, NOT totals/N.
- Pallas kernels are custom calls with no cost model: the fused-decode
  workloads (longhorizon, xl) report ~0 flops and are excluded here.
- "bytes accessed" sums operand+output bytes per (fused) HLO op with no
  locality modeling; on the train chunk it reports ~1.17 GB/step, which
  would cap the step at ~700 steps/s — a 4.5x contradiction with the
  measured 3151.  It is an op-level upper estimate, reported for
  diagnosis only; the sandwich above is the defensible bound.

Round-3 TPU result (2000-step-run rate 3151.33 steps/s):
    xla flops/step 6.57e9 = 1.26x the analytic matmul-only 5.23e9
      -> the elementwise share; the FLOP model is sound.
    traffic sandwich: 118 MB <= real <= 260 MB/step
      -> consistent with the step-anatomy claim of ~2x the lower bound,
         and proof the step cannot be far from its HBM roofline.

Usage:  python benchmarks/xla_cost_audit.py [--steps-per-sec N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import WORKLOADS, CHIP_PEAKS, phase1_flops_bytes  # noqa: E402

# Measured round-3 full-run rate (RESULTS.md matrix) used when
# --steps-per-sec is not given.
MEASURED_TRAIN_STEPS_PER_SEC = 3151.33


def build_chunk(chunk_len: int = 100):
    """The exact bench.py hot loop: a jitted chunk_len-step lax.scan over
    the production phase-1 step at the north-star shape."""
    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.train import Phase1Config
    from vae_connexe_tpu.train.crvae_trainer import Phase1State, make_phase1_step

    shape = WORKLOADS["train"]
    series = lorenz96(jax.random.key(0), p=shape["p"], t=shape["t"])
    windows, _ = arrange_input(series, shape["context"])
    model = CRVAE(p=shape["p"], hidden=shape["hidden"])
    cfg = Phase1Config(lam=0.1, lr=5e-2, batch_size=shape["batch"],
                       check_every=100, resample_batches=True)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((shape["p"], shape["p"]), jnp.float32)
    step = make_phase1_step(model, cfg, windows, parents)

    def run_chunk(state):
        return jax.lax.scan(step, state, None, length=chunk_len)

    state = Phase1State(params=params, prior=None, best_params=params,
                        best_loss=jnp.array(jnp.inf), key=jax.random.key(2),
                        step=jnp.zeros([], jnp.int32))
    return run_chunk, state, shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-sec", type=float,
                    default=MEASURED_TRAIN_STEPS_PER_SEC)
    ap.add_argument("--chunk-len", type=int, default=100)
    args = ap.parse_args()

    run_chunk, state, shape = build_chunk(args.chunk_len)
    compiled = jax.jit(run_chunk).lower(state).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):        # older jax returns [dict]
            ca = ca[0]
    except Exception as e:              # backend without cost analysis
        print(json.dumps({"error": f"cost_analysis unavailable: {e}"}))
        return

    # Loop bodies are counted once -> chunk totals ~ one step (see module
    # docstring); do NOT divide by chunk_len.
    xla_flops = float(ca.get("flops", 0.0))
    xla_bytes = float(ca.get("bytes accessed", 0.0))
    lb_flops, lb_bytes = phase1_flops_bytes(
        shape["p"], shape["hidden"], shape["batch"], shape["context"])

    device = str(jax.devices()[0].device_kind)
    peaks = CHIP_PEAKS.get(device)
    out = {
        "workload": "train",
        "device": device,
        "steps_per_sec": args.steps_per_sec,
        "xla_flops_per_step": xla_flops,
        "analytic_flops_per_step": lb_flops,
        "flops_ratio_xla_over_analytic": (round(xla_flops / lb_flops, 3)
                                          if lb_flops else None),
        "xla_bytes_accessed_per_step_oplevel": xla_bytes,
        "analytic_bytes_lb_per_step": lb_bytes,
    }
    if peaks and args.steps_per_sec:
        ub = peaks["hbm_bytes"] / args.steps_per_sec
        out["real_bytes_per_step_upper_bound"] = round(ub, 1)
        out["sandwich_ub_over_lb"] = round(ub / lb_bytes, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
