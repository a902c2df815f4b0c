"""Headline benchmark: CRVAE Lorenz-96 phase-1 training steps/sec on TPU.

North-star workload (BASELINE.json): p=20, T=2048, ctx=20, hidden=64,
batch=256, λ=0.1, lr=5e-2 — the exact reference configuration of
``CRVAE_lorenz96.py`` scaled to p=20.  The denominator is the measured
PyTorch CPU anchor from BASELINE.md (7.618 steps/sec at p=20).

Besides steps/sec the output carries analytic roofline accounting
(VERDICT round 1, item 3): matmul FLOPs/step and a saved-activation +
parameter-traffic HBM bytes/step lower bound, each reported as achieved
FLOP/s and B/s and as % of the chip peaks, plus the roofline verdict
(whether the step's arithmetic intensity puts its ceiling at the MXU or
at HBM bandwidth).

Scaled workloads: ``--workload longhorizon`` (ctx=128 — the fused Pallas
decode path) and ``--workload xl`` (p=128) mirror the experiment configs in
``configs/experiments.py``; ``--workload generate`` is serving throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N, ...}
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

TORCH_CPU_BASELINE_P20 = 7.618  # steps/sec, BASELINE.md "Measured anchor"

# Measured torch-CPU anchors for every workload (VERDICT r4 item 5: no
# vs_baseline: None anywhere).  All from benchmarks/torch_reference_baseline.py
# on this machine (1 thread), at the exact WORKLOADS shapes — provenance in
# BASELINE.md "Measured anchors".  Units: steps/sec, except generate
# (samples/sec) and latency (ms/generation p50 — its vs_baseline is the
# speedup ratio torch_ms / device_ms).
TORCH_CPU_ANCHORS = {
    "train": TORCH_CPU_BASELINE_P20,
    "stream": TORCH_CPU_BASELINE_P20,
    "sweep": TORCH_CPU_BASELINE_P20,     # per-seed ratio
    "longhorizon": 1.664,
    "xl": 0.404,
    "phase2": 5.389,
    "win": 14.94,
    "vrae": 4.591,
    "csrae": 34.68,
    "generate": 2219.5,                  # samples/sec, B=3072 f32
    "latency": 41.09,                    # ms/generation p50, B=1
}

# Chip peaks for roofline accounting, keyed by jax device_kind.  v5e
# (reported as "TPU v5 lite"): 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM
# (public TPU v5e spec; the scaling-book numbers).  Compute here is f32 —
# MFU is quoted against the bf16 peak, so f32 parity would cap near 50%.
CHIP_PEAKS = {
    "TPU v5 lite": {"flops": 197e12, "hbm_bytes": 819e9},
    "TPU v5e": {"flops": 197e12, "hbm_bytes": 819e9},
}

# North-star + scaled workload definitions (mirrors configs/experiments.py:
# lorenz96 reference-at-p20, lorenz96_longhorizon, lorenz96_xl).
WORKLOADS = {
    "train": dict(p=20, t=2048, context=20, hidden=64, batch=256),
    "phase2": dict(p=20, t=2048, context=20, hidden=64, batch=256),
    "sweep": dict(p=20, t=2048, context=20, hidden=64, batch=256),
    "longhorizon": dict(p=10, t=4096, context=128, hidden=64, batch=128),
    "xl": dict(p=128, t=8192, context=40, hidden=128, batch=64),
    # win = henon6d_win's geometry (configs/experiments.py): 2τ windows.
    "win": dict(p=6, t=3000, context=20, hidden=64, batch=256),
    # vrae = vrae_demo geometry (t here = sequence length; batch = the
    # full-batch N — the reference trains full-batch, VRAE.py:150-169).
    "vrae": dict(p=10, t=20, context=20, hidden=64, batch=2048),
    # csrae = csrae_binarized geometry (hidden here = the MLP trunk width).
    "csrae": dict(p=10, t=2048, context=20, hidden=400, batch=128),
}


def phase1_flops_bytes(p: int, hidden: int, batch: int, ctx: int,
                       enc_len: int = 10) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) per phase-1 training step.

    FLOPs: matmul-only (2mn per MAC matrix product), forward ×3 for
    forward+backward (standard 1:2 fwd:bwd ratio); elementwise gate math,
    the SGD update, and the prox are not counted (they are the bytes story,
    not the flops story).

    Bytes: a lower bound on HBM traffic — saved activations for the
    backward pass (4 B·H f32 tensors per GRU cell step: r, z, n, h) written
    once and read once, plus 5 passes over the parameters (fwd read, bwd
    read, grad write, update read+write).  XLA fusion can only approach
    this bound, not beat it.
    """
    H, B = hidden, batch
    dec_len = ctx - enc_len
    gru_cell_flops = 3 * 2 * H * (p + H)          # 3 gates, ih + hh matmuls
    fwd_flops = B * (
        enc_len * gru_cell_flops                  # encoder GRU
        + 2 * 2 * H * H                           # fc_mu, fc_std
        + p * dec_len * (gru_cell_flops + 2 * H)  # p heads + readout
    )
    flops = 3 * fwd_flops

    f32 = 4
    n_params = (
        3 * H * (p + H) + 6 * H                   # encoder GRU (+biases)
        + 2 * (H * H + H)                         # fc_mu, fc_std
        + p * (3 * H * (p + H) + 6 * H + H + 1)   # heads + readouts
    )
    act_tensors = 4 * B * H * (enc_len + p * dec_len)   # r,z,n,h per step
    hbm_bytes = f32 * (2 * act_tensors + 5 * n_params
                       + 2 * B * ctx * p)         # batch read fwd+bwd
    return float(flops), float(hbm_bytes)


def errvae_flops_bytes(p: int, hidden: int, batch: int, t_dec: int,
                       training: bool = True) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) for one error-VAE training step on
    (B, t_dec, p) residuals — same counting conventions as
    ``phase1_flops_bytes`` (matmul FLOPs ×3 for fwd+bwd; saved-activation +
    parameter-traffic byte lower bound).  Adam touches its two moment
    buffers read+write on top of the SGD pattern (≈9 param passes)."""
    H, B = hidden, batch
    cell = 3 * 2 * H * (p + H)
    fwd = B * (
        t_dec * cell                   # encoder GRU
        + 3 * 2 * H * H                # fc_mu, fc_std, z2h (latent == H)
        + t_dec * (cell + 2 * H * p)   # decoder GRU + out head
    )
    flops = (3 * fwd) if training else fwd

    f32 = 4
    n_params = (2 * (3 * H * (p + H) + 6 * H)       # enc + dec GRU
                + 3 * (H * H + H)                   # fc_mu, fc_std, z2h
                + H * p + p)                        # out
    param_passes = 9 if training else 1
    act = 4 * B * H * 2 * t_dec                     # r,z,n,h per GRU step ×2
    hbm = f32 * ((2 * act if training else act)
                 + param_passes * n_params
                 + 2 * B * t_dec * p)               # eps stream fwd+bwd
    return float(flops), float(hbm)


def phase2_flops_bytes(p: int, hidden: int, batch: int, ctx: int,
                       enc_len: int = 10) -> tuple[float, float]:
    """One phase-2 step = the phase-1 CRVAE update (λ=0 — identical compute)
    + the error VAE's Adam step on the (B, ctx-enc_len, p) residuals."""
    f1, b1 = phase1_flops_bytes(p, hidden, batch, ctx, enc_len)
    f2, b2 = errvae_flops_bytes(p, hidden, batch, ctx - enc_len)
    return f1 + f2, b1 + b2


def win_flops_bytes(d: int, hidden: int, latent: int, tau: int,
                    batch: int, n_params: int) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) per W_in stage-1 training step — same
    counting conventions as ``phase1_flops_bytes`` (matmul FLOPs ×3 for
    fwd+bwd; saved-activation + parameter-traffic byte lower bound).

    The win step (``train/win_trainer.py``): encoder GRU over τ past
    steps, z→h0, the per-head W_in projection (d heads × (B, τ, d)·(d, H)
    dots — the variant's signature cost), d head GRUs over τ decode steps
    on the H-dim projected input, readouts, then Adam on everything but
    W_in (≈9 param passes) and an ISTA prox on W_in (≈4 passes).
    ``n_params`` is counted from the live pytree (the err-VAE subtree
    rides in the Adam state even in stage 1)."""
    H, B, L = hidden, batch, latent
    enc_cell = 3 * 2 * H * (d + H)
    head_cell = 3 * 2 * H * (H + H)
    fwd = B * (
        tau * enc_cell                        # encoder GRU over x_past
        + 2 * 2 * H * L + 2 * L * H           # fc_mu, fc_logsig, z2h
        + d * tau * 2 * d * H                 # W_in projection (d heads)
        + d * tau * (head_cell + 2 * H)       # head GRUs + readouts
    )
    flops = 3 * fwd

    f32 = 4
    act = 4 * B * H * (tau + d * tau)         # r,z,n,h per GRU cell step
    act += B * tau * d * H                    # saved x_sel projection
    hbm = f32 * (2 * act + 9 * n_params + 2 * B * 2 * tau * d)
    return float(flops), float(hbm)


def vrae_flops_bytes(d: int, hidden: int, latent: int, t: int, batch: int,
                     n_params: int) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) per VRAE full-batch Adam step — same
    conventions as ``phase1_flops_bytes`` (matmul FLOPs ×3 for fwd+bwd;
    saved-activation + parameter-traffic byte lower bound; Adam ≈ 9 param
    passes).  Encoder GRU over T steps, μ/logσ heads, z→h0, then the
    per-timestep decoder cell loop with readout (``VRAE.py:29-101``)."""
    H, B, L, T = hidden, batch, latent, t
    cell = 3 * 2 * H * (d + H)
    fwd = B * (T * cell                    # encoder GRU
               + 2 * 2 * H * L + 2 * L * H  # fc_mu, fc_logvar, z2h
               + T * (cell + 2 * H * d))   # decoder cell loop + readout
    flops = 3 * fwd
    f32 = 4
    act = 4 * B * H * 2 * T                # r,z,n,h per cell step, both RNNs
    hbm = f32 * (2 * act + 9 * n_params + 2 * B * T * d)
    return float(flops), float(hbm)


def csrae_flops_bytes(d_in: int, hidden_dims: tuple, latent: int, k: int,
                      batch: int, n_params: int) -> tuple[float, float]:
    """Analytic (flops, hbm_bytes) per MixtureCSRAE minibatch Adam step —
    MLP encoder trunk + μ/logσ heads, MLP decoder, and the K-component CS
    divergence's per-sample overlaps (``CS-RAE.py:8-113``); same counting
    conventions as the other models."""
    B, L = batch, latent
    enc_dims = (d_in, *hidden_dims)
    dec_dims = (L, *reversed(hidden_dims), d_in)
    enc = sum(2 * a * b for a, b in zip(enc_dims[:-1], enc_dims[1:]))
    dec = sum(2 * a * b for a, b in zip(dec_dims[:-1], dec_dims[1:]))
    fwd = B * (enc + 2 * 2 * hidden_dims[-1] * L + dec
               + k * L * 8)                 # q‖GMM overlap terms
    flops = 3 * fwd
    f32 = 4
    act = B * (2 * sum(hidden_dims) + 2 * L)   # trunk activations, both nets
    hbm = f32 * (2 * act + 9 * n_params + 2 * B * d_in)
    return float(flops), float(hbm)


def pick_serve_batch(p: int, hidden: int, vmem_bytes: float = 16 * 2**20,
                     lane: int = 128, lo: int = 128, hi: int = 16384,
                     elem_bytes: int = 4) -> int:
    """VMEM-locality serving batch: the largest lane-aligned batch whose
    per-step hidden-state working set — B·(p+1)·H·elem_bytes, the p
    decoder-head carries plus the error-VAE carry — fits the v5e core's
    ~16 MB VMEM.

    Anchored by the round-3 measured curve at p=20, H=64, f32 (RESULTS.md):
    the formula lands on 3072, exactly the measured throughput peak
    (1.25M samples/s); past it the states spill to HBM and throughput
    halves (4096: 803k, 8192: 512k).  Heuristic at other shapes — the
    anchor is the only measured curve — but the failure mode it guards
    against (state spill) is shape-generic.  ``elem_bytes=2`` (bf16
    serving) doubles the feasible batch.
    """
    b = int(vmem_bytes // ((p + 1) * hidden * elem_bytes))
    return max(lo, min(hi, (b // lane) * lane))


def generate_flops_bytes_per_sample(p: int, hidden: int, batch: int,
                                    rollout_len: int = 21,
                                    elem_bytes: int = 4) -> tuple[float, float]:
    """Serving: one compensated rollout sample = rollout_len error-VAE
    decoder steps + rollout_len × p CRVAE head steps (+ readouts), forward
    only.  Bytes per sample amortize the per-step parameter reads over the
    serving batch; hidden states round-trip HBM between steps.
    ``elem_bytes``: serving precision (4 = f32, 2 = bf16)."""
    H = hidden
    cell = 3 * 2 * H * (p + H)
    flops = rollout_len * (
        cell + 2 * H * p               # error-VAE decoder step + out
        + p * (cell + 2 * H))          # p heads + readouts
    head_params = p * (3 * H * (p + H) + 6 * H + H + 1)
    err_params = 3 * H * (p + H) + 6 * H + H * p + p
    param_bytes_per_step = elem_bytes * (head_params + err_params) / batch
    state_bytes = elem_bytes * 2 * (p + 1) * H     # h in+out per step
    out_bytes = elem_bytes * 2 * p                 # sample write + noise read
    hbm = rollout_len * (param_bytes_per_step + state_bytes + out_bytes)
    return float(flops), float(hbm)


def roofline_fields(steps_per_sec: float, flops: float, hbm: float,
                    device_kind: str) -> dict:
    """Roofline dict from per-step analytic (flops, bytes) and the achieved
    rate (steps/s, seed-steps/s, or samples/s — per whatever unit the
    analytic numbers describe).

    Two ceilings are reported.  ``roofline_ceiling_analytic`` assumes the
    analytic HBM byte LOWER bound is the real traffic (perfect fusion: every
    saved activation written+read exactly once) — an optimistic number the
    repo's own XLA cost audit disproves (``benchmarks/xla_cost_audit.py``
    sandwiches the flagship step's real traffic at up to 2.2× the LB).
    ``hbm_bytes_per_step_ub`` is the audit's sandwich upper bound
    (peak bytes/s ÷ measured rate — the step could not run faster than the
    chip streams); ``traffic_expansion_max`` is the resulting UB/LB ratio.
    For an hbm-bound step, the ACHIEVABLE ceiling therefore lies in
    [measured rate, analytic ceiling]; the closer ``traffic_expansion_max``
    is to 1, the closer the step provably runs to its true bandwidth bound.
    """
    ai = flops / hbm
    fields = {
        "flops_per_step": flops,
        "hbm_bytes_per_step_lb": hbm,
        "achieved_tflops": round(steps_per_sec * flops / 1e12, 3),
        "achieved_gbps_lb": round(steps_per_sec * hbm / 1e9, 1),
        "arith_intensity": round(ai, 2),
    }
    peaks = CHIP_PEAKS.get(device_kind)
    if peaks:
        ridge = peaks["flops"] / peaks["hbm_bytes"]   # FLOP/B at the ridge
        ub_bytes = peaks["hbm_bytes"] / steps_per_sec
        fields.update({
            "mfu_pct": round(100 * steps_per_sec * flops / peaks["flops"], 2),
            "hbm_pct_lb": round(100 * steps_per_sec * hbm / peaks["hbm_bytes"], 1),
            "roofline_bound": "hbm" if ai < ridge else "mxu",
            "roofline_ceiling_analytic_steps_per_sec": round(
                min(peaks["flops"] / flops, peaks["hbm_bytes"] / hbm), 1),
            "hbm_bytes_per_step_ub": round(ub_bytes, 1),
            "traffic_expansion_max": round(ub_bytes / hbm, 2),
        })
    return fields


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=None)
    ap.add_argument("--t", type=int, default=None)
    ap.add_argument("--context", type=int, default=None)
    ap.add_argument("--hidden", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=2000)
    # The axon relay's first ~5 post-compile dispatches run ~10x slow;
    # under-warming biases short measurements (see BASELINE.md notes).
    ap.add_argument("--warmup-chunks", type=int, default=6)
    ap.add_argument("--quick", action="store_true", help="300 timed steps")
    ap.add_argument("--workload",
                    choices=["train", "phase2", "longhorizon", "xl",
                             "generate", "latency", "sweep", "stream", "win",
                             "vrae", "csrae"],
                    default="train",
                    help="train = phase-1 steps/sec at p=20 (headline); "
                         "phase2 = generation-phase steps/sec (CRVAE SGD + "
                         "error-VAE Adam per step) at p=20; "
                         "longhorizon = ctx=128 fused decode path; "
                         "xl = p=128; generate = rollout serving throughput; "
                         "latency = single-stream serving latency (ms per "
                         "compensated rollout at small batch, device-side); "
                         "sweep = vmapped multi-seed phase-1 (seed-steps/s); "
                         "stream = phase-1 fed from a disk-backed series "
                         "via the native out-of-core loader; "
                         "win = W_in-variant stage-1 ISTA steps/sec "
                         "(henon6d shape); "
                         "vrae = plain-VRAE full-batch Adam epochs/sec; "
                         "csrae = MixtureCSRAE minibatch Adam steps/sec "
                         "(binarized-L96 pipeline)")
    ap.add_argument("--seeds", type=int, default=8,
                    help="seed count for --workload sweep")
    ap.add_argument("--serve-batch", type=int, default=None,
                    help="serving batch for --workload generate; default "
                         "auto = pick_serve_batch's VMEM-locality formula. "
                         "Measured curve on v5e at p=20 (round 3 A/B, "
                         "RESULTS.md): 512: 523k, 1024: 855k, 2048: 1155k, "
                         "3072: 1246k, 3584: 1147k, 4096: 803k, 8192: 512k "
                         "samples/s — the peak sits where the rollout's "
                         "hidden-state working set still fits VMEM; past "
                         "it the states spill to HBM and throughput cliffs")
    ap.add_argument("--serve-kernel", choices=["auto", "lax", "fused"],
                    default="auto",
                    help="rollout kernel for --workload latency: fused = "
                         "one Pallas kernel per rollout (wins at B <= 8, "
                         "-19%% at B=1), lax = the scanned path (wins at "
                         "throughput batches), auto = measured crossover "
                         "(train.crvae_trainer.LATENCY_FUSED_MAX_B)")
    ap.add_argument("--serve-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="rollout precision for --workload generate: "
                         "bfloat16 runs the generation weights/carries/gate "
                         "math in bf16 (f32 output), halving the VMEM "
                         "working set that bounds the serving batch — the "
                         "auto serve batch doubles accordingly")
    args = ap.parse_args()
    if args.quick:
        args.steps = 300

    shape = dict(WORKLOADS.get(args.workload, WORKLOADS["train"]))
    # The torch-CPU anchor is shape-specific: only report vs_baseline when
    # the run is at the anchored shape (overriding --p etc. clears it).
    args.anchor = TORCH_CPU_ANCHORS.get(args.workload)
    for k in ("p", "t", "context", "hidden", "batch"):
        if getattr(args, k) is not None and getattr(args, k) != shape[k]:
            args.anchor = None
        if getattr(args, k) is not None:
            shape[k] = getattr(args, k)
    if args.workload == "generate" and (args.serve_dtype != "float32"
                                        or args.serve_batch not in (None, 3072)):
        args.anchor = None               # anchored at B=3072 f32
    args.p, args.t, args.context = shape["p"], shape["t"], shape["context"]
    args.hidden, args.batch = shape["hidden"], shape["batch"]

    if args.workload == "generate":
        return bench_generate(args)
    if args.workload == "latency":
        return bench_latency(args)
    if args.workload == "phase2":
        return bench_phase2(args)
    if args.workload == "sweep":
        return bench_sweep(args)
    if args.workload == "stream":
        return bench_stream(args)
    if args.workload == "win":
        return bench_win(args)
    if args.workload == "vrae":
        return bench_vrae(args)
    if args.workload == "csrae":
        return bench_csrae(args)

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
    name = ("crvae_lorenz96_phase1_p20_steps_per_sec"
            if args.workload == "train" and args.p == 20
            else f"crvae_lorenz96_phase1_{args.workload}_p{args.p}"
                 f"_ctx{args.context}_steps_per_sec")
    out = {
        "metric": name,
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": (round(steps_per_sec / args.anchor, 2)
                        if args.anchor else None),
        "device": str(device.device_kind),
        "timed_steps": n_chunks * chunk_len,
        "final_loss": final_loss,
    }
    flops, hbm = phase1_flops_bytes(args.p, args.hidden, args.batch,
                                    args.context)
    out.update(roofline_fields(steps_per_sec, flops, hbm,
                               str(device.device_kind)))
    print(json.dumps(out))


def bench_stream(args):
    """Out-of-core phase-1 training at the north-star shape: minibatches
    stream host→device from a disk-backed series through the native C++
    window loader (``train/streaming.py``), one chunk prefetched ahead.

    The interesting number is the gap to the in-memory headline: it prices
    the host feed (B·ctx·p f32 per step through the host→device link — on
    the axon relay that link is the bottleneck, not the loader's mmap
    gather).  Training math is bitwise the in-memory run
    (tests/test_streaming.py)."""
    import pathlib
    import tempfile

    import numpy as np

    from vae_connexe_tpu.data import lorenz96
    from vae_connexe_tpu.data.native_loader import NativeWindowLoader
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.train import Phase1Config, fit_phase1_streaming

    series = lorenz96(jax.random.key(0), p=args.p, t=args.t)
    series_np = np.ascontiguousarray(np.asarray(series), np.float32)
    tmp = pathlib.Path(tempfile.mkdtemp())
    series_path = tmp / "series.f32"
    series_np.tofile(series_path)
    loader = NativeWindowLoader.from_file(str(series_path), *series_np.shape)

    model = CRVAE(p=args.p, hidden=args.hidden)
    chunk_len = 100
    warmup_steps = args.warmup_chunks * chunk_len
    cfg = Phase1Config(lam=0.1, lr=5e-2, batch_size=args.batch,
                       check_every=chunk_len,
                       max_iter=warmup_steps + args.steps)
    params = model.init(jax.random.key(1))
    parents = jnp.ones((args.p, args.p), jnp.float32)

    marks = []

    def callback(step, state, metrics):
        # fit's metric fetch already synced the chunk; timestamp the boundary.
        marks.append((step, time.perf_counter(), metrics["loss"]))

    io_stats = {}
    fit_phase1_streaming(model, params, loader, args.context, parents, cfg,
                         jax.random.key(2), callback=callback,
                         io_stats=io_stats)
    timed = [m for m in marks if m[0] >= warmup_steps]
    steps = timed[-1][0] - timed[0][0]
    dt = timed[-1][1] - timed[0][1]
    steps_per_sec = steps / dt
    feed_bytes = args.batch * args.context * args.p * 4
    total_wall = marks[-1][1] - marks[0][1] if len(marks) > 1 else dt

    device = jax.devices()[0]
    out = {
        "metric": f"crvae_lorenz96_phase1_stream_p{args.p}_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": (round(steps_per_sec / args.anchor, 2)
                        if args.anchor else None),
        "device": str(device.device_kind),
        "timed_steps": steps,
        "final_loss": timed[-1][2],
        "host_feed_mb_per_step": round(feed_bytes / 2**20, 3),
        "host_feed_gbps": round(steps_per_sec * feed_bytes / 1e9, 3),
        # Wall time blocked waiting for the next host gather, as % of the
        # post-first-chunk wall: ~0 means the prefetch thread fully hides
        # the C++ gather behind device compute.
        "io_stall_pct": round(100 * io_stats.get("gather_wait_s", 0.0)
                              / max(total_wall, 1e-9), 2),
    }
    flops, hbm = phase1_flops_bytes(args.p, args.hidden, args.batch,
                                    args.context)
    out.update(roofline_fields(steps_per_sec, flops, hbm,
                               str(device.device_kind)))
    print(json.dumps(out))


def bench_phase2(args):
    """Generation-phase training steps/sec: one step = CRVAE forward +
    backward + SGD + mask projection (λ = 0) PLUS the error VAE's Adam
    step on the stop-gradient residuals — the reference's phase-2
    iteration (``author_CRVAE.py:612-646``), which its drivers run for
    2× as many iterations as phase 1."""
    import optax

    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.train import Phase2Config
    from vae_connexe_tpu.train.crvae_trainer import (
        Phase2State,
        make_phase2_step,
    )

    series = lorenz96(jax.random.key(0), p=args.p, t=args.t)
    windows, _ = arrange_input(series, args.context)

    model = CRVAE(p=args.p, hidden=args.hidden)
    err = ErrorVAE(d=args.p, hidden=args.hidden)
    cfg = Phase2Config(lr=5e-2, batch_size=args.batch, check_every=100)
    params = model.init(jax.random.key(1))
    err_params = err.init(jax.random.key(2))
    # Fully dense structure mask.  Timing is density-invariant (the mask
    # multiplies full-width static-shape weights, so FLOPs don't change
    # with sparsity) — dense is simply the worst case and needs no truth.
    parents = jnp.ones((args.p, args.p), jnp.float32)
    err_opt = optax.adam(cfg.lr_error)
    step = make_phase2_step(model, err, cfg, windows, parents, err_opt)

    chunk_len = 100

    @jax.jit
    def run_chunk(state):
        return jax.lax.scan(step, state, None, length=chunk_len)

    state = Phase2State(params=params, err_params=err_params,
                        err_opt=err_opt.init(err_params), prior=None,
                        best_params=params, best_loss=jnp.array(jnp.inf),
                        key=jax.random.key(3), step=jnp.zeros([], jnp.int32))

    m = None
    for _ in range(args.warmup_chunks):
        state, m = run_chunk(state)
    if m is not None:
        _ = float(m["recon"][-1])

    n_chunks = max(1, args.steps // chunk_len)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, m = run_chunk(state)
    final_recon = float(m["recon"][-1])
    dt = time.perf_counter() - t0

    steps_per_sec = n_chunks * chunk_len / dt
    out = {
        "metric": f"crvae_lorenz96_phase2_p{args.p}_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": (round(steps_per_sec / args.anchor, 2)
                        if args.anchor else None),
        "device": str(jax.devices()[0].device_kind),
        "timed_steps": n_chunks * chunk_len,
        "final_recon": final_recon,
    }
    flops, hbm = phase2_flops_bytes(args.p, args.hidden, args.batch,
                                    args.context)
    out.update(roofline_fields(steps_per_sec, flops, hbm,
                               str(jax.devices()[0].device_kind)))
    print(json.dumps(out))


def bench_win(args):
    """W_in-variant stage-1 steps/sec: one step = teacher-forced forward
    (encoder GRU + per-head W_in projection + d head GRUs) + backward +
    Adam on everything but W_in + the ISTA prox on W_in — the reference
    re-implementation's discovery iteration (``CRVAE.py:153-199``), run
    through the production jitted epoch-block runner
    (``WInTrainer._get_run``).  Shape defaults to henon6d_win's geometry;
    ``--p/--hidden/--batch`` override."""
    from vae_connexe_tpu.data import coupled_henon, sliding_windows
    from vae_connexe_tpu.models import WInCRVAE
    from vae_connexe_tpu.train import WInTrainConfig, WInTrainer

    tau = args.context // 2
    series = coupled_henon(jax.random.key(0), t=args.t, d=args.p)
    windows = sliding_windows(series, 2 * tau)

    model = WInCRVAE(d=args.p, hidden=args.hidden, latent=32, tau=tau)
    cfg = WInTrainConfig(batch_size=args.batch)
    trainer = WInTrainer(model, cfg)
    state = trainer.init_state(model.init(jax.random.key(1)),
                               jax.random.key(2))
    run = trainer._get_run(stage=1)

    n_batches = windows.shape[0] // args.batch
    epochs_per_chunk = max(1, 100 // n_batches)
    steps_per_chunk = epochs_per_chunk * n_batches

    key = jax.random.key(3)
    m = None
    for _ in range(args.warmup_chunks):
        key, k = jax.random.split(key)
        state, m = run(state, jax.random.split(k, epochs_per_chunk), windows)
    if m is not None:
        _ = float(m["loss"][-1])                # device->host sync

    n_chunks = max(1, args.steps // steps_per_chunk)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        state, m = run(state, jax.random.split(k, epochs_per_chunk), windows)
    final_loss = float(m["loss"][-1])           # sync (CLAUDE.md timing rule)
    dt = time.perf_counter() - t0

    steps_per_sec = n_chunks * steps_per_chunk / dt
    out = {
        "metric": f"win_stage1_p{args.p}_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": (round(steps_per_sec / args.anchor, 2)
                        if args.anchor else None),
        "device": str(jax.devices()[0].device_kind),
        "timed_steps": n_chunks * steps_per_chunk,
        "batch": args.batch,
        "final_loss": round(final_loss, 4),
    }
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    flops, hbm = win_flops_bytes(args.p, args.hidden, model.latent, tau,
                                 args.batch, n_params)
    out.update(roofline_fields(steps_per_sec, flops, hbm,
                               str(jax.devices()[0].device_kind)))
    print(json.dumps(out))


def bench_vrae(args):
    """Plain-VRAE training steps/sec: one step = a full-batch Adam epoch
    (encoder GRU + stochastic-teacher-forcing decoder cell loop + β-VAE
    loss) — the reference's training unit (``VRAE.py:150-169``, full batch
    per epoch).  Constant tf_ratio=0.5 in the hot loop (the schedule is a
    host-side float per epoch and doesn't change the compiled step);
    random (N, T, D) data as in the reference's demo (``VRAE.py:185-204``).
    Shape: --batch = N (full batch), --t = sequence length, --p = D."""
    import optax

    from vae_connexe_tpu.models import VRAE

    model = VRAE(input_dim=args.p, hidden_dim=args.hidden, latent_dim=32,
                 output_activation="tanh")
    data = jax.random.normal(jax.random.key(0), (args.batch, args.t, args.p))
    params = model.init(jax.random.key(1))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    tf_ratio = jnp.float32(0.5)

    def step(carry, k):
        params, opt_state = carry

        def loss_fn(p):
            recon, mu, logvar = model.forward(p, data, k, tf_ratio)
            total, rec, kld = model.loss(recon, data, mu, logvar, 1.0)
            return total, rec

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), total

    chunk_len = 100

    @jax.jit
    def run_chunk(carry, key):
        return jax.lax.scan(step, carry, jax.random.split(key, chunk_len))

    carry = (params, opt_state)
    key = jax.random.key(2)
    total = None
    for _ in range(args.warmup_chunks):
        key, k = jax.random.split(key)
        carry, total = run_chunk(carry, k)
    if total is not None:
        _ = float(total[-1])                    # device->host sync

    n_chunks = max(1, args.steps // chunk_len)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        carry, total = run_chunk(carry, k)
    final_loss = float(total[-1])               # sync (CLAUDE.md timing rule)
    dt = time.perf_counter() - t0

    steps_per_sec = n_chunks * chunk_len / dt
    out = {
        "metric": f"vrae_fullbatch_d{args.p}_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": (round(steps_per_sec / args.anchor, 2)
                        if args.anchor else None),
        "device": str(jax.devices()[0].device_kind),
        "timed_steps": n_chunks * chunk_len,
        "full_batch_n": args.batch,
        "seq_len": args.t,
        "final_loss": round(final_loss, 4),
    }
    n_params = sum(x.size for x in jax.tree.leaves(params))
    flops, hbm = vrae_flops_bytes(args.p, args.hidden, model.latent, args.t,
                                  args.batch, n_params)
    out.update(roofline_fields(steps_per_sec, flops, hbm,
                               str(jax.devices()[0].device_kind)))
    print(json.dumps(out))


def bench_csrae(args):
    """MixtureCSRAE training steps/sec: one step = a minibatch Adam update
    of encoder + Bernoulli-logit decoder + learnable GMM prior under
    BCE + λ_cs·CS divergence (``CS-RAE.py:115-155``), at the
    csrae_binarized experiment's data pipeline (binarized flattened
    Lorenz-96 windows) and literals.  Per-step compute matches
    ``fit_csrae``'s scanned epoch steps (one B-row gather + fwd/bwd/Adam);
    the bench gathers each batch uniformly instead of walking a
    per-epoch permutation — identical work per step."""
    import optax

    from vae_connexe_tpu.configs import get_experiment
    from vae_connexe_tpu.configs.experiments import (_make_dataset,
                                                     make_csrae_inputs)

    exp = get_experiment("csrae_binarized")
    series, _ = _make_dataset(exp, jax.random.key(0))
    x, model = make_csrae_inputs(exp, series)
    params = model.init(jax.random.key(1))
    opt = optax.adam(exp.csrae.lr)
    opt_state = opt.init(params)
    bs = args.batch

    def step(carry, k):
        params, opt_state = carry
        k_b, k_e = jax.random.split(k)
        idx = jax.random.randint(k_b, (bs,), 0, x.shape[0])
        batch = jnp.take(x, idx, axis=0)

        def loss_fn(p):
            total, bce, cs = model.loss(p, batch, k_e)
            return total, bce

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), total

    chunk_len = 100

    @jax.jit
    def run_chunk(carry, key):
        return jax.lax.scan(step, carry, jax.random.split(key, chunk_len))

    carry = (params, opt_state)
    key = jax.random.key(2)
    total = None
    for _ in range(args.warmup_chunks):
        key, k = jax.random.split(key)
        carry, total = run_chunk(carry, k)
    if total is not None:
        _ = float(total[-1])                    # device->host sync

    n_chunks = max(1, args.steps // chunk_len)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        carry, total = run_chunk(carry, k)
    final_loss = float(total[-1])               # sync (CLAUDE.md timing rule)
    dt = time.perf_counter() - t0

    steps_per_sec = n_chunks * chunk_len / dt
    out = {
        "metric": f"csrae_adam_din{model.input_dim}_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": (round(steps_per_sec / args.anchor, 2)
                        if args.anchor else None),
        "device": str(jax.devices()[0].device_kind),
        "timed_steps": n_chunks * chunk_len,
        "batch": bs,
        "input_dim": model.input_dim,
        "final_loss": round(final_loss, 4),
    }
    n_params = sum(v.size for v in jax.tree.leaves(params))
    flops, hbm = csrae_flops_bytes(model.input_dim, model.hidden_dims,
                                   model.latent_dim, model.k, bs, n_params)
    out.update(roofline_fields(steps_per_sec, flops, hbm,
                               str(jax.devices()[0].device_kind)))
    print(json.dumps(out))


def bench_sweep(args):
    """Vmapped multi-seed phase-1 sweep throughput (seed-steps/sec): S
    independent models train simultaneously in one compiled program — the
    BASELINE.json north-star sweep mode (single-chip here; on a mesh the
    seed axis shards over dp, see ``parallel/seed_sweep.py``)."""
    from vae_connexe_tpu.data import arrange_input, lorenz96
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.parallel.seed_sweep import make_sweep_fn
    from vae_connexe_tpu.train import Phase1Config

    series = lorenz96(jax.random.key(0), p=args.p, t=args.t)
    windows, _ = arrange_input(series, args.context)
    model = CRVAE(p=args.p, hidden=args.hidden)
    parents = jnp.ones((args.p, args.p), jnp.float32)
    seeds = jnp.arange(args.seeds)
    n_iter = max(100, args.steps // 2)
    cfg = Phase1Config(lam=0.1, lr=5e-2, batch_size=args.batch,
                       max_iter=n_iter, resample_batches=True)

    # Build the compiled sweep ONCE (make_sweep_fn; a fresh build per call
    # would re-trace the whole S×max_iter program), then warm the
    # executable past the relay's slow-ramp dispatches before timing.
    run = make_sweep_fn(model, windows, parents, cfg)
    for i in range(4):
        out = run(seeds)
        _ = float(out["mean_loss"][-1])
    t0 = time.perf_counter()
    out = run(seeds)
    mean_loss = float(out["mean_loss"][-1])            # scalar sync
    dt = time.perf_counter() - t0

    seed_steps = args.seeds * n_iter / dt
    out = {
        "metric": f"crvae_lorenz96_sweep_p{args.p}_seed_steps_per_sec",
        "value": round(seed_steps, 2),
        "unit": "seed-steps/sec",
        # Per-seed ratio — comparable to the train workload's vs_baseline
        # (the aggregate ratio would inflate linearly with --seeds).
        "vs_baseline": (round(seed_steps / args.seeds / args.anchor, 2)
                        if args.anchor else None),
        "aggregate_vs_baseline": (round(seed_steps / args.anchor, 2)
                                  if args.anchor else None),
        "seeds": args.seeds,
        "iters_per_seed": n_iter,
        "final_mean_loss": mean_loss,
        "device": str(jax.devices()[0].device_kind),
    }
    # Per seed-step analytics = one phase-1 step (each seed carries its own
    # params, so param traffic scales with seeds exactly as the unit does).
    flops, hbm = phase1_flops_bytes(args.p, args.hidden, args.batch,
                                    args.context)
    out.update(roofline_fields(seed_steps, flops, hbm,
                               str(jax.devices()[0].device_kind)))
    print(json.dumps(out))


def bench_generate(args):
    """Serving throughput: compensated 21-step rollouts (samples/sec).

    Measures the DEVICE by scanning ``n_gens`` full generations inside one
    jitted dispatch and syncing once: each host→device call on this relay
    costs ~3.2 ms (measured round 2 — a trivial jitted op times the same
    as a whole generation), so a per-call loop benchmarks the relay, not
    the chip.  Production batch serving amortizes dispatch the same way.
    """
    import functools

    import jax.numpy as jnp

    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.train import generate_with_compensation

    model = CRVAE(p=args.p, hidden=args.hidden)
    err = ErrorVAE(d=args.p, hidden=args.hidden)
    params = model.init(jax.random.key(0))
    err_params = err.init(jax.random.key(1))
    parents = jnp.ones((args.p, args.p), jnp.float32)
    serve_dtype = (jnp.bfloat16 if args.serve_dtype == "bfloat16" else None)
    elem_bytes = 2 if serve_dtype is not None else 4
    batch = (args.serve_batch if args.serve_batch
             else pick_serve_batch(args.p, args.hidden,
                                   elem_bytes=elem_bytes))
    n_gens = 50

    # Params as jit arguments, not closure constants — baked-in constants
    # blow the remote-compile request size at scaled configs (CLAUDE.md).
    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_many(prms, eprms, key, n):
        def one(acc, k):
            out = generate_with_compensation(model, err, prms, eprms, k,
                                             batch, parents=parents,
                                             dtype=serve_dtype)
            return acc + out.sum(), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0),
                              jax.random.split(key, n), length=n)
        return acc

    # ~6 warmup dispatches (the relay's first ~5 post-compile dispatches
    # run slow — CLAUDE.md), then time several and report the median with
    # the observed range.
    for i in range(6):
        acc = gen_many(params, err_params, jax.random.key(i), n_gens)
        _ = float(acc)                                     # scalar sync
    rates = []
    for i in range(3):
        t0 = time.perf_counter()
        acc = gen_many(params, err_params, jax.random.key(99 + i), n_gens)
        _ = float(acc)
        rates.append(n_gens * batch / (time.perf_counter() - t0))
    rates.sort()
    out = {
        "metric": f"crvae_p{args.p}_rollout_samples_per_sec",
        "value": round(rates[1], 1),                       # median of 3
        "unit": "samples/sec",
        "vs_baseline": (round(rates[1] / args.anchor, 2)
                        if args.anchor else None),
        "range": [round(rates[0], 1), round(rates[-1], 1)],
        "rollout_len": model.rollout_len,
        "batch": batch,
        "serve_dtype": args.serve_dtype,
        "gens_per_dispatch": n_gens,
        "device": str(jax.devices()[0].device_kind),
    }
    flops, hbm = generate_flops_bytes_per_sample(args.p, args.hidden, batch,
                                                 model.rollout_len,
                                                 elem_bytes=elem_bytes)
    out.update(roofline_fields(rates[1], flops, hbm,
                               str(jax.devices()[0].device_kind)))
    print(json.dumps(out))


def bench_latency(args):
    """Single-stream serving latency: ms per compensated rollout at small
    batch (default B=1 — one request).

    Two numbers matter for a latency SLO and they are an order of
    magnitude apart on this runtime:

    - ``device_ms`` — the chip's sequential-chain time per generation,
      measured by scanning ``n_gens`` generations in ONE dispatch (the
      scan carry serializes them) and dividing.  This is what the
      hardware owes you and what batching/continuous-batching schedulers
      amortize against.
    - ``e2e_dispatch_ms`` — one un-batched jitted call through the axon
      relay, i.e. what a naive request→device→response loop would see.
      The relay's per-dispatch floor (~3.2 ms measured round 2) dominates
      at small batch, which is exactly why the serving daemon batches.

    The throughput-optimal configuration lives in ``--workload generate``;
    this workload pins the other end of the latency/throughput frontier.
    """
    import functools

    import jax.numpy as jnp

    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.train import generate_with_compensation

    model = CRVAE(p=args.p, hidden=args.hidden)
    err = ErrorVAE(d=args.p, hidden=args.hidden)
    params = model.init(jax.random.key(0))
    err_params = err.init(jax.random.key(1))
    parents = jnp.ones((args.p, args.p), jnp.float32)
    serve_dtype = (jnp.bfloat16 if args.serve_dtype == "bfloat16" else None)
    batch = args.serve_batch if args.serve_batch else 1
    if args.serve_kernel == "fused" and serve_dtype is not None:
        raise SystemExit("--serve-kernel fused is float32-only; drop "
                         "--serve-dtype bfloat16 or use the lax kernel")
    # Resolve 'auto' HERE (same rule generate_with_compensation applies) so
    # the emitted JSON records the kernel actually measured, not the flag.
    kernel = args.serve_kernel
    if kernel == "auto":
        from vae_connexe_tpu.train.crvae_trainer import (
            LATENCY_FUSED_MAX_B, _fused_serving_fits)
        kernel = ("fused" if (serve_dtype is None
                              and batch <= LATENCY_FUSED_MAX_B
                              and jax.default_backend() == "tpu"
                              and _fused_serving_fits(model, err, batch))
                  else "lax")
    n_gens = 200

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_chain(prms, eprms, key, n):
        def one(acc, k):
            out = generate_with_compensation(model, err, prms, eprms, k,
                                             batch, parents=parents,
                                             dtype=serve_dtype,
                                             kernel=kernel)
            # The carry dependency serializes generations: iteration i+1
            # cannot start before i's samples exist, so dt/n is the true
            # per-generation device latency, not overlapped throughput.
            return acc + out.sum(), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0),
                              jax.random.split(key, n), length=n)
        return acc

    @jax.jit
    def gen_one(prms, eprms, key):
        return generate_with_compensation(model, err, prms, eprms, key,
                                          batch, parents=parents,
                                          dtype=serve_dtype,
                                          kernel=kernel).sum()

    for i in range(6):                                     # relay warmup
        _ = float(gen_chain(params, err_params, jax.random.key(i), n_gens))
        _ = float(gen_one(params, err_params, jax.random.key(i)))
    dev_ms = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(gen_chain(params, err_params, jax.random.key(99 + i),
                            n_gens))
        dev_ms.append((time.perf_counter() - t0) * 1e3 / n_gens)
    e2e_ms = []
    for i in range(20):
        t0 = time.perf_counter()
        _ = float(gen_one(params, err_params, jax.random.key(200 + i)))
        e2e_ms.append((time.perf_counter() - t0) * 1e3)
    dev_ms.sort()
    e2e_ms.sort()
    out = {
        "metric": f"crvae_p{args.p}_rollout_latency_ms",
        "value": round(dev_ms[1], 4),                      # median of 3
        "unit": "ms/generation (device)",
        # Speedup ratio (torch CPU ms / device ms) — higher is better,
        # consistent with the throughput workloads' vs_baseline direction.
        "vs_baseline": (round(args.anchor / dev_ms[1], 2)
                        if args.anchor else None),
        "range": [round(dev_ms[0], 4), round(dev_ms[-1], 4)],
        "e2e_dispatch_ms_p50": round(e2e_ms[len(e2e_ms) // 2], 3),
        "rollout_len": model.rollout_len,
        "batch": batch,
        "serve_dtype": args.serve_dtype,
        "serve_kernel": kernel,
        "gens_per_dispatch": n_gens,
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
