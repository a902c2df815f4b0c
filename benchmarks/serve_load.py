"""Concurrent-load measurement of the HTTP serving daemon.

One daemon serving BOTH ends of the measured serving frontier
(RESULTS.md round 3):

- ``throughput``: the lax bf16 artifact at the VMEM-optimal batch
  (``bench.pick_serve_batch(elem_bytes=2)`` — 6144 at p=20/H=64), and
- ``latency``: the fused Pallas rollout chain at B=8 (the measured
  single-stream crossover, f32, TPU-only lowering),

then k client threads hammer each route for a fixed duration and we record
end-to-end request throughput (samples/s through HTTP, including JSON/npy
encode and the axon relay's per-dispatch cost) and client-side latency
percentiles.  Dispatch is lock-serialized in the daemon, so added clients
should raise queue depth and p95 while aggregate samples/s stays roughly
flat once the device is saturated — that saturation point is what this
tool locates.

Weights are fresh inits: serving throughput is weight-independent, and the
export/serve path is identical to a trained artifact's.

Usage (on the TPU host):
    python benchmarks/serve_load.py --duration 20 --clients 1 4 16
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

# Repo root on sys.path (run as `python benchmarks/serve_load.py`).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(host, port, path, body, timeout=300):
    req = urllib.request.Request(
        f"http://{host}:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return np.load(io.BytesIO(r.read()))


def _get(host, port, path):
    with urllib.request.urlopen(f"http://{host}:{port}{path}",
                                timeout=60) as r:
        return json.loads(r.read())


def hammer(host, port, route, n_clients, duration_s, body):
    """k threads posting back-to-back for duration_s; returns aggregate
    samples/s + client-side latency percentiles."""
    lat, n_samples, stop = [], [0], time.perf_counter() + duration_s
    lock = threading.Lock()

    def client():
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            samples = _post(host, port, route, body)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                n_samples[0] += samples.shape[0]

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(lat)
    return {
        "clients": n_clients,
        "requests": len(lat),
        "samples_per_sec": round(n_samples[0] / wall, 1),
        "latency_ms": {
            "p50": round(1e3 * float(np.percentile(arr, 50)), 2),
            "p95": round(1e3 * float(np.percentile(arr, 95)), 2),
            "p99": round(1e3 * float(np.percentile(arr, 99)), 2),
            "mean": round(1e3 * float(arr.mean()), 2),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--latency-batch", type=int, default=8,
                    help="fused low-latency artifact's batch (<= the "
                         "measured crossover LATENCY_FUSED_MAX_B)")
    args = ap.parse_args()

    import jax

    from vae_connexe_tpu.models import CRVAE, ErrorVAE
    from vae_connexe_tpu.server import GeneratorServer
    from vae_connexe_tpu.serving import export_generator

    import bench  # repo root on sys.path when run from the checkout

    model = CRVAE(p=args.p, hidden=args.hidden)
    err = ErrorVAE(d=args.p, hidden=args.hidden)
    params = model.init(jax.random.key(0))
    err_params = err.init(jax.random.key(1))

    b_thr = bench.pick_serve_batch(args.p, args.hidden, elem_bytes=2)
    artifacts = {
        "throughput": export_generator(model, err, params, err_params,
                                       batch=b_thr, serve_dtype="bfloat16"),
    }
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        artifacts["latency"] = export_generator(
            model, err, params, err_params, batch=args.latency_batch,
            kernel="fused", platforms=["tpu"])
    else:
        print(json.dumps({"note": "no TPU backend: fused latency artifact "
                                  "skipped; measuring lax only"}))
        artifacts["latency"] = export_generator(
            model, err, params, err_params, batch=args.latency_batch)

    srv = GeneratorServer(artifacts)
    srv.start()
    try:
        results = {"p": args.p, "hidden": args.hidden,
                   "throughput_batch": b_thr,
                   "latency_batch": args.latency_batch,
                   "latency_kernel": "fused" if on_tpu else "lax",
                   "duration_s": args.duration, "routes": {}}
        cases = (
            # (result key, route, request body) — the first two match the
            # round-4 pre-FairLock table for before/after comparability;
            # "coalesced" sends 1-sample "seed": null requests (the daemon
            # shares dispatches FIFO); "f16-wire" halves the 10 MB response.
            ("/generate/throughput", "/generate/throughput", {"seed": 0}),
            ("/generate/latency", "/generate/latency", {"seed": 0}),
            ("/generate/latency [coalesced n=1]", "/generate/latency",
             {"seed": None, "n_samples": 1}),
            ("/generate/throughput [f16 wire]", "/generate/throughput",
             {"seed": 0, "wire_dtype": "float16"}),
        )
        for key, route, body in cases:
            # one warm request outside the timed window
            _post(srv.host, srv.port, route, body)
            name = route.rsplit("/", 1)[1]
            m0 = _get(srv.host, srv.port, "/meta/" + name)
            rows = [hammer(srv.host, srv.port, route, k, args.duration, body)
                    for k in args.clients]
            meta = _get(srv.host, srv.port, "/meta/" + name)
            entry = {"rows": rows, "server_generate_ms": meta["generate_ms"]}
            d_req = meta["requests"] - m0["requests"]
            d_calls = meta["device_calls"] - m0["device_calls"]
            if d_calls:
                entry["requests_per_device_call"] = round(d_req / d_calls, 2)
            results["routes"][key] = entry
        print(json.dumps(results, indent=2))
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
