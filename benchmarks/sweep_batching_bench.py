"""Microbench: vmap-over-seeds vs seeds-folded-into-heads for the decode
recurrence + grad (the multi-seed sweep's dominant cost; RESULTS.md round 3
"vmapped-sweep overhead").  Run from the repo root on the TPU."""
import os
import sys
import time

# Repo root on sys.path AFTER interpreter startup: exporting PYTHONPATH
# instead breaks the axon TPU backend registration in sitecustomize.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vae_connexe_tpu.ops.gru import gru_scan_heads, init_stacked_gru, batched_dispatch

S, P, B, T, D, H = 8, 20, 256, 10, 20, 64
x = jax.random.normal(jax.random.key(0), (S, B, T, D))
params_s = jax.vmap(lambda k: init_stacked_gru(k, P, D, H))(
    jax.random.split(jax.random.key(1), S))
h0 = jnp.zeros((P, B, H))

def loss_one(p, xi):
    outs, hT = gru_scan_heads(p, xi, h0)
    return (outs.astype(jnp.float32) ** 2).mean() + (hT ** 2).mean()

def loss_vmap(ps):
    return jax.vmap(loss_one)(ps, x).sum()

# merged: (S*P) heads, per-head inputs (S*P, B, T, D)
params_m = jax.tree.map(lambda a: a.reshape((S * P,) + a.shape[2:]), params_s)
x_m = jnp.repeat(x, P, axis=0)          # (S*P, B, T, D) — head i gets its seed's batch
h0_m = jnp.zeros((S * P, B, H))

def loss_merged(pm):
    outs, hT = gru_scan_heads(pm, x_m, h0_m)
    return (outs.astype(jnp.float32) ** 2).mean() + (hT ** 2).mean()

def timeit(f, arg, label, n=30):
    g = jax.jit(jax.grad(f))
    o = g(arg); jax.tree.leaves(o)[0].block_until_ready()
    for _ in range(5):
        o = g(arg)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = g(arg)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e6:.0f} us/step")
    return dt

with batched_dispatch(S):
    t_v = timeit(loss_vmap, params_s, "vmap-over-seeds (in-cell dispatch)")
t_v2 = timeit(loss_vmap, params_s, "vmap-over-seeds (plain dispatch)")
t_m = timeit(loss_merged, params_m, "merged S*P heads")
print(f"merged/vmap ratio: {t_m/min(t_v,t_v2):.2f}")
