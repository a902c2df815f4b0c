"""bf16 serving fidelity on TRAINED flagship weights (lorenz96_crvae).

Exports the trained phase-2 generator as f32 and bf16 artifacts, draws
the same-seed sample batches from both, and compares (a) each against the
real Lorenz-96 series moments (the reference's generation ritual) and
(b) f32 vs bf16 directly.
"""
import json
import os
import sys

# Repo root on sys.path AFTER interpreter startup: exporting PYTHONPATH
# breaks the axon plugin registration (see sweep_batching_bench.py).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vae_connexe_tpu.data import lorenz96
from vae_connexe_tpu.evals import moment_match
from vae_connexe_tpu.models import CRVAE, ErrorVAE
from vae_connexe_tpu.serving import export_generator, load_generator
from vae_connexe_tpu.utils import restore_checkpoint

ckpt = sys.argv[1]
p, hidden = 10, 64
model, err = CRVAE(p=p, hidden=hidden), ErrorVAE(d=p, hidden=hidden)
target = {"crvae": model.init(jax.random.key(0)),
          "error_vae": err.init(jax.random.key(0))}
state = restore_checkpoint(ckpt, target)

batch = 512
blob32 = export_generator(model, err, state["crvae"], state["error_vae"],
                          batch=batch)
blob16 = export_generator(model, err, state["crvae"], state["error_vae"],
                          batch=batch, serve_dtype="bfloat16")
fn32, _ = load_generator(blob32)
fn16, _ = load_generator(blob16)

s32 = np.concatenate([fn32(s) for s in range(8)])       # (4096, 21, 10)
s16 = np.concatenate([fn16(s) for s in range(8)])

series = np.asarray(lorenz96(jax.random.key(0), p=p, t=2048))
mm32 = {k: np.asarray(v) for k, v in moment_match(jnp.asarray(series),
                                                  jnp.asarray(s32)).items()}
mm16 = {k: np.asarray(v) for k, v in moment_match(jnp.asarray(series),
                                                  jnp.asarray(s16)).items()}

out = {
    "samples_per_artifact": int(s32.shape[0]),
    "f32_mean_gap_vs_real": round(float(mm32["mean_abs_gap"].mean()), 5),
    "f32_std_gap_vs_real": round(float(mm32["std_abs_gap"].mean()), 5),
    "bf16_mean_gap_vs_real": round(float(mm16["mean_abs_gap"].mean()), 5),
    "bf16_std_gap_vs_real": round(float(mm16["std_abs_gap"].mean()), 5),
    "bf16_vs_f32_mean_gap": round(float(np.abs(
        s32.reshape(-1, p).mean(0) - s16.reshape(-1, p).mean(0)).mean()), 6),
    "bf16_vs_f32_std_gap": round(float(np.abs(
        s32.reshape(-1, p).std(0) - s16.reshape(-1, p).std(0)).mean()), 6),
    "max_elementwise_diff_same_seed": round(float(
        np.abs(s32 - s16).max()), 4),
}
print(json.dumps(out))
