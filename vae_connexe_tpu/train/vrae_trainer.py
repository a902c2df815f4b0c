"""VRAE training loop (reference ``/root/reference/VRAE.py:150-169``):
full-batch Adam with a per-epoch teacher-forcing schedule and β-VAE loss.

The schedule is host-side (a float per epoch); everything else is one jitted
step.  Epochs with the same teacher-forcing ratio reuse the compiled step —
the ratio is a traced scalar input, not a static.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from vae_connexe_tpu.models.vrae import VRAE, VRAEParams


def fit_vrae(model: VRAE, params: VRAEParams, data: jax.Array, key: jax.Array,
             epochs: int = 10, lr: float = 1e-3, beta: float = 1.0,
             teacher_forcing_schedule: Optional[Callable[[int], float]] = None,
             verbose: bool = False, log_fn=print):
    """Train on a (N, T, D) tensor, full batch per epoch.  Returns
    (params, last metrics)."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key, tf_ratio):
        def loss_fn(p):
            recon, mu, logvar = model.forward(p, data, key, tf_ratio)
            total, rec, kld = model.loss(recon, data, mu, logvar, beta)
            return total, (rec, kld)

        (total, (rec, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, rec, kld

    metrics = {}
    for epoch in range(epochs):
        tf_ratio = (teacher_forcing_schedule(epoch)
                    if teacher_forcing_schedule else 1.0)
        key, k_step = jax.random.split(key)
        params, opt_state, total, rec, kld = step(
            params, opt_state, k_step, jnp.float32(tf_ratio))
        metrics = {"total": float(total), "rec": float(rec), "kld": float(kld),
                   "tf_ratio": tf_ratio}
        if verbose and epoch % 10 == 0:
            log_fn(f"[vrae epoch={epoch}] " +
                   " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
    return params, metrics
