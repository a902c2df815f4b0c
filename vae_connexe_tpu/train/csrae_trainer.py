"""MixtureCSRAE training loop.

The reference ships the CS-RAE as a library with no driver
(``/root/reference/CS-RAE.py`` has no ``__main__``); this Adam minibatch loop
formalizes the obvious one: minimize BCE + λ_cs·CS over shuffled batches,
training encoder, decoder, and the GMM prior jointly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vae_connexe_tpu.models.csrae import MixtureCSRAE, MixtureCSRAEParams


def fit_csrae(model: MixtureCSRAE, params: MixtureCSRAEParams, data: jax.Array,
              key: jax.Array, epochs: int = 10, batch_size: int = 128,
              lr: float = 1e-3, verbose: bool = False, log_fn=print):
    """Train on (N, input_dim) data.  Returns (params, last metrics)."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = (data.shape[0] // batch_size) * batch_size

    @jax.jit
    def epoch_fn(params, opt_state, key):
        k_perm, k_eps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, data.shape[0])[:n]
        batches = jnp.take(data, perm, axis=0).reshape(-1, batch_size, data.shape[-1])
        eps_keys = jax.random.split(k_eps, batches.shape[0])

        def step(carry, inputs):
            params, opt_state = carry
            batch, k = inputs

            def loss_fn(p):
                total, bce, cs = model.loss(p, batch, k)
                return total, (bce, cs)

            (total, (bce, cs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {"total": total, "bce": bce, "cs": cs}

        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), (batches, eps_keys))
        return params, opt_state, metrics

    metrics = {}
    for epoch in range(epochs):
        key, k_e = jax.random.split(key)
        params, opt_state, m = epoch_fn(params, opt_state, k_e)
        metrics = {k: float(v.mean()) for k, v in m.items()}
        if verbose:
            log_fn(f"[csrae epoch={epoch}] " +
                   " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
    return params, metrics
