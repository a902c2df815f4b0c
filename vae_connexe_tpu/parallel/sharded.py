"""Mesh-sharded training steps: the full phase-1 update (forward, backward,
SGD, prox, latent regularizer) compiled over a (dp, ep) mesh.

Sharding layout:

- batch windows: leading axis over ``dp`` — the loss means reduce across
  devices via an XLA ``psum`` that pjit inserts automatically;
- stacked decoder heads (GRU + readout): leading head axis over ``ep`` —
  the p per-variable decoders are independent (EP-like), so their
  parameters, gradients, and prox updates never cross devices;
- encoder / latent layers: replicated (they are tiny).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_connexe_tpu.models.crvae import CRVAE, CRVAEParams
from vae_connexe_tpu.train.config import Phase1Config
from vae_connexe_tpu.train.crvae_trainer import _crvae_loss, _project_and_prox


def crvae_param_spec() -> CRVAEParams:
    """PartitionSpec pytree for CRVAEParams: heads on ep, the rest replicated."""
    from vae_connexe_tpu.ops.gru import GRUParams
    from vae_connexe_tpu.utils.layers import Dense

    rep2 = Dense(w=P(), b=P())
    return CRVAEParams(
        enc=GRUParams(w_ih=P(), w_hh=P(), b_ih=P(), b_hh=P()),
        fc_mu=rep2,
        fc_std=rep2,
        heads=GRUParams(w_ih=P("ep"), w_hh=P("ep"), b_ih=P("ep"), b_hh=P("ep")),
        readout=Dense(w=P("ep"), b=P("ep")),
    )


def make_sharded_phase1_step(model: CRVAE, cfg: Phase1Config, mesh: Mesh,
                             parents: jax.Array):
    """Explicit-batch phase-1 step jitted over ``mesh``.

    Signature of the returned fn: (params, batch, key) -> (params, metrics)
    with batch sharded (dp,) on its leading axis and head-stacked params
    sharded over ep.
    """
    param_shard = jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                               crvae_param_spec(),
                               is_leaf=lambda x: isinstance(x, P))
    batch_shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def step(params: CRVAEParams, batch: jax.Array, key: jax.Array):
        def loss_fn(prms):
            loss, aux = _crvae_loss(model, cfg, prms, None, batch, key,
                                    parents, cfg.beta)
            del aux["pred"]
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params = jax.tree.map(lambda p, g: p - cfg.lr * g, params, grads)
        params = _project_and_prox(params, parents, cfg.lam, cfg.lr)
        metrics = {"loss": loss, **{k: v for k, v in aux.items()}}
        return params, metrics

    return jax.jit(step,
                   in_shardings=(param_shard, batch_shard, rep),
                   out_shardings=(param_shard, rep)), param_shard, batch_shard
