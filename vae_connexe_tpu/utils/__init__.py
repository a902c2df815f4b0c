"""Utilities: layer primitives, PRNG discipline, checkpointing, profiling, logging."""

from vae_connexe_tpu.utils.layers import Dense, dense, init_dense, init_stacked_dense
from vae_connexe_tpu.utils.scalers import minmax_scale, standardize

__all__ = [
    "Dense",
    "dense",
    "init_dense",
    "init_stacked_dense",
    "minmax_scale",
    "standardize",
]
