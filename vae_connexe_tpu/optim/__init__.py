"""Optimization: proximal group-lasso operators and optax transforms."""

from vae_connexe_tpu.optim.prox import (
    prox_column_groups,
    prox_elementwise,
    prox_row_groups,
    proximal_sgd,
)

__all__ = [
    "prox_column_groups",
    "prox_elementwise",
    "prox_row_groups",
    "proximal_sgd",
]
