"""vae_connexe_tpu — a TPU-native JAX framework for the CR-VAE model family.

Re-implements, TPU-first, every capability of the reference repo
anonyme-Zheng/VAE-connexe (causal recurrent VAEs that jointly discover
Granger-causal graphs in multivariate time series and generate synthetic
series, plus CS-divergence RAE variants and a plain VRAE):

- ``data``      on-device synthetic benchmarks (Lorenz-96, Hénon, VAR) and
                sliding-window batching — L0/L1 of the reference layer map.
- ``models``    the model zoo: CRVAE (three causal parameterizations),
                error-compensation VAE, plain VRAE, MixtureCSRAE + GMM prior.
- ``losses``    Gaussian KL, closed-form Cauchy–Schwarz divergence vs a GMM
                prior (both reference variants), ridge / group-lasso values.
- ``ops``       fused compute kernels (Pallas GRU scan) with lax fallbacks.
- ``optim``     proximal group-lasso operators (column / row / element
                groups) as pure functions and optax transforms.
- ``train``     jit-compiled two-phase trainers (structure learning, then
                generation + error compensation), scan-based hot loops.
- ``evals``     GC-matrix extraction, accuracy/P/R/F1/AUROC vs ground truth,
                free-running rollout, PCA/t-SNE comparison.
- ``parallel``  mesh construction, batch/head sharding, multi-seed sweeps.
- ``utils``     config dataclasses, PRNG helpers, checkpointing, profiling.

Design stance (vs. the PyTorch reference): static shapes everywhere
(connection masks instead of dynamic parent gathers), per-variable decoder
heads stacked on a vmapped axis instead of a ModuleList, recurrence as
``lax.scan`` with a Pallas fused-cell fast path, proximal updates as pure
functions inside one jitted train step, and scale-out via
``jax.sharding.Mesh`` + XLA collectives.
"""

__version__ = "0.1.0"

from vae_connexe_tpu import data, evals, losses, models, ops, optim, parallel, train, utils  # noqa: F401
from vae_connexe_tpu.discover import DiscoveryResult, discover  # noqa: F401
