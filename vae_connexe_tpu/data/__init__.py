"""On-device synthetic benchmarks with known causal graphs, plus windowing.

Everything here runs under jit on device — generation, normalization, and
batching never leave HBM, unlike the reference's scipy/NumPy host pipeline.
"""

from vae_connexe_tpu.data.henon import (henon_chain, henon_truth,
    henon_dynamics_truth, coupled_henon, coupled_henon_truth)
from vae_connexe_tpu.data.lorenz96 import lorenz96, lorenz96_truth
from vae_connexe_tpu.data.timegan_utils import batch_generator, extract_time, train_test_divide
from vae_connexe_tpu.data.var import var_process, var_truth
from vae_connexe_tpu.data.windows import arrange_input, sample_batch, sliding_windows

__all__ = [
    "arrange_input",
    "batch_generator",
    "extract_time",
    "train_test_divide",
    "coupled_henon",
    "coupled_henon_truth",
    "henon_chain",
    "henon_truth",
    "henon_dynamics_truth",
    "lorenz96",
    "lorenz96_truth",
    "sample_batch",
    "sliding_windows",
    "var_process",
    "var_truth",
]
