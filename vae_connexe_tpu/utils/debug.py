"""Numerical debugging helpers (SURVEY.md §5 "race detection / sanitizers").

The reference's only concurrency hazard — in-place ``param.data`` mutation —
is eliminated by JAX's functional updates; the remaining failure mode is
numerical (NaN/Inf under aggressive λ/lr).  These helpers wire up JAX's
built-in tracers for it.
"""

from __future__ import annotations

import contextlib

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise on the first NaN produced inside any jitted computation."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_debugging():
    """Scoped version of ``enable_nan_debugging``."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
