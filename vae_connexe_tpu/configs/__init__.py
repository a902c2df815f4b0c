"""Experiment configs — the reference's five script drivers as data.

One library, many configs (SURVEY.md §7): each reference script's hardcoded
driver becomes a named ``Experiment`` here, runnable via
``python -m vae_connexe_tpu.cli run <name>``.
"""

from vae_connexe_tpu.configs.experiments import (
    EXPERIMENTS,
    Experiment,
    get_experiment,
    run_experiment,
)

__all__ = ["EXPERIMENTS", "Experiment", "get_experiment", "run_experiment"]
