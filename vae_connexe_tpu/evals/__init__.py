"""Evaluation: causal-graph metrics, generation quality, visualization."""

from vae_connexe_tpu.evals.gc_metrics import (
    auroc,
    auto_threshold,
    stability_selection,
    vote_confidence,
    gc_accuracy,
    gc_metrics,
    precision_recall_f1,
    threshold_sweep,
    variable_usage,
)
from vae_connexe_tpu.evals.generation import moment_match, prediction_mse

__all__ = [
    "auroc",
    "auto_threshold",
    "stability_selection",
    "vote_confidence",
    "gc_accuracy",
    "gc_metrics",
    "moment_match",
    "precision_recall_f1",
    "prediction_mse",
    "threshold_sweep",
    "variable_usage",
]
