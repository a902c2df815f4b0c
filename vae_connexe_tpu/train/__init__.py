"""Trainers: jit-compiled two-phase CRVAE training, W_in-variant trainers,
VRAE / CSRAE loops.  Hot loops are ``lax.scan`` chunks — the host only sees
metrics every ``check_every`` steps."""

from vae_connexe_tpu.train.config import Phase1Config, Phase2Config, WInTrainConfig
from vae_connexe_tpu.train.crvae_trainer import (
    Phase1State,
    Phase2State,
    fit_phase1,
    fit_phase2,
    generate_with_compensation,
    make_phase1_step,
    make_phase2_step,
)
from vae_connexe_tpu.train.streaming import (
    fit_phase1_streaming,
    fit_phase2_streaming,
)
from vae_connexe_tpu.train.win_trainer import WInTrainer
from vae_connexe_tpu.train.vrae_trainer import fit_vrae
from vae_connexe_tpu.train.csrae_trainer import fit_csrae

__all__ = [
    "Phase1Config",
    "Phase1State",
    "Phase2Config",
    "Phase2State",
    "WInTrainConfig",
    "WInTrainer",
    "fit_csrae",
    "fit_phase1",
    "fit_phase1_streaming",
    "fit_phase2",
    "fit_phase2_streaming",
    "fit_vrae",
    "generate_with_compensation",
    "make_phase1_step",
    "make_phase2_step",
]
