"""Training configuration dataclasses.

Every load-bearing magic constant of the reference becomes a named field
here (SURVEY.md §5 "Config / flag system"): encoder window length, β
weights, rollout length, error-injection scale, thresholds, batch modes.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Phase1Config:
    """Structure-learning phase (reference ``train_phase1``).

    Defaults follow the Lorenz-96 driver (`CRVAE_lorenz96.py:772-774,458`):
    λ=0.1 group lasso, lr=5e-2 manual SGD, β=0.1 KL weight
    (``author_CRVAE.py:478``), batch 256, 5000 iterations.
    """

    lam: float = 0.1
    lam_ridge: float = 0.0
    lr: float = 5e-2
    beta: float = 0.1
    batch_size: int = 256
    max_iter: int = 5000
    check_every: int = 50
    # The author scripts train phase 1 on ONE fixed random batch
    # (``author_CRVAE.py:473-476``); CR-CS-RAE resamples each iteration
    # (``CR-CS-RAE.py:557-558``).  Resampling is the statistically sane
    # default; the fixed-batch mode is kept for behavioral parity runs.
    resample_batches: bool = True
    # Latent regularizer: 'kl' (β·KL) or 'cs' (λ_cs · CS divergence vs a
    # learnable GMM prior — the CR-CS-RAE hybrid, ``CR-CS-RAE.py:563-582``).
    latent_reg: str = "kl"
    lambda_cs: float = 0.1
    gmm_components: int = 10
    cs_variant: str = "symmetric"


@dataclasses.dataclass(frozen=True)
class Phase2Config:
    """Generation phase (reference ``train_phase2``): λ=0, β=1, manual SGD
    lr=5e-2 on the pruned CRVAE + Adam 1e-3 on the error VAE
    (``author_CRVAE.py:565-568,585``)."""

    lr: float = 5e-2
    lr_error: float = 1e-3
    beta: float = 1.0
    beta_error: float = 1.0
    lam_ridge: float = 0.0
    batch_size: int = 256
    max_iter: int = 10000
    check_every: int = 50
    latent_reg: str = "kl"
    lambda_cs: float = 0.1
    gmm_components: int = 10
    cs_variant: str = "symmetric"


@dataclasses.dataclass(frozen=True)
class WInTrainConfig:
    """Trainer config for the explicit-W_in variant (``CRVAE.py:153-199``,
    ``CR-VAE.py:227-347``)."""

    lr: float = 2e-3
    # ISTA/prox step size; the reference CR-VAE.py trains Adam at lr=1e-3
    # but proxes W_in at lr_prox=1e-2 (``CR-VAE.py:227,272``).  None = lr.
    lr_prox: float | None = None
    lam: float = 0.03
    prox_groups: str = "row"        # 'row' (CRVAE.py) or 'element' (CR-VAE.py)
    batch_size: int = 256
    stage1_epochs: int = 2000
    stage2_epochs: int = 1000
    prune_threshold: float = 1e-6
    # CR-VAE.py keeps updating W_in on its masked support in stage 2
    # (``CR-VAE.py:341-346``); CRVAE.py's Adam excludes W_in entirely
    # (``CRVAE.py:158-159``), freezing it.
    update_w_in_stage2: bool = False


@dataclasses.dataclass(frozen=True)
class CSRAETrainConfig:
    """Trainer config for the MixtureCSRAE (``CS-RAE.py:115-155`` defines
    the model + loss contract; the reference ships no driver, so the
    defaults here are its model literals — MLP hidden 400, latent 20, K=10
    components — with an ordinary Adam minibatch schedule)."""

    hidden_dims: tuple[int, ...] = (400,)
    latent_dim: int = 20
    k: int = 10                     # GMM prior components (``CS-RAE.py:24``)
    lambda_cs: float = 1.0
    cs_variant: str = "symmetric"   # CS-RAE.py vs CSRAE_new.py ∫p² convention
    epochs: int = 30
    batch_size: int = 128
    lr: float = 1e-3
