"""Model zoo: every model family of the reference, TPU-first.

- ``crvae``      CRVAE, author parameterization (masked per-head GRU input
                 weights ARE the causal graph) — the flagship.
- ``crvae_win``  CRVAE, explicit-W_in parameterization (the ``CRVAE.py`` /
                 ``CR-VAE.py`` re-implementations).
- ``error_vae``  VRAE4E / ErrorVAE residual-compensation seq2seq VAEs.
- ``vrae``       plain variational recurrent autoencoder (RNN/GRU/LSTM cells,
                 stochastic teacher forcing).
- ``csrae``      MixtureCSRAE: MLP VAE with a CS-divergence GMM-prior
                 regularizer.
- ``gmm_prior``  the learnable equal-weight GMM prior.
"""

from vae_connexe_tpu.models.crvae import CRVAE, CRVAEParams
from vae_connexe_tpu.models.crvae_win import WInCRVAE, WInCRVAEParams
from vae_connexe_tpu.models.csrae import MixtureCSRAE, MixtureCSRAEParams
from vae_connexe_tpu.models.error_vae import ErrorVAE, ErrorVAEParams
from vae_connexe_tpu.models.gmm_prior import GMMPrior, init_gmm_prior
from vae_connexe_tpu.models.vrae import VRAE, VRAEParams

__all__ = [
    "CRVAE",
    "CRVAEParams",
    "ErrorVAE",
    "ErrorVAEParams",
    "GMMPrior",
    "MixtureCSRAE",
    "MixtureCSRAEParams",
    "VRAE",
    "VRAEParams",
    "WInCRVAE",
    "WInCRVAEParams",
    "init_gmm_prior",
]
