"""Whole-model parity with the reference's forward semantics.

The reference's loss depends on off-by-one-rich slicing — encoder over the
first 10 real steps (``author_CRVAE.py:211``, via the zero-prepend trick),
decoder input ``[0, x_10 .. x_{T-2}]`` (``:122``), targets ``x[:, 10:]``
(``:487``).  SURVEY.md §7 lists exact reproduction of this indexing as hard
part #2.  This test copies weights from an independent torch implementation
of those semantics (``benchmarks/torch_reference_baseline.py``) into the JAX
CRVAE and requires the deterministic forward to agree to f32 tolerance.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from benchmarks.torch_reference_baseline import TorchCRVAE  # noqa: E402
from vae_connexe_tpu.models import CRVAE  # noqa: E402
from vae_connexe_tpu.models.crvae import CRVAEParams  # noqa: E402
from vae_connexe_tpu.ops import GRUParams  # noqa: E402
from vae_connexe_tpu.utils.layers import Dense  # noqa: E402


def _np(t):
    return t.detach().numpy()


def _copy_params(tm: TorchCRVAE, p: int) -> CRVAEParams:
    heads = GRUParams(
        w_ih=jnp.stack([jnp.asarray(_np(h.gru.weight_ih_l0)) for h in tm.heads]),
        w_hh=jnp.stack([jnp.asarray(_np(h.gru.weight_hh_l0)) for h in tm.heads]),
        b_ih=jnp.stack([jnp.asarray(_np(h.gru.bias_ih_l0)) for h in tm.heads]),
        b_hh=jnp.stack([jnp.asarray(_np(h.gru.bias_hh_l0)) for h in tm.heads]),
    )
    readout = Dense(
        w=jnp.stack([jnp.asarray(_np(h.out.weight)) for h in tm.heads]),
        b=jnp.stack([jnp.asarray(_np(h.out.bias)) for h in tm.heads]),
    )
    return CRVAEParams(
        enc=GRUParams(w_ih=jnp.asarray(_np(tm.enc.weight_ih_l0)),
                      w_hh=jnp.asarray(_np(tm.enc.weight_hh_l0)),
                      b_ih=jnp.asarray(_np(tm.enc.bias_ih_l0)),
                      b_hh=jnp.asarray(_np(tm.enc.bias_hh_l0))),
        fc_mu=Dense(w=jnp.asarray(_np(tm.fc_mu.weight)),
                    b=jnp.asarray(_np(tm.fc_mu.bias))),
        fc_std=Dense(w=jnp.asarray(_np(tm.fc_std.weight)),
                     b=jnp.asarray(_np(tm.fc_std.bias))),
        heads=heads,
        readout=readout,
    )


def test_full_forward_parity_with_torch_reference_semantics():
    torch.manual_seed(0)
    p, hidden, b, ctx = 5, 16, 8, 20
    tm = TorchCRVAE(p, hidden)
    x_t = torch.randn(b, ctx, p)

    # Deterministic torch forward: z = mu (zero the sampled noise).
    orig = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    try:
        with torch.no_grad():
            preds_t, mu_t, logvar_t = tm(x_t)
    finally:
        torch.randn_like = orig
    pred_t = torch.cat(preds_t, dim=-1)           # (B, T-10, p)

    model = CRVAE(p=p, hidden=hidden)
    params = _copy_params(tm, p)
    pred_j, mu_j, logvar_j = model.forward(
        params, jnp.asarray(_np(x_t)), jax.random.key(0), deterministic=True)

    np.testing.assert_allclose(np.asarray(mu_j), _np(mu_t)[0], atol=2e-6)
    np.testing.assert_allclose(np.asarray(logvar_j), _np(logvar_t)[0], atol=2e-6)
    np.testing.assert_allclose(np.asarray(pred_j), _np(pred_t), atol=5e-6)


def test_loss_targets_align_with_reference_slicing():
    """pred[:, t, i] must estimate x[:, 10 + t, i]: train on an AR(1)-style
    identity task where x_{t+1} = x_t and check the one-step-shift target
    alignment is learnable to near-zero loss (a misalignment cannot be)."""
    p = 3
    model = CRVAE(p=p, hidden=16)
    # Constant-in-time windows: any correct teacher-forced one-step predictor
    # can reach ~0 loss; the first decode step sees only the zero token and
    # the latent, so exclude it from the check.
    x = jnp.tile(jax.random.normal(jax.random.key(0), (64, 1, p)), (1, 20, 1))
    params = model.init(jax.random.key(1))

    import optax

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(prms):
            pred, _, _ = model.forward(prms, x, jax.random.key(2),
                                       deterministic=True)
            return jnp.mean((pred[:, 1:] - x[:, 11:]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 1e-3
