"""One-call Granger-causal discovery on user-supplied time series.

The reference pipeline a user actually wants — phase-1 sparse structure
learning, thresholding, optional phase-2 generator training — exists in its
scripts only as notebook cells hardwired to synthetic generators
(``/root/reference/author_CRVAE.py:703-799``).  ``discover`` runs that
pipeline on an arbitrary ``(T, p)`` (or ``(N, T, p)``) array:

    from vae_connexe_tpu import discover
    result = discover(my_series, context=20, max_iter=2000)
    result.gc            # (p, p) binary causal graph (row i <- column j)
    result.scores        # continuous edge strengths
    result.threshold     # the resolved binarization threshold

With ``seeds > 1`` the selection is Meinshausen–Bühlmann stability
selection over a vmapped multi-seed sweep (one compiled program trains all
inits simultaneously; the seed axis shards over dp when ``mesh`` is given)
— the framework-native replacement for the reference's manual threshold
sweeps against a known truth matrix (``CR-VAE.py:437-443``), which a real
user does not have.

``generate > 0`` continues to phase 2: a fresh model constrained to the
selected graph + the error-compensation VAE (``author_CRVAE.py:565-701``),
returning synthetic series sampled with error injection.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DiscoveryResult:
    """Everything the discovery pipeline learned.

    ``scores`` / ``gc`` are oriented row i ← column j ("column j Granger-
    causes row i"), matching ``CRVAE.gc`` and the reference's convention.
    """

    scores: np.ndarray                 # (p, p) continuous edge strengths
    gc: np.ndarray                     # (p, p) binary selected graph
    threshold: float                   # resolved score (or vote) threshold
    votes: Optional[np.ndarray]        # (p, p) vote fractions, seeds > 1
    seed_scores: Optional[np.ndarray]  # (S, p, p) per-seed scores, seeds > 1
    params: object                     # trained phase-1 CRVAEParams (seed run)
    model: object                      # the CRVAE instance
    names: Optional[list]              # variable names (CSV header), if any
    metrics: dict                      # final training metrics
    samples: Optional[np.ndarray] = None   # (B, rollout_len, p), generate > 0
    err_params: object = None          # trained ErrorVAE params, generate > 0
    # Discovery-confidence signal (seeds > 1 only): the fraction of
    # candidate edges the seed ensemble confidently rules out
    # (``evals.vote_confidence``).  High (≥ 0.5) on systems the estimator
    # resolves (NARMA 0.76); LOW when the ensemble agrees on a dense graph
    # it cannot discriminate (Rössler 0.25 — the committed hard case,
    # ``results/discover_demo/``): treat the graph as exploratory.
    confidence: Optional[float] = None

    def edges(self, min_score: float = 0.0):
        """Selected edges as (cause, effect, score) triples, strongest first;
        names resolve to the CSV header when present."""
        out = []
        p = self.gc.shape[0]
        label = (lambda i: self.names[i]) if self.names else (lambda i: i)
        for i in range(p):
            for j in range(p):
                if self.gc[i, j] and self.scores[i, j] >= min_score:
                    out.append((label(j), label(i), float(self.scores[i, j])))
        return sorted(out, key=lambda e: -e[2])


def _pool_windows(series: jax.Array, context: int) -> jax.Array:
    """Windows for a (T, p) series or an (N, T, p) stack (pooled)."""
    from vae_connexe_tpu.data import arrange_input

    if series.ndim == 2:
        return arrange_input(series, context)[0]
    wins = jax.vmap(lambda s: arrange_input(s, context)[0])(series)
    return wins.reshape((-1,) + wins.shape[2:])


def discover(series, *, context: int = 20, hidden: int = 64,
             enc_len: Optional[int] = None,
             lam: float = 0.1, lr: Optional[float] = None, beta: float = 0.1,
             max_iter: int = 2000, batch_size: int = 256,
             seeds: int = 1, seed: int = 0,
             threshold: float | str = "auto",
             min_frac: float | str = "auto",
             standardize: bool = True,
             diff: bool = False,
             latent_reg: str = "kl",
             family: str = "crvae",
             prox: Optional[str] = None,
             latent: int = 32,
             generate: int = 0,
             phase2_iters: Optional[int] = None,
             names: Optional[list] = None,
             mesh=None, verbose: bool = False,
             log_fn=print) -> DiscoveryResult:
    """Granger-causal discovery (+ optional generator) on an arbitrary series.

    Args:
      series: (T, p) array — rows are time steps — or an (N, T, p) stack of
        realizations; anything ``np.asarray`` accepts.
      context: lag-window length (how far back causes may act); the
        reference default is 20 (``CRVAE_lorenz96.py:772``).
      enc_len: steps the latent encoder reads from each window; the decoder
        predicts the remaining ``context - enc_len``.  Default: half the
        context (the reference's 10-of-20 split, ``author_CRVAE.py:211``).
      lam: group-lasso strength — larger = sparser graph.
      seeds: >1 runs a vmapped multi-seed sweep and selects edges by
        stability voting instead of a single-run threshold.
      threshold: score threshold for ``seeds == 1`` — a float, or "auto"
        (largest log-gap rule, ``evals.auto_threshold``).
      min_frac: vote fraction for ``seeds > 1`` — a float in [0, 1] or
        "auto" (largest vote-spectrum gap, clamped to [0.5, 0.95]).
      standardize: z-score each variable over time first (the reference
        standardizes inside every generator, ``CRVAE_lorenz96.py:718-721``).
      diff: first-difference the series along time before standardizing —
        a discrete-derivative proxy, the standard structural lever for
        SMOOTH slow-fast flows (e.g. densely sampled ODE systems) where
        every variable predicts every other and lag-window Granger
        discovery reads confidently dense (the committed Rössler hard
        case); differencing whitens the slow common drift so the penalty
        can discriminate.  Costs one time step per realization.
      family: causal parameterization — ``"crvae"`` (the flagship author
        variant: GRU input-weight **column** groups) or ``"win"`` (the
        explicit per-head W_in matrix, the reference's two re-implementation
        scripts).  ``lr`` defaults per family (5e-2 manual SGD for crvae,
        the W_in trainer's Adam default for win).
      prox: sparsity-group convention for the win family — ``"row"``
        (``CRVAE.py:145-147``) or ``"element"`` (``CR-VAE.py:126-128``);
        default "row".  The crvae family always uses column groups
        (``author_CRVAE.py:314``).
      latent: latent width for the win family's encoder (crvae ties the
        latent to ``hidden``).
      generate: if > 0, also train phase 2 on the selected graph and sample
        this many synthetic rollouts.
      mesh: optional (dp, ep) ``jax.sharding.Mesh`` — crvae family only:
        shards the single fit (batch over dp, heads over ep) and the
        multi-seed sweep (seeds over dp).

    For ``family="win"``, ``max_iter`` counts stage-I epochs (stage II runs
    ``phase2_iters`` or half that), ``enc_len`` is the τ split of the 2τ
    window (the ``context`` must be even or it is rounded down to 2τ), and
    ``generate`` conditions the rollout on the first windows of the series.

    Returns a ``DiscoveryResult``.
    """
    if family not in ("crvae", "win"):
        raise ValueError(f"family must be 'crvae' or 'win', got {family!r}")
    if prox is not None and family != "win":
        raise ValueError(
            "prox= selects the win family's group convention; the crvae "
            "family is always column-grouped (author_CRVAE.py:314) — pass "
            "family='win' to use row/element groups")
    from vae_connexe_tpu.evals import (auto_threshold, stability_selection,
                                       vote_confidence)
    from vae_connexe_tpu.models import CRVAE
    from vae_connexe_tpu.train import Phase1Config, fit_phase1
    from vae_connexe_tpu.utils.scalers import standardize as _standardize

    series = jnp.asarray(np.asarray(series, np.float32))
    if series.ndim == 1:
        series = series[:, None]
    if series.ndim not in (2, 3):
        raise ValueError(f"series must be (T, p) or (N, T, p), got {series.shape}")
    t_axis = 0 if series.ndim == 2 else 1
    if diff:
        series = jnp.diff(series, axis=t_axis)
    if series.shape[t_axis] <= context + 1:
        raise ValueError(
            f"series has {series.shape[t_axis]} time steps but context={context} "
            "— need T > context + 1 to form at least one training window")
    p = series.shape[-1]
    if names is not None and len(names) != p:
        raise ValueError(f"{len(names)} names for {p} variables")
    if standardize:
        series = _standardize(series, axis=t_axis)

    if enc_len is None:
        enc_len = max(1, context // 2)
    if not 0 < enc_len < context:
        raise ValueError(f"enc_len={enc_len} must be in (0, context={context})")

    key = jax.random.key(seed)
    k_init, k_run = jax.random.split(key)

    if family == "win":
        if mesh is not None and seeds <= 1:
            raise ValueError(
                "mesh= for the win family shards the SEED axis of the "
                "stability sweep over dp (there is no sharded single-fit "
                "path for the win trainer) — pass seeds > 1, or use "
                "family='crvae' whose single fit shards its batch over dp")
        return _discover_win(series, names=names, tau=enc_len, hidden=hidden,
                             latent=latent, lam=lam, lr=lr,
                             prox=prox or "row", max_iter=max_iter,
                             batch_size=batch_size, seeds=seeds,
                             threshold=threshold, min_frac=min_frac,
                             generate=generate, phase2_iters=phase2_iters,
                             k_init=k_init, k_run=k_run, mesh=mesh,
                             verbose=verbose, log_fn=log_fn)
    if lr is None:
        lr = 5e-2

    windows = _pool_windows(series, context)
    model = CRVAE(p=p, hidden=hidden, enc_len=enc_len)
    full = jnp.ones((p, p), jnp.float32)
    cfg = Phase1Config(lam=lam, lr=lr, beta=beta, max_iter=max_iter,
                       batch_size=batch_size, latent_reg=latent_reg)

    votes = seed_scores = best = None
    if seeds > 1:
        # One compiled program trains every init simultaneously (seed axis
        # over dp on a mesh); no separate single fit is needed — phase 2
        # re-initializes from the selected mask alone, exactly as the
        # reference's phase transition does (``author_CRVAE.py:788-795``).
        from vae_connexe_tpu.parallel import sweep_phase1

        out = sweep_phase1(model, windows, full, cfg,
                           jnp.arange(seed, seed + seeds), mesh=mesh)
        seed_scores = np.asarray(out["gc_scores"])
        votes_j, selected, thr = stability_selection(
            jnp.asarray(seed_scores), min_frac=min_frac)
        votes = np.asarray(votes_j)
        gc = np.asarray(selected)
        # Report the seed-median scores: a single init's strengths are
        # noisier than the ensemble's, and the median is robust to the
        # per-seed over-selections the voting filters out.
        scores = jnp.median(jnp.asarray(seed_scores), axis=0)
        metrics = {"mean_loss": float(np.mean(np.asarray(out["mean_loss"]))),
                   "best_loss": float(np.min(np.asarray(out["best_loss"])))}
    else:
        best, _, metrics = fit_phase1(model, model.init(k_init), windows,
                                      full, cfg, k_run, verbose=verbose,
                                      log_fn=log_fn, mesh=mesh)
        scores = model.gc(best, threshold=False)
        thr = float(auto_threshold(scores)) if threshold == "auto" \
            else float(threshold)
        gc = np.asarray((scores > thr).astype(np.int32))

    result = DiscoveryResult(
        scores=np.asarray(scores), gc=gc, threshold=float(thr), votes=votes,
        seed_scores=seed_scores, params=best, model=model, names=names,
        metrics={k: float(v) for k, v in metrics.items()},
        confidence=(vote_confidence(votes) if votes is not None else None))

    if generate > 0:
        from vae_connexe_tpu.models import ErrorVAE
        from vae_connexe_tpu.train import (Phase2Config, fit_phase2,
                                           generate_with_compensation)

        mask = jnp.asarray(gc, jnp.float32)
        if not bool(mask.any()):
            raise ValueError(
                "phase 2 requested but the selected graph is empty — lower "
                "lam or the threshold (every head would have zero parents)")
        err_model = ErrorVAE(d=p, hidden=hidden)
        cfg2 = Phase2Config(lr=lr, batch_size=batch_size,
                            max_iter=phase2_iters or max_iter,
                            latent_reg=latent_reg)
        k_p2, k_e, k_gen = jax.random.split(jax.random.fold_in(key, 1), 3)
        p2_best, err_params, _, m2 = fit_phase2(
            model, err_model, model.init(k_p2), err_model.init(k_e),
            windows, mask, cfg2, jax.random.fold_in(k_run, 1),
            verbose=verbose, log_fn=log_fn, mesh=mesh)
        samples = generate_with_compensation(model, err_model, p2_best,
                                             err_params, k_gen, generate,
                                             parents=mask)
        result.samples = np.asarray(samples)
        result.err_params = err_params
        result.params = p2_best
        result.metrics.update({f"phase2_{k}": float(v) for k, v in m2.items()})

    return result


def _discover_win(series, *, names, tau, hidden, latent, lam, lr, prox,
                  max_iter, batch_size, seeds, threshold, min_frac,
                  generate, phase2_iters, k_init, k_run, mesh=None,
                  verbose=False, log_fn=print):
    """The win-family discovery path: explicit per-head W_in matrices with
    row-group (``CRVAE.py:145-147``) or element-wise (``CR-VAE.py:126-128``)
    proximal sparsity, trained by the two-stage ISTA/Adam trainer.

    ``max_iter`` counts stage-I epochs; stage II (error-compensation
    refinement on the frozen support) runs ``phase2_iters`` epochs, default
    half of stage I.

    With ``seeds > 1``, ALL S inits — including seed 0 — train
    simultaneously in ONE vmapped program per epoch block
    (``WInTrainer.fit_many``; seed 0's key/shuffle stream is exactly the
    sequential ``fit``'s, pinned in tests/test_discover.py), matching the
    crvae branch's one-compilation discipline; ``mesh`` shards the seed
    axis over dp.
    """
    from vae_connexe_tpu.data import sliding_windows
    from vae_connexe_tpu.evals import (auto_threshold, stability_selection,
                                       vote_confidence)
    from vae_connexe_tpu.models import WInCRVAE
    from vae_connexe_tpu.train import WInTrainConfig, WInTrainer

    p = series.shape[-1]
    if series.ndim == 2:
        windows = sliding_windows(series, 2 * tau)
    else:
        wins = jax.vmap(lambda s: sliding_windows(s, 2 * tau))(series)
        windows = wins.reshape((-1,) + wins.shape[2:])

    stage2 = phase2_iters if phase2_iters is not None else max(1, max_iter // 2)
    cfg = WInTrainConfig(lam=lam, prox_groups=prox, batch_size=batch_size,
                         stage1_epochs=max_iter, stage2_epochs=stage2,
                         **({} if lr is None else {"lr": lr}))
    model = WInCRVAE(d=p, hidden=hidden, latent=latent, tau=tau)
    trainer = WInTrainer(model, cfg)

    votes = seed_scores = None
    if seeds > 1:
        # One vmapped program trains every init — seed 0 included (its init
        # and run keys are the exact ones the sequential path would use).
        # Stage 2 refines the error head on the frozen support; it cannot
        # change the W_in scores unless update_w_in_stage2, so skip it for
        # the sweep unless the generator (seed 0's params) needs it.
        e2 = stage2 if (generate > 0 or cfg.update_w_in_stage2) else 0
        init_keys = jnp.stack(
            [k_init] + [jax.random.fold_in(k_init, s)
                        for s in range(1, seeds)])
        run_keys = jnp.stack(
            [k_run] + [jax.random.fold_in(k_run, 100 + s)
                       for s in range(1, seeds)])
        p_stack = jax.vmap(model.init)(init_keys)
        p_stack, m_many = trainer.fit_many(p_stack, windows, run_keys,
                                           stage2_epochs=e2, mesh=mesh)
        seed_scores = np.asarray(jax.vmap(
            lambda ps: model.granger_matrix(ps, threshold=False))(p_stack))
        votes_j, selected, thr = stability_selection(
            jnp.asarray(seed_scores), min_frac=min_frac)
        votes = np.asarray(votes_j)
        gc = np.asarray(selected)
        scores = jnp.median(jnp.asarray(seed_scores), axis=0)
        params = jax.tree.map(lambda a: a[0], p_stack)   # seed 0's model
        metrics = {k: float(v[0]) for k, v in m_many.items()}
    else:
        params, metrics = trainer.fit(model.init(k_init), windows, k_run,
                                      verbose=verbose, log_fn=log_fn)
        scores = model.granger_matrix(params, threshold=False)
        thr = float(auto_threshold(scores)) if threshold == "auto" \
            else float(threshold)
        gc = np.asarray((scores > thr).astype(np.int32))

    result = DiscoveryResult(
        scores=np.asarray(scores), gc=gc, threshold=float(thr), votes=votes,
        seed_scores=seed_scores, params=params, model=model, names=names,
        metrics={k: float(v) for k, v in metrics.items()},
        confidence=(vote_confidence(votes) if votes is not None else None))

    if generate > 0:
        # Condition the autoregressive rollout on real context windows (the
        # reference's generation demo seeds from data, ``CRVAE.py:374-390``).
        k_gen = jax.random.fold_in(k_run, 1)
        reps = -(-generate // windows.shape[0])          # ceil
        ctx = jnp.tile(windows, (reps, 1, 1))[:generate]
        result.samples = np.asarray(
            model.generate(params, ctx, k_gen, 2 * tau))
    return result
