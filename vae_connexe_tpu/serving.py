"""Serialized serving artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story at all — generation means re-running
a notebook with the weights still in memory (SURVEY.md §5: no
``torch.save`` anywhere).  Here a trained generator exports to a single
self-contained artifact: the compensated free-running rollout
(``author_CRVAE.py:682-684`` + ``:284-286``) lowered to StableHLO with the
weights baked in, callable from any later process — **without the model
code** — and lowerable for multiple platforms at once (a CPU host process
can emit a TPU artifact and vice versa).

    blob = export_generator(model, err_model, params, err_params, batch=64)
    pathlib.Path("gen.vcx").write_bytes(blob)
    # ... later, anywhere:
    fn, meta = load_generator("gen.vcx")
    samples = fn(seed=0)          # (64, rollout_len, p), deterministic

Artifact layout: 8-byte magic ``VCXEXPT1`` + uint32 header length + JSON
header (shapes, platforms, model geometry) + the ``jax.export``
serialization.  The exported entry takes an int32 seed scalar (not a PRNG
key array) so the calling convention survives PRNG-implementation changes.
"""

from __future__ import annotations

import json
import pathlib
import struct
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"VCXEXPT1"


def _generation_fn(model, err_model, params, err_params, batch: int,
                   parents, length: Optional[int], dtype=None,
                   kernel: str = "lax"):
    """seed -> samples; splits the key exactly as
    ``train.generate_with_compensation`` does, so the exported artifact and
    the in-process call with ``jax.random.key(seed)`` produce identical
    samples (pinned in ``tests/test_serving.py``).  ``dtype``: optional
    serving precision (see ``CRVAE._free_run``) baked into the artifact.
    ``kernel="fused"`` bakes the fused Pallas rollout chain (the
    single-stream latency winner at B <= 8 — RESULTS.md round 3; TPU-only
    lowering)."""
    steps = model.rollout_len if length is None else length

    if kernel == "fused":
        from vae_connexe_tpu.models.crvae import masked_heads
        from vae_connexe_tpu.ops.pallas_rollout import (
            crvae_free_run_fused,
            errvae_sample_fused,
        )
        heads = (params.heads if parents is None
                 else masked_heads(params.heads, parents))

        def fn(seed):
            key = jax.random.key(seed)
            k_e, k_r = jax.random.split(key)
            h0e = jax.random.normal(k_e, (batch, err_model.hidden))
            errs = errvae_sample_fused(err_params.dec, err_params.out, h0e,
                                       err_model.d, steps)
            # ErrorVAE.sample keeps a leading zero step; slice to ``steps``
            # exactly like the lax branch below.
            noise = jnp.concatenate(
                [jnp.zeros((batch, 1, err_model.d)), errs], axis=1)[:, :steps]
            h0 = jax.random.normal(k_r, (batch, model.hidden))
            return crvae_free_run_fused(heads, params.readout,
                                        jnp.zeros((batch, model.p)), h0,
                                        noise, model.noise_scale)

        return fn, steps

    def fn(seed):
        key = jax.random.key(seed)
        k_e, k_r = jax.random.split(key)
        # ErrorVAE.sample emits one step more than asked (the reference's
        # 21-from-20 convention); slice exactly as the trainer does.
        noise = err_model.sample(err_params, k_e, batch, steps, dtype=dtype)
        return model.rollout(params, k_r, batch, noise=noise[:, :steps],
                             parents=parents, length=steps, dtype=dtype)

    return fn, steps


def export_generator(model, err_model, params, err_params, *, batch: int,
                     parents=None, length: Optional[int] = None,
                     platforms: Optional[list[str]] = None,
                     serve_dtype: Optional[str] = None,
                     kernel: str = "lax") -> bytes:
    """Export the compensated generator as a self-contained artifact.

    Args:
      model / err_model: the trained ``CRVAE`` + ``ErrorVAE`` pair.
      params / err_params: their (phase-2) parameters — baked into the
        artifact as constants.
      batch: rollouts per call (static; XLA specializes to it).
      parents: optional (p, p) binary mask to re-project the heads with
        (phase-2 weights are already mask-projected, so this is defensive).
      length: rollout length override (default ``model.rollout_len``).
      platforms: lowering targets, e.g. ``["cpu", "tpu"]``; default = the
        current default backend only.
      serve_dtype: optional reduced serving precision baked into the
        artifact — ``"bfloat16"`` runs the rollout weights/carries/gate
        math in bf16 (f32 output; see ``CRVAE._free_run``).  Default None
        exports the exact float32 program the parity tests pin.
      kernel: ``"lax"`` (default — the scanned rollout, the throughput
        winner), ``"fused"`` (the fused Pallas rollout chain — the
        single-stream latency winner at B <= 8, f32-only, lowers for TPU
        only), or ``"auto"`` (fused iff f32 and B <= the measured
        crossover, ``train.crvae_trainer.LATENCY_FUSED_MAX_B``).

    Returns the artifact bytes (write them to a file; ``load_generator``
    reads them back anywhere).
    """
    if serve_dtype is not None and serve_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"serve_dtype must be 'float32' or 'bfloat16', "
                         f"got {serve_dtype!r}")
    dtype = jnp.bfloat16 if serve_dtype == "bfloat16" else None
    if kernel not in ("lax", "fused", "auto"):
        raise ValueError(f"kernel must be 'lax', 'fused', or 'auto', "
                         f"got {kernel!r}")
    if kernel == "auto":
        from vae_connexe_tpu.train.crvae_trainer import (
            LATENCY_FUSED_MAX_B, _fused_serving_fits)
        targets = [t.lower() for t in (platforms or [jax.default_backend()])]
        kernel = ("fused" if (dtype is None and batch <= LATENCY_FUSED_MAX_B
                              and targets == ["tpu"]
                              # VMEM feasibility at THESE shapes — the B<=8
                              # crossover was measured at p=20/H=64 only.
                              and _fused_serving_fits(model, err_model, batch))
                  else "lax")
    if kernel == "fused":
        if dtype is not None:
            raise ValueError("kernel='fused' artifacts are float32-only")
        targets = platforms or [jax.default_backend()]
        if any(t.lower() not in ("tpu",) for t in targets):
            raise ValueError(
                f"kernel='fused' bakes a Mosaic TPU kernel and only lowers "
                f"for platforms=['tpu']; got {targets} — export the lax "
                f"kernel for portable artifacts")
    fn, steps = _generation_fn(model, err_model, params, err_params, batch,
                               None if parents is None else jnp.asarray(
                                   parents, jnp.float32), length, dtype=dtype,
                               kernel=kernel)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax.export.export(jax.jit(fn), **kwargs)(
        jax.ShapeDtypeStruct((), jnp.int32))
    blob = exported.serialize()
    header = json.dumps({
        "kind": "crvae_compensated_generator",
        "batch": batch,
        "rollout_len": steps,
        "p": model.p,
        "hidden": model.hidden,
        "noise_scale": model.noise_scale,
        "serve_dtype": serve_dtype or "float32",
        "kernel": kernel,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }).encode()
    return _MAGIC + struct.pack("<I", len(header)) + header + blob


def export_win_generator(model, params, *, batch: int, length: int,
                         platforms: Optional[list[str]] = None,
                         serve_dtype: Optional[str] = None) -> bytes:
    """Export a trained W_in-family generator (``WInCRVAE``) as a
    self-contained artifact.

    Unlike the cold-start CRVAE rollout, the win generation is
    **context-conditioned** (encode the last τ context steps, then roll —
    ``CRVAE.py:105-123``), so the exported entry takes TWO arguments:
    ``fn(seed, context)`` with ``context`` float32 of shape
    ``(batch, tau, d)`` (longer contexts: slice the last τ steps before
    calling).  Returns ``(batch, length, d)`` forecasts.

    ``serve_dtype="bfloat16"`` bakes the reduced rollout precision in
    (the one-pass encoder stays f32; see ``WInCRVAE.generate``).
    """
    if serve_dtype is not None and serve_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"serve_dtype must be 'float32' or 'bfloat16', "
                         f"got {serve_dtype!r}")
    dtype = jnp.bfloat16 if serve_dtype == "bfloat16" else None

    def fn(seed, context):
        key = jax.random.key(seed)
        return model.generate(params, context, key, length, dtype=dtype)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax.export.export(jax.jit(fn), **kwargs)(
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((batch, model.tau, model.d), jnp.float32))
    blob = exported.serialize()
    header = json.dumps({
        "kind": "win_conditioned_generator",
        "batch": batch,
        "rollout_len": length,
        "p": model.d,
        "hidden": model.hidden,
        "tau": model.tau,
        "serve_dtype": serve_dtype or "float32",
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }).encode()
    return _MAGIC + struct.pack("<I", len(header)) + header + blob


def load_generator(source):
    """Load an exported generator artifact.

    ``source``: a path or the artifact bytes.  Returns ``(fn, meta)``
    where ``meta`` is the artifact header dict and ``fn`` depends on
    ``meta["kind"]``:

    - ``crvae_compensated_generator`` — ``fn(seed) -> np.ndarray`` of
      shape (batch, rollout_len, p);
    - ``win_conditioned_generator`` — ``fn(seed, context) -> np.ndarray``
      with ``context`` array-like of shape (batch, tau, p), returning
      (batch, rollout_len, p).

    Needs only jax — no model code, no checkpoint, no framework state.
    """
    if isinstance(source, (str, pathlib.Path)):
        data = pathlib.Path(source).read_bytes()
    else:
        data = bytes(source)
    if data[:8] != _MAGIC:
        raise ValueError(
            "not a vae_connexe_tpu generator artifact (bad magic; expected "
            f"{_MAGIC!r})")
    (hlen,) = struct.unpack("<I", data[8:12])
    meta = json.loads(data[12:12 + hlen].decode())
    # Validate the kind BEFORE deserializing the program — an unknown kind
    # must fail loudly here, not fall through to the seed-only calling
    # convention (or die decoding a program we wouldn't know how to call).
    if meta.get("kind") not in ("crvae_compensated_generator",
                                "win_conditioned_generator"):
        raise ValueError(
            f"unknown artifact kind {meta.get('kind')!r}; this build serves "
            f"'crvae_compensated_generator' and 'win_conditioned_generator'")
    exported = jax.export.deserialize(data[12 + hlen:])

    if meta["kind"] == "win_conditioned_generator":
        shape = (meta["batch"], meta["tau"], meta["p"])

        def fn(seed: int, context) -> np.ndarray:
            ctx = jnp.asarray(context, jnp.float32)
            if ctx.shape != shape:
                raise ValueError(
                    f"context shape {ctx.shape} != artifact's {shape} "
                    f"(batch, tau, p); slice the last tau={meta['tau']} "
                    f"steps of each series")
            return np.asarray(exported.call(jnp.asarray(seed, jnp.int32),
                                            ctx))
    else:   # crvae_compensated_generator (kind validated above)
        def fn(seed: int) -> np.ndarray:
            return np.asarray(exported.call(jnp.asarray(seed, jnp.int32)))

    return fn, meta
