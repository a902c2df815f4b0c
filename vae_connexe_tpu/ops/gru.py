"""GRU recurrence, TPU-first.

The reference reaches cuDNN GRU kernels through ``nn.GRU`` (e.g.
``/root/reference/author_CRVAE.py:107-108``).  The TPU equivalent here:

- The input projection ``x @ W_ih^T`` for the *whole sequence* is hoisted out
  of the recurrence into one large MXU matmul (``(B*T, D) @ (D, 3H)``); only
  the hidden-hidden matmul stays inside the time scan.  XLA compiles the scan
  into a single fused loop — no per-step kernel launches.
- The p per-variable decoder heads of the reference's ``nn.ModuleList``
  (``author_CRVAE.py:203-204``) become a *stacked leading axis* on the
  parameters, contracted in one batched matmul per step instead of a Python
  loop over heads (``author_CRVAE.py:221-222``).
- A Pallas fused kernel (``ops/pallas_gru.py``) covers the whole
  heads×time recurrence in VMEM for the hot configs; this module is the
  always-correct reference path and the autodiff path.

Gate math matches torch ``nn.GRU`` exactly (gate order r, z, n; the reset
gate multiplies the *hidden* candidate projection):

    r = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
    z = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
    n = tanh  (x W_in^T + b_in + r * (h W_hn^T + b_hn))
    h' = (1 - z) * n + z * h

Initialization matches torch's default U(-1/sqrt(H), 1/sqrt(H)) for all GRU
weights and biases, which keeps numerical-parity tests against golden torch
outputs meaningful.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import struct

# In-cell input projection for the unrolled stacked-head recurrence (see
# gru_scan_heads): recompute x_t @ W_ih inside each checkpointed cell instead
# of materializing the (P, B, T, 3H) pre-projection in HBM.  Dispatch is by
# the size of the pre-projection that hoisting would materialize: measured
# A/B (RESULTS.md "Optimizations evaluated") shows hoisted wins at the
# reference shapes (~20M elements: 3161 vs 2846 steps/s) while in-cell wins
# 1.8-1.9x once the hoisted tensor is HBM-traffic dominant (63M elements at
# xl p=128: 116 -> 210 steps/s; 157M at p=40 h=128: 92 -> 174).  The 2^25
# threshold splits those measured regimes.  Env override for A/B:
# VAE_CONNEXE_INCELL_PROJ=1 forces in-cell, =0 forces hoisted.
_INCELL_MIN_XP_ELEMS = 2 ** 25
_INCELL_PROJ = os.environ.get("VAE_CONNEXE_INCELL_PROJ", "auto")

# Outer-vmap multiplier for the dispatch heuristic: vmap hides its axis from
# trace-time shapes, so a seed-vmapped caller materializes S× the hoisted
# pre-projection the heuristic sees.  The multi-seed sweep sets this to S
# via ``batched_dispatch`` — measured on the sweep workload: hoisted 1121
# vs in-cell 1287 seed-steps/s (RESULTS.md round 3), exactly the regimes
# the single-model threshold predicts once the hidden factor is counted.
_DISPATCH_MULTIPLIER = 1


class batched_dispatch:
    """Context manager: tell the recurrence dispatch that the caller vmaps
    it over an outer axis of ``multiplier`` (active at trace time)."""

    def __init__(self, multiplier: int):
        self.multiplier = max(1, int(multiplier))

    def __enter__(self):
        global _DISPATCH_MULTIPLIER
        self._old = _DISPATCH_MULTIPLIER
        _DISPATCH_MULTIPLIER = self.multiplier
        return self

    def __exit__(self, *exc):
        global _DISPATCH_MULTIPLIER
        _DISPATCH_MULTIPLIER = self._old
        return False


def _use_incell_proj(n_heads: int, batch: int, t_len: int, three_h: int) -> bool:
    if _INCELL_PROJ == "1":
        return True
    if _INCELL_PROJ == "0":
        return False
    return (_DISPATCH_MULTIPLIER * n_heads * batch * t_len * three_h
            >= _INCELL_MIN_XP_ELEMS)


# bf16 storage of the recurrence's saved residuals (VAE_CONNEXE_BF16_RESID=1).
# The flagship train step is HBM-bound with the f32 saved activations (the
# per-cell checkpoint's h carries and the hoisted xp slices) as the dominant
# traffic term (RESULTS.md roofline + anatomy); casting the *cell boundary*
# values to bf16 halves exactly that term while all gate math, parameters,
# and updates stay f32 — jax.checkpoint saves the cell's inputs, so a bf16
# boundary IS a bf16 saved set.  Forward numerics change only by per-step
# bf16 rounding of h (and xp); measured A/B on the real chip decides the
# default (see RESULTS.md "Optimizations evaluated", round 3).
_BF16_RESID = os.environ.get("VAE_CONNEXE_BF16_RESID", "0") == "1"


def set_bf16_resid(value: bool) -> None:
    """Toggle bf16 saved-residual storage (A/B hook; also env-settable)."""
    global _BF16_RESID
    _BF16_RESID = value


# Per-cell jax.checkpoint on the unrolled recurrences (default on — measured
# +23% at xl, neutral at p=20; RESULTS.md round 2).  VAE_CONNEXE_CELL_CKPT=0
# disables it for A/B — the round-2 sweep decomposition blamed the vmapped
# sweep's 2.8× per-seed overhead partly on per-cell remat under vmap, and
# the traffic calculus changes once a seed axis multiplies every saved
# tensor.
_CELL_CKPT = os.environ.get("VAE_CONNEXE_CELL_CKPT", "1") == "1"


def _maybe_checkpoint(fn):
    return jax.checkpoint(fn) if _CELL_CKPT else fn


# Segment rematerialization (VAE_CONNEXE_SEG_REMAT=k, 0 = off): unrolled
# recurrences run as ceil(T/k) jax.checkpoint'ed k-step segments that project
# their OWN input block (one (B, k·D)-wide MXU matmul per segment) instead of
# consuming a hoisted (P, B, T, 3H) pre-projection from HBM.  This is the
# middle ground between the two measured designs: the hoisted path pays the
# full xp HBM round trip (the dominant saved-activation stream at reference
# shapes — RESULTS.md roofline), while the in-cell path (k=1) kills that
# traffic but issues T tiny per-step projections and lost 10% at the north
# star.  A k-step segment keeps xp out of HBM at 1/k of the dispatch cost.
#
# MEASURED NEGATIVE at the north star (p=20, ctx=20, 2000-step TPU runs):
# baseline (hoisted) 3,121 steps/s vs seg-remat k=5: 2,849, k=10: 2,503,
# k=20: 2,530.  The segment backward re-runs the full sequential gate chain
# to rebuild its in-segment activations, and that recompute costs more than
# the xp round trip saves at these shapes.  xl (p=128) routes to the fused
# Pallas kernels before this branch and is unaffected (290.4 vs 290.7).
# Kept as an off-by-default documented design point; parity (fwd + grad,
# shared/per-head inputs, ragged segments) is pinned in
# tests/test_dispatch.py::TestSegmentRemat.
_SEG_REMAT_T = int(os.environ.get("VAE_CONNEXE_SEG_REMAT", "0"))


def set_seg_remat(t: int) -> None:
    """Set the segment-remat length (A/B hook; also env-settable). 0 = off."""
    global _SEG_REMAT_T
    _SEG_REMAT_T = int(t)


@struct.dataclass
class GRUParams:
    """Single-layer GRU parameters, torch layout.

    ``w_ih``: (3H, D_in) rows ordered [reset; update; new].
    ``w_hh``: (3H, H).
    ``b_ih``, ``b_hh``: (3H,).

    Stacked (multi-head) variants carry one extra leading axis on every leaf,
    e.g. ``w_ih``: (P, 3H, D_in).
    """

    w_ih: jax.Array
    w_hh: jax.Array
    b_ih: jax.Array
    b_hh: jax.Array

    @property
    def hidden(self) -> int:
        return self.w_hh.shape[-1]


def init_gru(key: jax.Array, d_in: int, hidden: int, dtype=jnp.float32) -> GRUParams:
    """torch-default uniform init U(-k, k), k = 1/sqrt(hidden)."""
    k = 1.0 / jnp.sqrt(hidden)
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return GRUParams(
        w_ih=u(ks[0], (3 * hidden, d_in)),
        w_hh=u(ks[1], (3 * hidden, hidden)),
        b_ih=u(ks[2], (3 * hidden,)),
        b_hh=u(ks[3], (3 * hidden,)),
    )


def init_stacked_gru(key: jax.Array, n_heads: int, d_in: int, hidden: int,
                     dtype=jnp.float32) -> GRUParams:
    """P independent GRUs stacked on a leading axis (the head/EP axis)."""
    keys = jax.random.split(key, n_heads)
    return jax.vmap(lambda kk: init_gru(kk, d_in, hidden, dtype))(keys)


def _gates(xp: jax.Array, hp: jax.Array, h: jax.Array, hidden: int) -> jax.Array:
    """One GRU state update from pre-projected input xp and hidden proj hp."""
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_cell(params: GRUParams, x_t: jax.Array, h: jax.Array) -> jax.Array:
    """Single GRU step.  x_t: (..., D_in), h: (..., H) -> h': (..., H)."""
    xp = x_t @ params.w_ih.T + params.b_ih
    hp = h @ params.w_hh.T + params.b_hh
    return _gates(xp, hp, h, params.hidden)


# Sequences at or below this length lower the recurrence as straight-line
# (fully unrolled) XLA instead of a lax.scan while-loop.  On TPU the while
# loop costs ~10-20 us per iteration in loop management and carried-buffer
# traffic — at the reference's T=10..20 windows that overhead dominates the
# actual (B, H) @ (H, 3H) step compute by >10x, and the unrolled form lets
# XLA fuse across timesteps (measured ~1.5x faster full train steps).  Long
# sequences keep the scan to bound program size.
UNROLL_MAX_T = 64


def gru_scan(params: GRUParams, x: jax.Array, h0: jax.Array):
    """Full-sequence GRU.  x: (B, T, D), h0: (B, H) -> (outs (B, T, H), h_T).

    The input projection runs as one MXU matmul over the flattened (B*T)
    axis before the recurrence; the recurrence itself contains only the
    (B, H) @ (H, 3H) hidden projection plus VPU gate math, unrolled for
    short sequences (see ``UNROLL_MAX_T``).
    """
    xp = x @ params.w_ih.T + params.b_ih          # (B, T, 3H)
    hidden = params.hidden
    t_len = x.shape[1]

    if t_len <= UNROLL_MAX_T:
        h = h0
        outs = []
        for t in range(t_len):
            hp = h @ params.w_hh.T + params.b_hh
            h = _gates(xp[:, t], hp, h, hidden)
            outs.append(h)
        return jnp.stack(outs, axis=1), h

    def step(h, xp_t):
        hp = h @ params.w_hh.T + params.b_hh
        h_new = _gates(xp_t, hp, h, hidden)
        return h_new, h_new

    h_t, outs = jax.lax.scan(step, h0, jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(outs, 0, 1), h_t


def gru_scan_heads(params: GRUParams, x: jax.Array, h0: jax.Array):
    """P stacked GRUs over one shared-or-per-head input sequence.

    Replaces the reference's Python loop over per-variable decoder GRUs
    (``author_CRVAE.py:221-222``) with a single batched recurrence.

    Args:
      params: stacked ``GRUParams`` with leading axis P.
      x: (B, T, D) shared input, or (P, B, T, D) per-head input.
      h0: (P, B, H) initial hidden per head (broadcastable).

    Returns:
      (outs (P, B, T, H), h_T (P, B, H)).
    """
    hidden = params.hidden
    t_len = x.shape[-2]
    n_heads = params.w_ih.shape[0]

    if t_len <= UNROLL_MAX_T and _SEG_REMAT_T > 1:
        # Segment-remat variant (see _SEG_REMAT_T above): each k-step segment
        # is one checkpoint whose backward recomputes the segment's xp block
        # and gate math from (h_in, x block, params) — the (P, B, k, 3H)
        # pre-projection lives only inside the segment, never in HBM.  The
        # segment's stacked h outputs are primal outputs (the readout
        # consumes them), not residuals, so the saved set per segment is the
        # (P, B, H) carry plus the raw (B, k, D) input slice.
        seg = min(_SEG_REMAT_T, t_len)

        @jax.checkpoint
        def segment(h, x_seg, params):
            if x_seg.ndim == 3:
                xp_seg = (jnp.einsum("bkd,pgd->pbkg", x_seg, params.w_ih)
                          + params.b_ih[:, None, None, :])
            else:
                xp_seg = (jnp.einsum("pbkd,pgd->pbkg", x_seg, params.w_ih)
                          + params.b_ih[:, None, None, :])
            hs = []
            for j in range(x_seg.shape[-2]):
                hp = (jnp.einsum("pbh,pgh->pbg", h, params.w_hh)
                      + params.b_hh[:, None, :])
                h = _gates(xp_seg[:, :, j], hp, h, hidden)
                hs.append(h)
            return jnp.stack(hs, axis=2), h

        b = x.shape[-3]
        h = jnp.broadcast_to(h0, (n_heads, b, hidden))
        out_blocks = []
        for s in range(0, t_len, seg):
            outs_seg, h = segment(h, x[..., s:s + seg, :], params)
            out_blocks.append(outs_seg)
        outs = (out_blocks[0] if len(out_blocks) == 1
                else jnp.concatenate(out_blocks, axis=2))
        return outs, h

    if t_len <= UNROLL_MAX_T and _use_incell_proj(
            n_heads, x.shape[-3], t_len, 3 * hidden):
        # Each unrolled cell is wrapped in jax.checkpoint with the INPUT
        # PROJECTION INSIDE the cell: the (P, B, T, 3H) pre-projected tensor
        # never materializes in HBM — forward and backward both recompute
        # x_t @ W_ih per step, and the saved residuals shrink to (h, x_t)
        # where x_t is (B, D), ~3H/D times smaller.  The training step is
        # HBM-bound while the MXU idles (RESULTS.md roofline), so trading
        # recomputed matmul FLOPs for the dominant saved-activation traffic
        # wins once that tensor is large (see _use_incell_proj; measured per
        # workload in RESULTS.md "Optimizations evaluated").  Forward
        # numerics are unchanged (same contraction, computed per step).
        bf16 = _BF16_RESID

        @_maybe_checkpoint
        def cell(h, x_t, params):
            h = h.astype(jnp.float32)
            if x_t.ndim == 2:
                xp_t = (jnp.einsum("bd,pgd->pbg", x_t, params.w_ih)
                        + params.b_ih[:, None, :])
            else:
                xp_t = (jnp.einsum("pbd,pgd->pbg", x_t, params.w_ih)
                        + params.b_ih[:, None, :])
            hp = jnp.einsum("pbh,pgh->pbg", h, params.w_hh) + params.b_hh[:, None, :]
            h_new = _gates(xp_t, hp, h, hidden)
            return h_new.astype(jnp.bfloat16) if bf16 else h_new

        b = x.shape[-3]
        h = jnp.broadcast_to(h0, (n_heads, b, hidden))
        if bf16:
            h = h.astype(jnp.bfloat16)
        outs = []
        for t in range(t_len):
            h = cell(h, x[..., t, :], params)
            outs.append(h)
        # outs stay in the storage dtype — the readout matmul consumes bf16
        # directly (mixed-precision dot, f32 result); h_T returns f32.
        return jnp.stack(outs, axis=2), h.astype(jnp.float32)

    if x.ndim == 3:
        # One einsum for all heads' input projections: (B,T,D)x(P,3H,D).
        xp = jnp.einsum("btd,pgd->pbtg", x, params.w_ih) + params.b_ih[:, None, None, :]
    else:
        xp = jnp.einsum("pbtd,pgd->pbtg", x, params.w_ih) + params.b_ih[:, None, None, :]
    h0 = jnp.broadcast_to(h0, xp.shape[:2] + (hidden,))

    if t_len <= UNROLL_MAX_T:
        # Hoisted-xp unrolled variant (small pre-projection / reference
        # shapes): one large MXU matmul for all steps' input projections,
        # per-cell checkpoint rematerializing gate math from (h, xp_t).
        bf16 = _BF16_RESID
        if bf16:
            # The hoisted pre-projection and the h carries are the two
            # dominant saved-activation streams — store both in bf16.
            xp = xp.astype(jnp.bfloat16)
            h0 = h0.astype(jnp.bfloat16)

        @_maybe_checkpoint
        def cell(h, xp_t, w_hh, b_hh):
            h = h.astype(jnp.float32)
            hp = jnp.einsum("pbh,pgh->pbg", h, w_hh) + b_hh[:, None, :]
            h_new = _gates(xp_t.astype(jnp.float32), hp, h, hidden)
            return h_new.astype(jnp.bfloat16) if bf16 else h_new

        h = h0
        outs = []
        for t in range(t_len):
            h = cell(h, xp[:, :, t], params.w_hh, params.b_hh)
            outs.append(h)
        return jnp.stack(outs, axis=2), h.astype(jnp.float32)

    def step(h, xp_t):
        # h: (P, B, H); xp_t: (P, B, 3H); batched matmul over the head axis.
        hp = jnp.einsum("pbh,pgh->pbg", h, params.w_hh) + params.b_hh[:, None, :]
        h_new = _gates(xp_t, hp, h, hidden)
        return h_new, h_new

    h_t, outs = jax.lax.scan(step, h0, jnp.moveaxis(xp, 2, 0))  # scan over T
    return jnp.moveaxis(outs, 0, 2), h_t


def gru_step_heads(params: GRUParams, x_t: jax.Array, h: jax.Array) -> jax.Array:
    """One step of P stacked GRUs (rollout inner step).

    x_t: (B, D) shared across heads, or (P, B, D) per-head inputs;
    h: (P, B, H).  Returns h': (P, B, H).
    """
    if x_t.ndim == 2:
        xp = jnp.einsum("bd,pgd->pbg", x_t, params.w_ih) + params.b_ih[:, None, :]
    else:
        xp = jnp.einsum("pbd,pgd->pbg", x_t, params.w_ih) + params.b_ih[:, None, :]
    hp = jnp.einsum("pbh,pgh->pbg", h, params.w_hh) + params.b_hh[:, None, :]
    return _gates(xp, hp, h, params.hidden)
