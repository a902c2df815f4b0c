"""Sequence-parallel (sp) recurrence: the GRU time axis sharded over a mesh
axis, hidden state handed device-to-device, microbatch-pipelined.

The reference has no long-context strategy beyond windowing (SURVEY.md §5
"Long-context"); its recurrences are single-device ``nn.GRU`` calls
(``/root/reference/author_CRVAE.py:107``).  This module supplies the
TPU-native scale-out for the sequence axis itself, for configs whose windows
outgrow one chip's HBM or whose latency budget wants the time axis spread
over ICI:

- the (B, T, D) input is sharded on T: device s owns one contiguous time
  chunk of length T/S and computes its slice of the recurrence;
- a recurrence is sequential in T, so the carried hidden state flows from
  device s-1 to device s via ``lax.ppermute`` (one (P, Bm, H) message per
  pipeline round — rides ICI, never the host);
- to keep devices busy despite the sequential dependency, the batch is split
  into M microbatches and pipelined GPipe-style: in round k device s runs
  microbatch k-s, so after an (S-1)-round fill bubble all S devices compute
  concurrently.  Pipeline efficiency is M/(M+S-1).

Gate math, layouts, and results are identical to ``ops.gru.gru_scan_heads``
(tested leaf-for-leaf, forward and gradients, in
``tests/test_seq_parallel.py``).  Everything is static-shaped: the round
schedule is a Python loop of length S+M-1 over masked ``dynamic_slice``
selects, so the whole pipeline jit-compiles to one XLA program.

Per-device compute follows the SAME kernel dispatch policy as the
single-device path (``ops.dispatch.use_fused``): when a device's local time
chunk exceeds ``UNROLL_MAX_T`` on TPU (the longhorizon regime sp exists to
scale — RESULTS.md round 2/3: in-kernel-projection fused kernels took
longhorizon 445 → 843 steps/s single-chip), each pipeline round runs the
fused Pallas recurrence (``ops.pallas_gru.gru_scan_heads_fused``, custom-VJP
trainable) on the raw microbatch x slice — the input projection happens
in-kernel, so the (P, B, Tc, 3H) pre-projection is skipped on that path.
Short chunks keep the unrolled straight-line XLA form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vae_connexe_tpu.ops.gru import UNROLL_MAX_T, GRUParams, _gates


def _chunk_recurrence(params: GRUParams, xp: jax.Array, h0: jax.Array):
    """Recurrence over one local time chunk: unrolled straight-line XLA for
    short chunks, ``lax.scan`` beyond ``UNROLL_MAX_T`` — the same program-
    size dispatch as ``ops.gru`` (this body is re-instantiated once per
    pipeline round, so an unconditional unroll at Tc ≫ 64 would inline
    (S+M-1)·Tc cells into one XLA graph and blow the remote-compile
    request size; CLAUDE.md "Remote compile of large graphs").

    xp: (P, Bm, Tc, 3H) pre-projected inputs; h0: (P, Bm, H).
    Returns (outs (P, Bm, Tc, H), h_Tc (P, Bm, H)).
    """
    hidden = params.hidden
    tc = xp.shape[2]

    if tc <= UNROLL_MAX_T:
        h = h0
        outs = []
        for t in range(tc):
            hp = (jnp.einsum("pbh,pgh->pbg", h, params.w_hh)
                  + params.b_hh[:, None, :])
            h = _gates(xp[:, :, t], hp, h, hidden)
            outs.append(h)
        return jnp.stack(outs, axis=2), h

    def step(h, xp_t):
        hp = (jnp.einsum("pbh,pgh->pbg", h, params.w_hh)
              + params.b_hh[:, None, :])
        h_new = _gates(xp_t, hp, h, hidden)
        return h_new, h_new

    h_t, outs = jax.lax.scan(step, h0, jnp.moveaxis(xp, 2, 0))
    return jnp.moveaxis(outs, 0, 2), h_t


def seq_sharded_gru_heads(params: GRUParams, x: jax.Array, h0: jax.Array,
                          mesh: Mesh, axis: str = "sp",
                          microbatches: int | None = None,
                          batch_axis: str | None = None):
    """Stacked-head GRU with the time axis sharded over ``mesh[axis]``.

    Drop-in contract of ``ops.gru.gru_scan_heads`` (shared input form):

    Args:
      params: stacked ``GRUParams``, leading head axis P (replicated).
      x: (B, T, D) shared input sequence; T must divide by the sp size.
      h0: (P, B, H) initial hidden per head.
      mesh: mesh containing ``axis``.
      microbatches: pipeline depth M (divides the per-device batch).
        Default: the largest divisor of the local batch that is <= the sp
        size — bounds the fill bubble at <= 50% and is always valid
        (min(B, S) itself need not divide B).
      batch_axis: optional mesh axis the batch dimension is sharded over
        (the training fits' dp axis) — the pipeline then runs per dp group
        on its local batch slice, composing sp with data parallelism.

    Returns:
      (outs (P, B, T, H), h_T (P, B, H)) — outs sharded on T over ``axis``
      (and on B over ``batch_axis`` when given), h_T replicated over sp.
    """
    n_sp = mesh.shape[axis]
    p_heads, b, hidden = h0.shape
    t_len = x.shape[1]
    if t_len % n_sp:
        raise ValueError(
            f"sequence length {t_len} not divisible by the '{axis}' mesh size "
            f"{n_sp} — pad the window or choose a dividing sp size")
    n_dp = mesh.shape[batch_axis] if batch_axis is not None else 1
    if b % n_dp:
        raise ValueError(
            f"batch {b} not divisible by the '{batch_axis}' mesh size "
            f"{n_dp}")
    b = b // n_dp                      # per-device (local) batch from here on
    if microbatches is not None:
        m = microbatches
    else:
        m = max(d for d in range(1, min(b, n_sp) + 1) if b % d == 0)
        if m == 1 and b > 1 and n_sp > 1:
            # E.g. prime B: the largest divisor ≤ S is 1, so the pipeline
            # degrades to zero overlap (devices strictly serialize).  Run
            # anyway (correctness is unaffected) but tell the caller the
            # efficiency story: pipeline efficiency is M/(M+S-1).
            import warnings
            warnings.warn(
                f"seq-parallel pipeline: batch {b} has no divisor ≤ sp size "
                f"{n_sp} except 1 — microbatches=1 means zero compute "
                f"overlap (efficiency 1/{n_sp}). Pad the batch to a "
                f"multiple of a small integer (e.g. {n_sp}) to pipeline.",
                stacklevel=2)
    if b % m:
        raise ValueError(
            f"batch {b} not divisible by microbatches={m} — choose a pipeline "
            f"depth dividing the batch")
    bm = b // m
    rounds = n_sp + m - 1

    tc_local = t_len // n_sp
    # Per-device kernel dispatch — the single-device policy applied at the
    # LOCAL chunk shape: fused Pallas recurrence for long chunks on TPU
    # (the longhorizon regime sp exists to scale), unrolled/scan XLA
    # otherwise.  Decided at trace time, uniform across devices (every
    # device owns an identical-shape chunk).
    from vae_connexe_tpu.ops.dispatch import use_fused
    fused = use_fused(tc_local, n_heads=p_heads, batch=bm)

    def local(params, x_loc, h0_full):
        # x_loc: (B, Tc, D) — this device's time chunk; params/h0 replicated.
        s = jax.lax.axis_index(axis)
        tc = x_loc.shape[1]
        if fused:
            # Raw microbatch slices: the fused kernel projects x in-kernel
            # (ops/pallas_gru.py), so the (P, B, Tc, 3H) pre-projection
            # never materializes on this path.
            x_mb_all = x_loc.reshape(m, bm, tc, x_loc.shape[-1])
        else:
            # Whole-chunk input projection: one MXU einsum for all
            # heads/steps, shared across the pipeline rounds.
            xp = (jnp.einsum("btd,pgd->pbtg", x_loc, params.w_ih)
                  + params.b_ih[:, None, None, :])       # (P, B, Tc, 3H)
            xp = xp.reshape(p_heads, m, bm, tc, 3 * hidden)  # microbatched
        h0_mb = h0_full.reshape(p_heads, m, bm, hidden)

        outs = jnp.zeros((p_heads, m, bm, tc, hidden), x_loc.dtype)
        h_last = jnp.zeros((p_heads, m, bm, hidden), x_loc.dtype)
        recv = jnp.zeros((p_heads, bm, hidden), x_loc.dtype)
        fwd = [(i, i + 1) for i in range(n_sp - 1)]

        for k in range(rounds):
            m_idx = jnp.clip(k - s, 0, m - 1)
            valid = jnp.logical_and(k - s >= 0, k - s < m)
            # Device 0 seeds each microbatch from h0; others take the left
            # neighbour's carry (sent at the end of round k-1).
            h_in = jnp.where(s == 0,
                             jax.lax.dynamic_index_in_dim(
                                 h0_mb, m_idx, axis=1, keepdims=False),
                             recv)
            if fused:
                from vae_connexe_tpu.ops.pallas_gru import gru_scan_heads_fused
                x_mb = jax.lax.dynamic_index_in_dim(x_mb_all, m_idx, axis=0,
                                                    keepdims=False)
                outs_bt, h_out = gru_scan_heads_fused(params, x_mb, h_in)
                outs_mb = outs_bt                        # (P, Bm, Tc, H)
            else:
                xp_mb = jax.lax.dynamic_index_in_dim(xp, m_idx, axis=1,
                                                     keepdims=False)
                outs_mb, h_out = _chunk_recurrence(params, xp_mb, h_in)
            outs = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(
                    outs, outs_mb, m_idx, axis=1),
                outs)
            h_last = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(
                    h_last, h_out, m_idx, axis=1),
                h_last)
            if k < rounds - 1 and n_sp > 1:
                recv = jax.lax.ppermute(h_out, axis, fwd)

        outs = outs.reshape(p_heads, b, tc, hidden)
        # h_T lives on the last device; replicate it with a masked psum —
        # a ring all-reduce moves ~2·(P, B, H) per device, vs the S×
        # oversend of all_gathering every device's full carry and keeping
        # one slice (round-2 verdict, "seq_parallel h_T replication").
        h_full = h_last.reshape(p_heads, b, hidden)
        h_t = jax.lax.psum(
            jnp.where(s == n_sp - 1, h_full, jnp.zeros_like(h_full)), axis)
        return outs, h_t

    ba = batch_axis
    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(ba, axis, None), P(None, ba, None)),
        out_specs=(P(None, ba, axis, None), P(None, ba, None)),
        check_vma=False)
    return shmapped(params, x, h0)


def seq_sharded_gru(params: GRUParams, x: jax.Array, h0: jax.Array,
                    mesh: Mesh, axis: str = "sp",
                    microbatches: int | None = None):
    """Single (unstacked) GRU with a sequence-sharded time axis — contract of
    ``ops.gru.gru_scan``, riding the stacked pipeline as a 1-head stack."""
    stacked = jax.tree.map(lambda a: a[None], params)
    outs, h_t = seq_sharded_gru_heads(stacked, x, h0[None], mesh, axis,
                                      microbatches)
    return outs[0], h_t[0]
