"""Pallas fused stacked-head GRU recurrence — the TPU answer to cuDNN's
fused GRU (reached by the reference via ``nn.GRU``/``flatten_parameters``,
``/root/reference/author_CRVAE.py:107-108``).

Decomposition (see pallas_guide.md):

1. The sequential part — the per-step (B, H) @ (H, 3H) hidden projection
   plus VPU gate math per head — runs as a Pallas kernel over a
   (head-tile, batch-tile, time-tile) grid.  The TPU grid iterates
   **sequentially**, so the hidden state lives in VMEM scratch and carries
   across time tiles with no HBM round trips; per-step outputs stream to
   the output blocks.  Time tiling bounds VMEM at any sequence length.
   Up to ``_PH_MAX`` heads are packed per program and advanced together
   by ONE batched 3D ``dot_general`` per step (this Mosaic version
   accepts batched dots inside ``fori_loop``; round 1's per-head
   statically-unrolled 2D dots measured +10% over one-head programs, the
   batched form a further +16% — 403 → 445 → 843 steps/s end-to-end on
   longhorizon together with the in-kernel projection below), cutting
   the sequential dependency chain from p·T to (p/ph)·T batched matmuls.
   Mosaic pitfall: broadcasting a (ph, 1, 3H) bias against a 3D vector
   crashes the compiler, so b_hh arrives pre-broadcast to (ph, Bt, 3H).
2. The input projection ``x @ W_ih^T`` is computed **inside the kernel**,
   one whole-tile MXU matmul per head into a VMEM scratch, from the raw
   (tt, bt, D) x block.  The (P, B, T, 3H) pre-projection therefore never
   exists in HBM — the kernel streams D-wide x instead of 3H-wide xp
   (D = p ≈ 10-20 vs 3H = 192 at the longhorizon shapes), the same
   traffic-for-recompute trade the XLA path's in-cell projection makes
   (``ops/gru.py``).  The recurrence loop itself is unchanged: it reads
   xp from scratch, so the sequential critical path is identical to the
   streamed-xp design.

A custom VJP makes the fused path trainable: the backward kernel replays
the recurrence in reverse (the time-tile grid axis is index-mapped back to
front), rematerializing gate pre-activations from the saved per-step hidden
states and the in-kernel re-projected xp.  The per-step input-projection
gradients gx overwrite the xp scratch slots as the reverse loop consumes
them; after the loop, one whole-tile matmul per head accumulates
dW_ih += gxᵀ x into scratch (written out on the last time tile, like
dW_hh), and dx = Σ_heads gx @ W_ih is emitted head-reduced — dxp never
materializes in HBM either.

Correctness contract: bit-compatible gate math with ``ops.gru`` (same split
order r, z, n; reset gate multiplies the hidden candidate — the n-gate's
hidden bias sits inside the reset product, torch semantics).  The lax path
remains the reference implementation; ``tests/test_pallas_gru.py`` pins
fwd+bwd equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_connexe_tpu.ops.gru import GRUParams

_VMEM_BUDGET = 14 * 1024 * 1024   # under the 16MB scoped-vmem limit
_PH_MAX = 16                      # max heads unrolled per kernel program


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def _blk(*shape):
    """Padded f32 elems of one VMEM block: Mosaic rounds the last dim up to
    128 lanes (decisive — a D=10 stream occupies 128 lanes, as wide as a
    hidden-width block) and the second-to-last to 8 sublanes.  Shared by
    the VMEM accounting in this module, ``pallas_step`` and
    ``pallas_rollout``."""
    dims = list(shape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // 8) * 8
    n = 1
    for v in dims:
        n *= v
    return n


def _pick_tiles(p: int, b: int, t: int, hidden: int, d_in: int,
                shared: bool, mode: str):
    """Choose (head_tile, batch_tile, time_tile).

    The TPU grid iterates sequentially, so the recurrence always executes
    (p/ph)·(b/bt)·T per-step dots in sequence; what the tiling controls is
    how much work each dot carries (ph·bt rows through the MXU) and hence
    how well the fixed per-dot issue cost amortizes.  Objective: among
    fitting candidates, maximize ph·bt (fewest, biggest programs),
    tie-breaking on the largest time tile (fewest grid steps).  A greedy
    ph-first scan can miss this (e.g. prefer (ph=4, bt=8) over the 8×
    larger (ph=1, bt=256) in VMEM-tight regimes).

    Constraints: ph | p; bt | b and (bt % 8 == 0 or bt == b) (Mosaic
    sublane rule); tt | t.

    VMEM accounting is per explicit padded block (``_blk``) with buffering
    multipliers calibrated against Mosaic's scoped-vmem reports: blocks
    whose index map varies with a grid axis are double-buffered — the
    time-tile streams always, the batch-indexed blocks (h0/dh0, dW
    outputs) only when there is more than one batch tile (observed:
    identical block sets fit at n_bt=1 and OOM'd by the ~3 MB those
    blocks occupy at n_bt=2).  Grid-constant blocks and scratch are
    single-buffered.
    """
    three_h = 3 * hidden
    blk = _blk

    def fits(ph: int, bt: int, tt: int) -> bool:
        jb = 2 if bt < b else 1                # batch-varying buffering
        x_blk = blk(tt, bt, d_in) if shared else blk(ph, tt, bt, d_in)
        # b_hh is pre-broadcast to one (p, bt, 3H) tile with a j-constant
        # index map — identical values for every batch tile — so it is
        # grid-constant (×1).
        weights = (blk(ph, three_h, d_in) + blk(ph, three_h, hidden)
                   + blk(ph, 1, three_h) + blk(ph, bt, three_h))
        if mode == "fwd":
            streamed = x_blk + blk(ph, tt, bt, hidden)
            resident = weights + jb * blk(ph, bt, hidden)     # h0
            scratch = blk(ph, tt, bt, three_h) + blk(ph, bt, hidden)
        else:
            dx_blk = blk(1, tt, bt, d_in) if shared else blk(ph, tt, bt, d_in)
            # outs + douts tiles, the (ph, 1, bt, H) boundary block, and dx.
            streamed = (x_blk + 2 * blk(ph, tt, bt, hidden)
                        + blk(ph, 1, bt, hidden) + dx_blk)
            dw_out = jb * (blk(ph, 1, three_h, d_in)
                           + blk(ph, 1, three_h, hidden)
                           + 2 * blk(ph, 1, 1, three_h)
                           + blk(ph, bt, hidden))
            resident = weights + dw_out
            scratch = (blk(ph, tt, bt, three_h) + blk(ph, bt, hidden)
                       + blk(ph, three_h, d_in) + blk(ph, three_h, hidden)
                       + 2 * blk(ph, 1, three_h))
        need = 2 * streamed + resident + scratch
        return 4 * need <= _VMEM_BUDGET

    bt_candidates = [b] + [d for d in _divisors_desc(b) if d % 8 == 0 and d != b]
    best = None
    # _PH_MAX bounds the per-head whole-tile fill loops' program size (the
    # per-step path is batched and does not grow with ph).
    for ph in [d for d in _divisors_desc(p) if d <= _PH_MAX]:
        for bt in bt_candidates:
            for tt in _divisors_desc(t):
                if fits(ph, bt, tt):
                    cand = (ph * bt, tt, ph, bt)
                    if best is None or cand > best:
                        best = cand
                    break                      # larger tt already found
    if best is not None:
        _, tt, ph, bt = best
        return ph, bt, tt
    # No candidate fit.  The minimal tiling is (ph=1, smallest bt, tt=1);
    # if even that exceeds the budget, raise with the computed footprint
    # instead of proceeding to an opaque Mosaic scoped-vmem OOM.
    bt = bt_candidates[-1] if bt_candidates else b
    if not fits(1, bt, 1):
        raise ValueError(
            f"fused GRU kernel: minimal tiling (ph=1, bt={bt}, tt=1) exceeds "
            f"the {_VMEM_BUDGET >> 20} MiB VMEM budget at p={p}, b={b}, "
            f"t={t}, hidden={hidden}, d_in={d_in} ({mode}) — use the lax "
            f"path at this shape")
    return 1, bt, 1


def _gru_gates(xp_t, hp, h):
    xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _x_tile_2d(x_ref, hh: int, shared: bool, t_tile: int):
    """The (tt·bt, D) flattened x tile for head hh (shared: same for all)."""
    blk = x_ref[...] if shared else x_ref[hh]
    return blk.reshape(t_tile * blk.shape[-2], blk.shape[-1])


def _fill_xp_scratch(x_ref, w_ih_ref, b_ih_ref, xp_scratch, *, ph, t_tile,
                     shared):
    """xp_scratch[hh] ← x_tile @ W_ih[hh]ᵀ + b_ih[hh]: one whole-tile MXU
    matmul per head — the in-kernel input projection."""
    for hh in range(ph):
        xt = _x_tile_2d(x_ref, hh, shared, t_tile)
        xp = jax.lax.dot_general(xt, w_ih_ref[hh], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) \
            + b_ih_ref[hh, 0]
        xp_scratch[hh] = xp.reshape(xp_scratch.shape[1:])


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ih_ref, b_ih_ref, w_hh_ref, b_hh_ref, h0_ref,
                outs_ref, xp_scratch, h_scratch, *, t_tile, ph, hidden,
                shared):
    """One (head-tile, batch-tile, time-tile) program.

    Blocks: x (tt, Bt, D) shared or (ph, tt, Bt, D) per-head,
    w_ih (ph, 3H, D), b_ih (ph, 1, 3H), w_hh (ph, 3H, H),
    b_hh (ph, Bt, 3H) pre-broadcast (grid-constant — see the wrapper),
    h0 (ph, Bt, H), outs (ph, tt, Bt, H).  The time-tile grid axis iterates
    sequentially; ``h_scratch`` carries the hidden state between tiles and
    ``xp_scratch`` holds the tile's in-kernel input projection.

    All ph heads in the block advance together: one batched 3D
    ``dot_general`` per step (this Mosaic version accepts batched dots in
    ``fori_loop``; the whole-tile fill loops stay per-head 2D), so the
    sequential dependency chain is T batched steps — not the ph·T a
    head-per-grid-program layout pays.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        h_scratch[...] = h0_ref[...]

    _fill_xp_scratch(x_ref, w_ih_ref, b_ih_ref, xp_scratch,
                     ph=ph, t_tile=t_tile, shared=shared)

    def step(t, h):                                # h: (ph, Bt, H)
        # One batched 3D dot covers every head in the block — the heads'
        # dots pipeline through the MXU as a single instruction stream.
        # b_hh arrives pre-broadcast to (ph, Bt, 3H): Mosaic crashes on a
        # (ph, 1, 3H) middle-axis broadcast against a 3D vector.
        hp = jax.lax.dot_general(h, w_hh_ref[...],
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) \
            + b_hh_ref[...]
        h_new = _gru_gates(xp_scratch[:, t], hp, h)
        outs_ref[:, t] = h_new
        return h_new

    h_scratch[...] = jax.lax.fori_loop(0, t_tile, step, h_scratch[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_recurrence(x_tm: jax.Array, w_ih: jax.Array, b_ih: jax.Array,
                      w_hh: jax.Array, b_hh: jax.Array, h0: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """x_tm (T, B, D) shared or (P, T, B, D) per-head, w_ih (P, 3H, D),
    b_ih (P, 3H), w_hh (P, 3H, H), b_hh (P, 3H), h0 (P, B, H)
    -> outs (P, T, B, H)."""
    shared = x_tm.ndim == 3
    t, b, d = x_tm.shape[-3:]
    p, three_h, hidden = w_hh.shape
    ph, bt, tt = _pick_tiles(p, b, t, hidden, d, shared, mode="fwd")

    if shared:
        x_spec = pl.BlockSpec((tt, bt, d), lambda i, j, k: (k, j, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((ph, tt, bt, d), lambda i, j, k: (i, k, j, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, t_tile=tt, ph=ph, hidden=hidden,
                               shared=shared)
    return pl.pallas_call(
        kernel,
        grid=(p // ph, b // bt, t // tt),
        in_specs=[
            x_spec,
            pl.BlockSpec((ph, three_h, d), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, 1, three_h), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, three_h, hidden), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # b_hh pre-broadcast to ONE (p, bt, 3H) tile, grid-constant
            # along j (its values are identical for every batch tile).
            pl.BlockSpec((ph, bt, three_h), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, bt, hidden), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ph, tt, bt, hidden),
                               lambda i, j, k: (i, k, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, t, b, hidden), x_tm.dtype),
        scratch_shapes=[
            pltpu.VMEM((ph, tt, bt, three_h), jnp.float32),
            pltpu.VMEM((ph, bt, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(x_tm, w_ih, b_ih[:, None, :], w_hh,
      jnp.broadcast_to(b_hh[:, None, :], (p, bt, three_h)), h0)


def _time_major(x: jax.Array) -> jax.Array:
    """(B, T, D) -> (T, B, D) or (P, B, T, D) -> (P, T, B, D)."""
    return jnp.swapaxes(x, -3, -2)


def fused_gru_scan_heads(params: GRUParams, x: jax.Array, h0: jax.Array,
                         interpret: bool = False):
    """Drop-in fused replacement for ``ops.gru.gru_scan_heads`` (forward).

    Args match gru_scan_heads: stacked params (leading P), x (B, T, D) shared
    or (P, B, T, D) per-head, h0 (P, B, H).  Returns (outs (P, B, T, H), h_T).
    """
    x_tm = _time_major(x)
    b = x_tm.shape[-2]
    # Honor gru_scan_heads' broadcastable-h0 contract (e.g. (P, 1, H)).
    h0 = jnp.broadcast_to(h0, (params.w_ih.shape[0], b, params.hidden))
    outs = _fused_recurrence(x_tm, params.w_ih, params.b_ih, params.w_hh,
                             params.b_hh, h0, interpret=interpret)
    outs = jnp.swapaxes(outs, 1, 2)                       # (P, B, T, H)
    return outs, outs[:, :, -1, :]


# --------------------------------------------------------------------------
# Backward kernel + custom VJP (trainable fused path)
# --------------------------------------------------------------------------

def _bwd_kernel(x_ref, outs_ref, bnd_ref, douts_ref, w_ih_ref, b_ih_ref,
                w_hh_ref, b_hh_ref,
                dx_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref, dh0_ref,
                gxp_scratch, dh_scratch, dwih_scratch, dbih_scratch,
                dwhh_scratch, dbhh_scratch,
                *, t_tile, n_tt, ph, hidden, shared):
    """Reverse-time replay over a (head-tile, batch-tile, time-tile) grid.

    The time-tile grid axis is index-mapped to walk the sequence back to
    front; within a tile the loop runs t_tile-1 .. 0.  ``dh_scratch``
    carries dL/dh between tiles; the dW/db scratches accumulate across all
    of a (head-tile, batch-tile)'s time tiles and are written out on the
    last one.  Gate pre-activations are rematerialized exactly as in the
    forward: xp via the in-kernel whole-tile projection into
    ``gxp_scratch`` (hp = h_prev @ W_hhᵀ + b_hh per step; the n-gate bias
    inside the reset product, torch semantics).  The reverse loop consumes
    xp[t] and overwrites the same scratch slot with the per-step
    input-projection gradient gx; after the loop one whole-tile matmul per
    head folds gx into dW_ih / db_ih / dx — dxp never leaves VMEM.

    h_prev comes from the forward's ``outs`` tile directly (h_prev at
    in-tile step t is outs[t-1]); only the tile's FIRST step needs the
    previous tile's last output, delivered via ``bnd_ref`` — one
    (ph, 1, Bt, H) block per time tile holding h0 (first tile) or
    outs[k·tt − 1].  This avoids materializing the full shifted
    (P, T, B, H) hprev tensor in HBM (an extra write + read of the
    kernel's largest stream that the XLA-level concatenate used to cost).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dwih_scratch[...] = jnp.zeros_like(dwih_scratch)
        dbih_scratch[...] = jnp.zeros_like(dbih_scratch)
        dwhh_scratch[...] = jnp.zeros_like(dwhh_scratch)
        dbhh_scratch[...] = jnp.zeros_like(dbhh_scratch)

    _fill_xp_scratch(x_ref, w_ih_ref, b_ih_ref, gxp_scratch,
                     ph=ph, t_tile=t_tile, shared=shared)

    def step(i, dh_c):                             # dh_c: (ph, Bt, H)
        t = t_tile - 1 - i
        # h_prev = outs[t-1] within the tile; the t=0 step reads the
        # boundary block (previous tile's last output, or h0).
        h_prev = jnp.where(t == 0, bnd_ref[:, 0],
                           outs_ref[:, jnp.maximum(t - 1, 0)])
        dh = douts_ref[:, t] + dh_c

        # All heads per step as batched 3D dots; b_hh pre-broadcast to
        # (ph, Bt, 3H) — see _fwd_kernel.step.
        hp = jax.lax.dot_general(h_prev, w_hh_ref[...],
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) \
            + b_hh_ref[...]
        xr, xz, xn = jnp.split(gxp_scratch[:, t], 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dz = dh * (h_prev - n) * z * (1.0 - z)
        da = dh * (1.0 - z) * (1.0 - n * n)
        dbr = da * hn * r * (1.0 - r)
        ghid = jnp.concatenate([dbr, dz, da * r], axis=-1)  # grad wrt hp
        gxp_scratch[:, t] = jnp.concatenate([dbr, dz, da], axis=-1)

        dwhh_scratch[...] += jax.lax.dot_general(
            ghid, h_prev, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (ph, 3H, H)
        dbhh_scratch[...] += jnp.sum(ghid, axis=1, keepdims=True)
        return dh * z + jax.lax.dot_general(
            ghid, w_hh_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    dh_scratch[...] = jax.lax.fori_loop(0, t_tile, step, dh_scratch[...])

    # Whole-tile input-projection grads from the gx now in gxp_scratch.
    dx_acc = None
    for hh in range(ph):
        gx_all = gxp_scratch[hh].reshape(t_tile * gxp_scratch.shape[2],
                                         gxp_scratch.shape[3])
        xt = _x_tile_2d(x_ref, hh, shared, t_tile)
        dwih_scratch[hh] += jax.lax.dot_general(
            gx_all, xt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbih_scratch[hh] += jnp.sum(gx_all, axis=0, keepdims=True)
        contrib = jnp.dot(gx_all, w_ih_ref[hh],
                          preferred_element_type=jnp.float32)  # (tt·Bt, D)
        if shared:
            dx_acc = contrib if dx_acc is None else dx_acc + contrib
        else:
            dx_ref[hh] = contrib.reshape(dx_ref.shape[1:])
    if shared:
        dx_ref[0] = dx_acc.reshape(dx_ref.shape[1:])

    @pl.when(k == n_tt - 1)
    def _():
        dwih_ref[:, 0] = dwih_scratch[...]
        dbih_ref[:, 0] = dbih_scratch[...]
        dwhh_ref[:, 0] = dwhh_scratch[...]
        dbhh_ref[:, 0] = dbhh_scratch[...]
        dh0_ref[...] = dh_scratch[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_recurrence_bwd(x_tm: jax.Array, outs_tm: jax.Array,
                          h0: jax.Array,
                          douts: jax.Array, w_ih: jax.Array, b_ih: jax.Array,
                          w_hh: jax.Array, b_hh: jax.Array,
                          interpret: bool = False):
    """All arrays time-major: x_tm (T,B,D) shared or (P,T,B,D) per-head,
    outs_tm/douts (P,T,B,H), h0 (P,B,H).  Gate activations are
    rematerialized from the forward's outs (h_prev ≡ outs shifted by one —
    read in place via the time-tile index map plus a per-tile boundary
    block, never materialized as a separate shifted tensor) + the
    in-kernel re-projected xp, so no xp/dxp/hprev tensor enters HBM.
    Returns (dx_tm — (T,B,D) shared (already
    head-reduced) or (P,T,B,D) —, dwih (P,3H,D), dbih (P,3H),
    dwhh (P,3H,H), dbhh (P,3H), dh0 (P,B,H))."""
    shared = x_tm.ndim == 3
    t, b, d = x_tm.shape[-3:]
    p, three_h, hidden = w_hh.shape
    ph, bt, tt = _pick_tiles(p, b, t, hidden, d, shared, mode="bwd")
    n_bt, n_tt = b // bt, t // tt

    # Time-tile k walks the sequence back to front.
    rev = lambda i, j, k: (i, n_tt - 1 - k, j, 0)  # noqa: E731
    if shared:
        x_spec = pl.BlockSpec((tt, bt, d), lambda i, j, k: (n_tt - 1 - k, j, 0),
                              memory_space=pltpu.VMEM)
        # Each head-tile program writes its own partial dx; summed below.
        dx_spec = pl.BlockSpec((1, tt, bt, d), rev, memory_space=pltpu.VMEM)
        dx_shape = jax.ShapeDtypeStruct((p // ph, t, b, d), x_tm.dtype)
    else:
        x_spec = pl.BlockSpec((ph, tt, bt, d), rev, memory_space=pltpu.VMEM)
        dx_spec = pl.BlockSpec((ph, tt, bt, d), rev, memory_space=pltpu.VMEM)
        dx_shape = jax.ShapeDtypeStruct((p, t, b, d), x_tm.dtype)

    # Boundary blocks: bnd[k] = h_prev at time-tile k's first step — h0 for
    # k=0, else outs[k·tt − 1].  (P, n_tt, B, H): a 1/tt-sized strided read
    # instead of materializing the full shifted hprev tensor.
    if n_tt > 1:
        bnd = jnp.concatenate(
            [h0[:, None], outs_tm[:, tt - 1::tt][:, : n_tt - 1]], axis=1)
    else:
        bnd = h0[:, None]

    kernel = functools.partial(_bwd_kernel, t_tile=tt, n_tt=n_tt, ph=ph,
                               hidden=hidden, shared=shared)
    dx, dwih_p, dbih_p, dwhh_p, dbhh_p, dh0 = pl.pallas_call(
        kernel,
        grid=(p // ph, n_bt, n_tt),
        in_specs=[
            x_spec,
            pl.BlockSpec((ph, tt, bt, hidden), rev, memory_space=pltpu.VMEM),
            # bnd blocks are 1-wide on the time-tile axis, so ``rev``
            # (block-unit indices) addresses them directly.
            pl.BlockSpec((ph, 1, bt, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, tt, bt, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, three_h, d), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, 1, three_h), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, three_h, hidden), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # b_hh: one grid-constant pre-broadcast tile (see forward).
            pl.BlockSpec((ph, bt, three_h), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            dx_spec,
            pl.BlockSpec((ph, 1, three_h, d), lambda i, j, k: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, 1, 1, three_h), lambda i, j, k: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, 1, three_h, hidden),
                         lambda i, j, k: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, 1, 1, three_h), lambda i, j, k: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph, bt, hidden), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            dx_shape,
            jax.ShapeDtypeStruct((p, n_bt, three_h, d), x_tm.dtype),
            jax.ShapeDtypeStruct((p, n_bt, 1, three_h), x_tm.dtype),
            jax.ShapeDtypeStruct((p, n_bt, three_h, hidden), x_tm.dtype),
            jax.ShapeDtypeStruct((p, n_bt, 1, three_h), x_tm.dtype),
            jax.ShapeDtypeStruct((p, b, hidden), x_tm.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ph, tt, bt, three_h), jnp.float32),
            pltpu.VMEM((ph, bt, hidden), jnp.float32),
            pltpu.VMEM((ph, three_h, d), jnp.float32),
            pltpu.VMEM((ph, 1, three_h), jnp.float32),
            pltpu.VMEM((ph, three_h, hidden), jnp.float32),
            pltpu.VMEM((ph, 1, three_h), jnp.float32),
        ],
        interpret=interpret,
    )(x_tm, outs_tm, bnd, douts, w_ih, b_ih[:, None, :], w_hh,
      jnp.broadcast_to(b_hh[:, None, :], (p, bt, three_h)))

    if shared:
        dx = dx.sum(axis=0)                        # reduce head-tile partials
    return (dx, dwih_p.sum(axis=1), dbih_p[:, :, 0, :].sum(axis=1),
            dwhh_p.sum(axis=1), dbhh_p[:, :, 0, :].sum(axis=1), dh0)


_INTERPRET = False   # set True on CPU (tests) via ops.pallas_gru.set_interpret


def set_interpret(value: bool) -> None:
    """Force pallas interpreter mode (CPU testing)."""
    global _INTERPRET
    _INTERPRET = value


@jax.custom_vjp
def _fused_core(w_ih, b_ih, w_hh, b_hh, x, h0):
    """Differentiable fused recurrence core.  x: (B,T,D) shared or
    (P,B,T,D) per-head.  Returns outs (P, B, T, H)."""
    outs, _ = fused_gru_scan_heads(
        GRUParams(w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh), x, h0,
        interpret=_INTERPRET)
    return outs


def _fused_core_fwd(w_ih, b_ih, w_hh, b_hh, x, h0):
    x_tm = _time_major(x)
    outs_tm = _fused_recurrence(x_tm, w_ih, b_ih, w_hh, b_hh, h0,
                                interpret=_INTERPRET)
    outs = jnp.swapaxes(outs_tm, 1, 2)
    return outs, (w_ih, b_ih, w_hh, b_hh, x_tm, h0, outs_tm)


def _fused_core_bwd(res, douts):
    w_ih, b_ih, w_hh, b_hh, x_tm, h0, outs_tm = res
    douts_tm = jnp.swapaxes(douts, 1, 2)
    dx_tm, dwih, dbih, dwhh, dbhh, dh0 = _fused_recurrence_bwd(
        x_tm, outs_tm, h0, douts_tm, w_ih, b_ih, w_hh, b_hh,
        interpret=_INTERPRET)
    dx = _time_major(dx_tm)      # swap back: (T,B,D)->(B,T,D) / 4D analogue
    return dwih, dbih, dwhh, dbhh, dx, dh0


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def gru_scan_heads_fused(params: GRUParams, x: jax.Array, h0: jax.Array):
    """Trainable fused stacked-head GRU: same contract as
    ``ops.gru.gru_scan_heads`` — (outs (P, B, T, H), h_T (P, B, H)) — with a
    Pallas forward AND backward (custom VJP)."""
    b = x.shape[0] if x.ndim == 3 else x.shape[1]
    # Broadcast outside the custom VJP so JAX reduces dh0 correctly for
    # broadcastable inputs like (P, 1, H) — the gru_scan_heads contract.
    h0 = jnp.broadcast_to(h0, (params.w_ih.shape[0], b, params.hidden))
    outs = _fused_core(params.w_ih, params.b_ih, params.w_hh, params.b_hh,
                       x, h0)
    return outs, outs[:, :, -1, :]
