"""Pallas fused stacked-head GRU recurrence — the TPU answer to cuDNN's
fused GRU (reached by the reference via ``nn.GRU``/``flatten_parameters``,
``/root/reference/author_CRVAE.py:107-108``).

Decomposition (see pallas_guide.md):

1. The input projection for all heads and all timesteps is ONE large MXU
   matmul done *outside* the kernel (``x @ W_ih^T``) — it has no sequential
   dependence and XLA already schedules it perfectly.
2. The sequential part — T steps of (B, H) @ (H, 3H) hidden projection plus
   VPU gate math per head — runs as a single Pallas kernel, one grid program
   per (head, batch-tile).  The hidden state lives in VMEM scratch across
   all T steps; per-step outputs stream to the output block.  One kernel
   launch replaces T scan iterations of HBM-roundtripped carries.

A custom VJP makes the fused path trainable: the backward kernel replays the
recurrence in reverse inside VMEM (rematerializing gate pre-activations from
the saved per-step hidden states), accumulating dW_hh/db_hh locally and
streaming dxp per step.

Correctness contract: bit-compatible gate math with ``ops.gru`` (same split
order r, z, n; reset gate multiplies the hidden candidate).  The lax path
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


def _fwd_kernel(xp_ref, w_hh_ref, b_hh_ref, h0_ref, outs_ref, *, t_steps, hidden):
    """One (head, batch-tile) program: run the full T-step recurrence.

    Block shapes: xp (1, T, Bt, 3H), w_hh (1, 3H, H), b_hh (1, 1, 3H),
    h0 (1, Bt, H), outs (1, T, Bt, H).
    """
    w_hh = w_hh_ref[0]                      # (3H, H)
    b_hh = b_hh_ref[0]                      # (1, 3H)

    def step(t, h):
        xp_t = xp_ref[0, t]                 # (Bt, 3H)
        hp = jax.lax.dot_general(h, w_hh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) + b_hh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        outs_ref[0, t] = h_new
        return h_new

    jax.lax.fori_loop(0, t_steps, step, h0_ref[0])


def _pick_batch_tile(b: int, t: int, hidden: int) -> int:
    """Largest *divisor* of b whose VMEM working set fits.

    Must divide b exactly — grid=(p, b // tile) covers the batch only for
    exact divisors; a non-divisor would silently skip trailing rows."""
    budget = 10 * 1024 * 1024   # leave headroom under ~16MB VMEM

    def fits(tile: int) -> bool:
        # xp block + outs block + h + weights, f32.
        need = 4 * (t * tile * 3 * hidden + t * tile * hidden
                    + tile * hidden + 3 * hidden * hidden)
        return need <= budget

    for tile in range(b, 0, -1):
        if b % tile == 0 and fits(tile):
            return tile
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_recurrence(xp: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
                      h0: jax.Array, interpret: bool = False) -> jax.Array:
    """xp (P, T, B, 3H), w_hh (P, 3H, H), b_hh (P, 3H), h0 (P, B, H)
    -> outs (P, T, B, H)."""
    p, t, b, three_h = xp.shape
    hidden = three_h // 3
    bt = _pick_batch_tile(b, t, hidden)

    kernel = functools.partial(_fwd_kernel, t_steps=t, hidden=hidden)
    return pl.pallas_call(
        kernel,
        grid=(p, b // bt),
        in_specs=[
            pl.BlockSpec((1, t, bt, three_h), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h, hidden), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, three_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, bt, hidden), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, t, b, hidden), xp.dtype),
        interpret=interpret,
    )(xp, w_hh, b_hh[:, None, :], h0)


def _project_inputs(params: GRUParams, x: jax.Array) -> jax.Array:
    """All heads' input projections in one einsum -> (P, B, T, 3H)."""
    if x.ndim == 3:
        return jnp.einsum("btd,pgd->pbtg", x, params.w_ih) + params.b_ih[:, None, None, :]
    return jnp.einsum("pbtd,pgd->pbtg", x, params.w_ih) + params.b_ih[:, None, None, :]


def fused_gru_scan_heads(params: GRUParams, x: jax.Array, h0: jax.Array,
                         interpret: bool = False):
    """Drop-in fused replacement for ``ops.gru.gru_scan_heads`` (forward).

    Args match gru_scan_heads: stacked params (leading P), x (B, T, D) shared
    or (P, B, T, D) per-head, h0 (P, B, H).  Returns (outs (P, B, T, H), h_T).
    """
    xp = _project_inputs(params, x)                       # (P, B, T, 3H)
    xp = jnp.swapaxes(xp, 1, 2)                           # (P, T, B, 3H)
    outs = _fused_recurrence(xp, params.w_hh, params.b_hh, h0,
                             interpret=interpret)         # (P, T, B, H)
    outs = jnp.swapaxes(outs, 1, 2)                       # (P, B, T, H)
    return outs, outs[:, :, -1, :]


# --------------------------------------------------------------------------
# Backward kernel + custom VJP (trainable fused path)
# --------------------------------------------------------------------------

def _bwd_kernel(xp_ref, hprev_ref, outs_ref, douts_ref, w_hh_ref, b_hh_ref,
                dxp_ref, dwhh_ref, dbhh_ref, dh0_ref,
                dh_scratch, dw_scratch, db_scratch, *, t_steps, hidden):
    """Reverse-time replay for one (head, batch-tile) program.

    Blocks: xp (1,T,Bt,3H), hprev (1,T,Bt,H) [h_{t-1} for each t],
    outs (1,T,Bt,H), douts (1,T,Bt,H), w_hh (1,3H,H), b_hh (1,1,3H);
    outputs dxp (1,T,Bt,3H), per-tile dwhh (1,1,3H,H), dbhh (1,1,1,3H),
    dh0 (1,Bt,H).  Gate pre-activations are rematerialized exactly as in the
    forward — hp = h_prev @ W_hh^T + b_hh, with the n-gate bias inside the
    reset product (torch semantics) — one extra matmul per step;
    dW_hh/db_hh accumulate in VMEM scratch.
    """
    w_hh = w_hh_ref[0]                                    # (3H, H)
    b_hh = b_hh_ref[0]                                    # (1, 3H)
    dh_scratch[...] = jnp.zeros_like(dh_scratch)
    dw_scratch[...] = jnp.zeros_like(dw_scratch)
    db_scratch[...] = jnp.zeros_like(db_scratch)

    def step(i, _):
        t = t_steps - 1 - i
        h_prev = hprev_ref[0, t]                          # (Bt, H)
        dh = douts_ref[0, t] + dh_scratch[...]

        hp = jax.lax.dot_general(h_prev, w_hh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) + b_hh
        xp_t = xp_ref[0, t]
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        a = xn + r * hn
        n = jnp.tanh(a)

        dz = dh * (h_prev - n) * z * (1.0 - z)
        da = dh * (1.0 - z) * (1.0 - n * n)
        dbr = da * hn * r * (1.0 - r)
        ghid = jnp.concatenate([dbr, dz, da * r], axis=-1)   # grad wrt hp
        dxp_ref[0, t] = jnp.concatenate([dbr, dz, da], axis=-1)

        # carry: dh_{t-1} = dh*z + ghid @ W_hh
        dh_scratch[...] = dh * z + jnp.dot(ghid, w_hh,
                                           preferred_element_type=jnp.float32)
        # dW_hh += ghid^T @ h_prev ; db_hh += sum_B ghid
        dw_scratch[...] += jax.lax.dot_general(
            ghid, h_prev, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_scratch[...] += jnp.sum(ghid, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, t_steps, step, 0)
    dwhh_ref[0, 0] = dw_scratch[...]
    dbhh_ref[0, 0, 0] = db_scratch[0]
    dh0_ref[0] = dh_scratch[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_recurrence_bwd(xp_b: jax.Array, hprev: jax.Array, outs: jax.Array,
                          douts: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
                          interpret: bool = False):
    """All arrays time-major: xp_b (P,T,B,3H), hprev/outs/douts (P,T,B,H).
    Returns (dxp (P,T,B,3H), dwhh (P,3H,H), dbhh (P,3H), dh0 (P,B,H))."""
    p, t, b, three_h = xp_b.shape
    hidden = three_h // 3
    bt = _pick_batch_tile(b, t, hidden)
    n_tiles = b // bt

    kernel = functools.partial(_bwd_kernel, t_steps=t, hidden=hidden)
    dxp, dwhh_p, dbhh_p, dh0 = pl.pallas_call(
        kernel,
        grid=(p, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t, bt, three_h), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, bt, hidden), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, bt, hidden), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, bt, hidden), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_h, hidden), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, three_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, bt, three_h), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, three_h, hidden), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, three_h), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, t, b, three_h), xp_b.dtype),
            jax.ShapeDtypeStruct((p, n_tiles, three_h, hidden), xp_b.dtype),
            jax.ShapeDtypeStruct((p, n_tiles, 1, three_h), xp_b.dtype),
            jax.ShapeDtypeStruct((p, b, hidden), xp_b.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, hidden), jnp.float32),
            pltpu.VMEM((three_h, hidden), jnp.float32),
            pltpu.VMEM((1, three_h), jnp.float32),
        ],
        interpret=interpret,
    )(xp_b, hprev, outs, douts, w_hh, b_hh[:, None, :])
    return dxp, dwhh_p.sum(axis=1), dbhh_p[:, :, 0, :].sum(axis=1), dh0


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
    params = GRUParams(w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh)
    xp = jnp.swapaxes(_project_inputs(params, x), 1, 2)     # (P,T,B,3H)
    outs_tm = _fused_recurrence(xp, w_hh, b_hh, h0, interpret=_INTERPRET)
    outs = jnp.swapaxes(outs_tm, 1, 2)
    return outs, (w_ih, w_hh, b_hh, x, h0, xp, outs_tm)


def _fused_core_bwd(res, douts):
    w_ih, w_hh, b_hh, x, h0, xp, outs_tm = res
    p, t, b, hidden = outs_tm.shape
    hprev = jnp.concatenate([h0[:, None], outs_tm[:, :-1]], axis=1)
    douts_tm = jnp.swapaxes(douts, 1, 2)
    dxp, dwhh, dbhh, dh0 = _fused_recurrence_bwd(
        xp, hprev, outs_tm, douts_tm, w_hh, b_hh, interpret=_INTERPRET)

    db_ih = jnp.sum(dxp, axis=(1, 2))                       # (P, 3H)
    if x.ndim == 3:
        dw_ih = jnp.einsum("ptbg,btd->pgd", dxp, x)
        dx = jnp.einsum("ptbg,pgd->btd", dxp, w_ih)
    else:
        dw_ih = jnp.einsum("ptbg,pbtd->pgd", dxp, x)
        dx = jnp.einsum("ptbg,pgd->pbtd", dxp, w_ih)
    return dw_ih, db_ih, dwhh, dbhh, dx, dh0


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def gru_scan_heads_fused(params: GRUParams, x: jax.Array, h0: jax.Array):
    """Trainable fused stacked-head GRU: same contract as
    ``ops.gru.gru_scan_heads`` — (outs (P, B, T, H), h_T (P, B, H)) — with a
    Pallas forward AND backward (custom VJP)."""
    outs = _fused_core(params.w_ih, params.b_ih, params.w_hh, params.b_hh,
                       x, h0)
    return outs, outs[:, :, -1, :]
