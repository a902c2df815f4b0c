"""Fused Pallas serving kernels: whole-rollout generation in one program.

The serving path (``generate_with_compensation`` → ``ErrorVAE.sample`` +
``CRVAE.rollout``, reference ``/root/reference/author_CRVAE.py:226-246`` +
``:174-182``) is a chain of ~21 sequential tiny steps.  These kernels
collapse each 21-step rollout into ONE Pallas program — parameters and
hidden states stay resident in VMEM for the whole generation, the grid is
embarrassingly parallel over batch tiles, and the only HBM traffic is the
noise stream in and the sample stream out.

**Measured outcome (v5e, B=1024, device-level — N generations scanned
inside one dispatch): the XLA lax paths win and remain the default.**
err-VAE 680 µs/gen lax vs 1041 fused; CRVAE rollout 1198 vs 2365.  The
kernels' sequential per-head 2D dots pay Mosaic issue overhead on more,
smaller ops than XLA's batched per-step einsums at full batch — same
lesson as the train-step megakernel (``pallas_step.py``).  What the
investigation actually found: per-call RELAY dispatch on this runtime is
~3.2 ms, so any per-call serving benchmark is dispatch-bound regardless
of kernel quality (bench.py's generate workload now scans generations
inside one dispatch to measure the device).  Kept in-tree with parity
tests as documentation of the design point; they would be worth
re-benching on runtimes with higher per-op dispatch cost.

Forward-only (serving/eval; no custom VJP — training never differentiates
through free-running rollouts).  The lax paths in ``models/`` remain the
reference implementations; ``tests/test_pallas_rollout.py`` pins equality.

Layouts mirror ``ops/pallas_step.py``: weights transposed to (in, out) so
the padded minor dim is the wide 3H axis; per-head 2D dots with (1, 3H)
bias rows (both proven against this Mosaic version's broadcast
limitations — see pallas_step.py's notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_connexe_tpu.ops.gru import GRUParams
from vae_connexe_tpu.ops.pallas_gru import _blk, _gru_gates as _gates
from vae_connexe_tpu.utils.layers import Dense

_VMEM_BUDGET = 12 * 1024 * 1024


def _smallest_fitting_bt(b: int, fits, what: str) -> int:
    """Largest batch tile (full batch, else a ×8 divisor — Mosaic sublane
    rule) whose VMEM footprint fits.  Raises instead of silently falling
    back to the full batch the fits() model just rejected (which would
    surface later as an opaque Mosaic scoped-vmem OOM)."""
    for cand in [b] + [v for v in range(b - 1, 0, -1) if b % v == 0 and v % 8 == 0]:
        if fits(cand):
            return cand
    raise ValueError(
        f"{what}: no batch tile of {b} fits the {_VMEM_BUDGET >> 20} MiB "
        f"VMEM budget (smallest candidate already exceeds it) — reduce the "
        f"batch or sequence length, or use the lax path")


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _crvae_fits(bt: int, t_len: int, d: int, p: int, hidden: int) -> bool:
    """VMEM model for one batch tile of the fused CRVAE rollout kernel."""
    three_h = 3 * hidden
    need = (2 * (2 * _blk(t_len, bt, d))                  # noise + out
            + _blk(bt, d) + _blk(bt, hidden)
            + _blk(p, d, three_h) + _blk(p, hidden, three_h)
            + 2 * _blk(p, 1, three_h) + _blk(p, 1, hidden) + _blk(p, 1, 1)
            + (p + 2) * _blk(bt, hidden))                 # head states
    return 4 * need <= _VMEM_BUDGET


def _errvae_fits(bt: int, t_len: int, d: int, hidden: int) -> bool:
    """VMEM model for one batch tile of the fused ErrorVAE rollout kernel."""
    three_h = 3 * hidden
    need = (2 * _blk(t_len, bt, d) + _blk(bt, hidden)
            + _blk(d, three_h) + _blk(hidden, three_h)
            + 2 * _blk(1, three_h) + _blk(hidden, d) + _blk(1, d)
            + 3 * _blk(bt, hidden))
    return 4 * need <= _VMEM_BUDGET


def _any_bt_fits(b: int, fits) -> bool:
    """True iff some batch tile of ``b`` passes ``fits`` (the same candidate
    set ``_smallest_fitting_bt`` searches)."""
    return any(fits(c) for c in
               [b] + [v for v in range(b - 1, 0, -1) if b % v == 0 and v % 8 == 0])


def fused_chain_fits(p: int, hidden: int, rollout_len: int,
                     err_hidden: int, err_d: int, batch: int) -> bool:
    """Whether BOTH fused serving kernels (the ErrorVAE noise rollout and the
    CRVAE free-run) have a VMEM-feasible batch tile at these shapes.

    ``kernel='auto'`` dispatch must consult this: the measured B<=8 fused
    win was taken at the flagship shape (p=20, H=64); at larger shapes
    (e.g. p=128, H=128) the per-head weight block alone exceeds the budget
    and the fused path would raise where the lax path works fine.
    """
    return (_any_bt_fits(batch, lambda bt: _crvae_fits(bt, rollout_len, p, p,
                                                       hidden))
            and _any_bt_fits(batch, lambda bt: _errvae_fits(bt, rollout_len,
                                                            err_d, err_hidden)))


# --------------------------------------------------------------------------
# CRVAE free-run: p heads, shared emitted x feeds every head's next step.
# --------------------------------------------------------------------------

def _crvae_kernel(x0_ref, h0_ref, noise_ref,
                  wi_ref, wh_ref, bi_ref, bh_ref, row_ref, rob_ref,
                  out_ref, *, p, t_len, noise_scale):
    """One batch tile's full rollout.  Blocks: x0 (bt, D), h0 (bt, H),
    noise (T, bt, D), wi (p, D, 3H), wh (p, H, 3H), bi/bh (p, 1, 3H),
    ro_w (p, 1, H), ro_b (p, 1, 1), out (T, bt, D)."""
    x = x0_ref[...]
    hs = tuple(h0_ref[...] for _ in range(p))          # shared h0 per head

    # T is small (the reference's 21); unroll the time loop so x (rebuilt
    # from the heads' outputs each step) stays a plain value.
    for t in range(t_len):
        new = []
        cols = []
        for hh in range(p):
            xp = _dot(x, wi_ref[hh]) + bi_ref[hh]
            hp = _dot(hs[hh], wh_ref[hh]) + bh_ref[hh]
            h_new = _gates(xp, hp, hs[hh])
            new.append(h_new)
            cols.append(jnp.sum(h_new * row_ref[hh], axis=1, keepdims=True)
                        + rob_ref[hh])
        hs = tuple(new)
        x = jnp.concatenate(cols, axis=1) + noise_scale * noise_ref[t]
        out_ref[t] = x


@functools.partial(jax.jit, static_argnames=("noise_scale", "interpret"))
def _crvae_rollout(x0, h0, noise_tm, wi, wh, bi, bh, ro_w, ro_b,
                   noise_scale: float, interpret: bool = False):
    """x0 (B, D), h0 (B, H) shared across heads, noise_tm (T, B, D);
    weights in kernel layout.  Returns samples (T, B, D) time-major."""
    t_len, b, d = noise_tm.shape
    p, _, three_h = wi.shape
    hidden = three_h // 3

    bt = _smallest_fitting_bt(
        b, lambda bt: _crvae_fits(bt, t_len, d, p, hidden), "crvae rollout")

    kernel = functools.partial(_crvae_kernel, p=p, t_len=t_len,
                               noise_scale=float(noise_scale))
    grid = (b // bt,)
    tile = lambda *s: pl.BlockSpec(s, lambda j: (0,) * len(s),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hidden), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, bt, d), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            tile(p, d, three_h), tile(p, hidden, three_h),
            tile(p, 1, three_h), tile(p, 1, three_h),
            tile(p, 1, hidden), tile(p, 1, 1),
        ],
        out_specs=pl.BlockSpec((t_len, bt, d), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b, d), jnp.float32),
        interpret=interpret,
    )(x0, h0, noise_tm, wi, wh, bi, bh, ro_w, ro_b)


def crvae_free_run_fused(heads: GRUParams, readout: Dense, x0: jax.Array,
                         h0_shared: jax.Array, noise: jax.Array,
                         noise_scale: float, interpret: bool = False):
    """Fused equivalent of ``CRVAE._free_run``.

    heads: stacked (already masked) GRUParams; readout: stacked Dense
    (p, 1, H)/(p, 1); x0 (B, D); h0_shared (B, H) — the one random/latent
    state every head starts from; noise (B, T, D).  Returns (B, T, D).
    """
    noise_tm = jnp.swapaxes(noise, 0, 1)
    out_tm = _crvae_rollout(
        x0, h0_shared, noise_tm,
        jnp.transpose(heads.w_ih, (0, 2, 1)),
        jnp.transpose(heads.w_hh, (0, 2, 1)),
        heads.b_ih[:, None, :], heads.b_hh[:, None, :],
        readout.w, readout.b[:, :, None],
        noise_scale=noise_scale, interpret=interpret)
    return jnp.swapaxes(out_tm, 0, 1)


# --------------------------------------------------------------------------
# ErrorVAE free-run: one GRU cell + readout, emitted x feeds the next step.
# --------------------------------------------------------------------------

def _errvae_kernel(h0_ref, wi_ref, wh_ref, bi_ref, bh_ref, row_ref, rob_ref,
                   out_ref, *, t_len, d):
    h = h0_ref[...]
    x = jnp.zeros((h.shape[0], d), jnp.float32)
    for t in range(t_len):
        xp = _dot(x, wi_ref[...]) + bi_ref[...]
        hp = _dot(h, wh_ref[...]) + bh_ref[...]
        h = _gates(xp, hp, h)
        x = _dot(h, row_ref[...]) + rob_ref[...]
        out_ref[t] = x


@functools.partial(jax.jit, static_argnames=("d", "t_len", "interpret"))
def _errvae_rollout(h0, wi, wh, bi, bh, ro_w, ro_b, d: int, t_len: int = 0,
                    interpret: bool = False):
    b, hidden = h0.shape
    three_h = wh.shape[1]

    bt = _smallest_fitting_bt(
        b, lambda bt: _errvae_fits(bt, t_len, d, hidden), "errvae rollout")

    kernel = functools.partial(_errvae_kernel, t_len=t_len, d=d)
    tile = lambda *s: pl.BlockSpec(s, lambda j: (0,) * len(s),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, hidden), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            tile(d, three_h), tile(hidden, three_h),
            tile(1, three_h), tile(1, three_h),
            tile(hidden, d), tile(1, d),
        ],
        out_specs=pl.BlockSpec((t_len, bt, d), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, b, d), jnp.float32),
        interpret=interpret,
    )(h0, wi, wh, bi, bh, ro_w, ro_b)


def errvae_sample_fused(dec: GRUParams, out: Dense, h0: jax.Array,
                        d: int, t_len: int, interpret: bool = False):
    """Fused equivalent of ``ErrorVAE.sample``'s scan (from x₀ = 0, roll
    t_len steps).  h0 (B, H).  Returns (B, t_len, D) — the caller prepends
    the reference's leading zero step."""
    out_tm = _errvae_rollout(
        h0, jnp.transpose(dec.w_ih), jnp.transpose(dec.w_hh),
        dec.b_ih[None, :], dec.b_hh[None, :],
        jnp.transpose(out.w), out.b[None, :],
        d=d, t_len=t_len, interpret=interpret)
    return jnp.swapaxes(out_tm, 0, 1)
