"""Fully-fused CRVAE phase-1 training step — one Pallas megakernel.

One kernel invocation = the ENTIRE reference training iteration
(``/root/reference/author_CRVAE.py:498-515``): encoder GRU forward,
reparameterization, all p decoder-head GRUs, readouts, loss, the full
hand-derived backward, the manual-SGD update, the parents-mask projection
and the group-lasso proximal shrink (``author_CRVAE.py:311-317``) — with
every parameter, gradient accumulator and saved activation resident in
VMEM.

Why: the XLA phase-1 step is HBM-bound (RESULTS.md roofline — ≥118 MB/step
vs ~5 GFLOP/step at the p=20 flagship).  Fusing the whole step reduces the
per-step HBM traffic to the batch tile stream + one params read + one
params write (~5 MB), past the bandwidth roofline the multi-op step cannot
cross.  The grid is 1-D over batch tiles (sequentially iterated on TPU):
each program runs forward+backward for its tile and accumulates gradients
and loss sums in VMEM/SMEM scratch; the LAST tile applies SGD + mask +
prox and writes the updated parameters and metrics.

Semantics are pinned against the XLA step (``train/crvae_trainer.py``) by
``tests/test_fused_step.py`` — same loss, same updated params, same
metrics, to f32 tolerance.  KL latent regularizer only (the CS-divergence
hybrid keeps the XLA path).

Weight layouts inside the kernel are transposed to (in, out) so the padded
last dimension is the wide 3H/H axis instead of the narrow D axis
(a (p, 3H, D=20) block pads 20 → 128 lanes, 6.4× waste; (p, D, 3H) pads
192 → 256, 1.33×).  The thin wrapper transposes on entry/exit — a few
hundred KB of XLA work per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_connexe_tpu.models.crvae import CRVAEParams
from vae_connexe_tpu.ops.gru import GRUParams
from vae_connexe_tpu.ops.pallas_gru import _blk
from vae_connexe_tpu.utils.layers import Dense

_VMEM_BUDGET = 14 * 1024 * 1024


def _pick_bt(b: int, p: int, t_dec: int, e: int, t: int, d: int, h: int) -> int:
    """Largest batch tile (x8 or full batch) whose VMEM footprint fits."""
    three_h = 3 * h

    def fits(bt: int) -> bool:
        params = 2 * (_blk(p, d, three_h) + _blk(p, h, three_h)
                      + 2 * _blk(p, 1, three_h) + _blk(p, 1, h) + _blk(p, 1, 1)
                      + _blk(d, three_h) + _blk(h, three_h) + 2 * _blk(1, three_h)
                      + 2 * (_blk(h, h) + _blk(1, h)))       # in + out blocks
        grads = params // 2                                   # scratch accums
        saves = (_blk(p, t_dec + 1, bt, h) + _blk(e, bt, h))
        stream = 2 * (_blk(t, bt, d) + _blk(bt, h))           # x + eps
        misc = _blk(p, d, 1) + 4 * _blk(bt, h) + _blk(1, 128)
        return 4 * (params + grads + saves + stream + misc) <= _VMEM_BUDGET

    for bt in [b] + [v for v in range(b - 1, 0, -1) if b % v == 0 and v % 8 == 0]:
        if fits(bt):
            return bt
    raise ValueError(
        f"megakernel: no batch tile of {b} fits the {_VMEM_BUDGET >> 20} MiB "
        f"VMEM budget at p={p}, t_dec={t_dec}, h={h} — the resident "
        f"params/saves alone exceed it; use the XLA step at this shape")


def _gates_fwd(xp, hp, h):
    """Forward gate math; returns (h_new, r, z, n) for reuse in backward."""
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h, r, z, n


def _gru_bwd_step(dh, h_prev, xp, w_hh_t, b_hh):
    """One GRU cell backward from (dh, h_prev, xp).  Rematerializes the
    gates, returns (dh_prev, ghid, gx): grads w.r.t. the hidden projection,
    the input projection, and the previous hidden state.  Layout: w_hh_t is
    (H, 3H) so dh_prev = dh·z + ghid @ w_hh_tᵀ."""
    hp = jax.lax.dot_general(h_prev, w_hh_t, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b_hh
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    dz = dh * (h_prev - n) * z * (1.0 - z)
    da = dh * (1.0 - z) * (1.0 - n * n)
    dbr = da * hn * r * (1.0 - r)
    ghid = jnp.concatenate([dbr, dz, da * r], axis=-1)
    gx = jnp.concatenate([dbr, dz, da], axis=-1)
    dh_prev = dh * z + jax.lax.dot_general(
        ghid, w_hh_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dh_prev, ghid, gx


def _dot(a, b):
    """(M, K) @ (K, N) in f32."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _outer_acc(a, b):
    """aᵀ @ b: (B, M), (B, N) -> (M, N) — gradient outer-product accumulate."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _step_kernel(
        # inputs
        x_ref, eps_ref, mask_ref,
        ewi_ref, ewh_ref, ebi_ref, ebh_ref,
        muw_ref, mub_ref, lvw_ref, lvb_ref,
        hwi_ref, hwh_ref, hbi_ref, hbh_ref,
        row_ref, rob_ref,
        # outputs (written on the last batch tile)
        o_ewi, o_ewh, o_ebi, o_ebh, o_muw, o_mub, o_lvw, o_lvb,
        o_hwi, o_hwh, o_hbi, o_hbh, o_row, o_rob, o_metrics,
        # scratch
        henc_s, hdec_s,
        g_ewi, g_ewh, g_ebi, g_ebh, g_muw, g_mub, g_lvw, g_lvb,
        g_hwi, g_hwh, g_hbi, g_hbh, g_row, g_rob,
        acc_s,
        *, p, e, t_dec, n_bt, b_total, hidden,
        lr, lam, lam_ridge, beta):
    """One batch tile: forward, backward, gradient accumulation; the last
    tile applies SGD + mask projection + column-group prox and writes the
    updated parameters + metrics.  See module docstring for layouts."""
    j = pl.program_id(0)
    three_h = 3 * hidden

    @pl.when(j == 0)
    def _():
        for ref in (g_ewi, g_ewh, g_ebi, g_ebh, g_muw, g_mub, g_lvw, g_lvb,
                    g_hwi, g_hwh, g_hbi, g_hbh, g_row, g_rob):
            ref[...] = jnp.zeros_like(ref)
        acc_s[0] = jnp.float32(0.0)
        acc_s[1] = jnp.float32(0.0)

    # ---------------- forward ----------------
    bt = eps_ref.shape[0]

    # Encoder GRU over the first e steps (h0 = 0), saving h_prev per step.
    def enc_step(t, h):
        henc_s[t] = h
        xp = _dot(x_ref[t], ewi_ref[...]) + ebi_ref[...]
        hp = _dot(h, ewh_ref[...]) + ebh_ref[...]
        h_new, _, _, _ = _gates_fwd(xp, hp, h)
        return h_new

    h_e = jax.lax.fori_loop(0, e, enc_step, jnp.zeros((bt, hidden), jnp.float32))

    mu = _dot(h_e, muw_ref[...]) + mub_ref[...]
    lv = _dot(h_e, lvw_ref[...]) + lvb_ref[...]
    z = mu + jnp.exp(0.5 * lv) * eps_ref[...]

    # KL partial sum for this tile (mean over the FULL batch taken at the
    # end): -0.5 Σ_b Σ_H (1 + lv - mu² - e^lv).
    kl_tile = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))

    # Decoder heads: h0 = z for every head; teacher-forced input
    # [0, x_e .. x_{T-2}] (author_CRVAE.py:122).  Step 0 is peeled (its
    # input is the zero step, so xp = b_ih).
    for hh in range(p):
        hdec_s[hh, 0] = z

    # Step 0's decoder input is the zero step; computing xp through the
    # normal (bt, D) @ (D, 3H) dot on an explicit zero input keeps every
    # vector at full (bt, ·) layout — Mosaic rejects broadcasting the
    # narrow (1, H) pieces a bias-only xp would produce after the split.
    x_zero = x_ref[0] * 0.0

    def first_dec(hh, h):
        xp = _dot(x_zero, hwi_ref[hh]) + hbi_ref[hh]
        hp = _dot(h, hwh_ref[hh]) + hbh_ref[hh]
        h_new, _, _, _ = _gates_fwd(xp, hp, h)
        hdec_s[hh, 1] = h_new
        return h_new

    hs = tuple(first_dec(hh, z) for hh in range(p))

    def dec_step(t, hs):
        x_t = x_ref[e + t - 1]
        new = []
        for hh in range(p):
            xp = _dot(x_t, hwi_ref[hh]) + hbi_ref[hh]
            hp = _dot(hs[hh], hwh_ref[hh]) + hbh_ref[hh]
            h_new, _, _, _ = _gates_fwd(xp, hp, hs[hh])
            hdec_s[hh, t + 1] = h_new
            new.append(h_new)
        return tuple(new)

    if t_dec > 1:
        hs = jax.lax.fori_loop(1, t_dec, dec_step, hs)

    # Reconstruction partial sum: Σ_i Σ_{b,t} (pred - target)²; the per-var
    # mean over (B, T_dec) and the Σ over vars are applied at the end.
    def recon_step(t, acc):
        x_t = x_ref[e + t]
        s = acc
        for hh in range(p):
            # pred_i = <h, ro_w_i> + b_i as a VPU reduction (keeps 2-D).
            pred = jnp.sum(hdec_s[hh, t + 1] * row_ref[hh], axis=1,
                           keepdims=True) + rob_ref[hh]             # (bt, 1)
            err = pred - x_t[:, hh:hh + 1]
            s = s + jnp.sum(err * err)
        return s

    sq_tile = jax.lax.fori_loop(0, t_dec, recon_step, jnp.float32(0.0))

    acc_s[0] += sq_tile
    acc_s[1] += kl_tile

    # ---------------- backward ----------------
    c_pred = 2.0 / (b_total * t_dec)

    def dec_bwd(i, dhs):
        t = t_dec - 1 - i                      # t_dec-1 .. 1 (t = 0 peeled)
        x_t = x_ref[e + t]
        x_in = x_ref[e + t - 1]
        new = []
        for hh in range(p):
            h_new = hdec_s[hh, t + 1]
            h_prev = hdec_s[hh, t]
            pred = jnp.sum(h_new * row_ref[hh], axis=1,
                           keepdims=True) + rob_ref[hh]
            dpred = c_pred * (pred - x_t[:, hh:hh + 1])         # (bt, 1)
            g_row[hh] += jnp.sum(dpred * h_new, axis=0, keepdims=True)
            g_rob[hh] += jnp.sum(dpred, axis=0, keepdims=True)
            dh = dhs[hh] + dpred * row_ref[hh]
            xp = _dot(x_in, hwi_ref[hh]) + hbi_ref[hh]
            dh_prev, ghid, gx = _gru_bwd_step(dh, h_prev, xp,
                                              hwh_ref[hh], hbh_ref[hh])
            g_hwh[hh] += _outer_acc(h_prev, ghid)
            g_hbh[hh] += jnp.sum(ghid, axis=0, keepdims=True)
            g_hwi[hh] += _outer_acc(x_in, gx)
            g_hbi[hh] += jnp.sum(gx, axis=0, keepdims=True)
            new.append(dh_prev)
        return tuple(new)

    dhs = tuple(jnp.zeros((bt, hidden), jnp.float32) for _ in range(p))
    if t_dec > 1:
        dhs = jax.lax.fori_loop(0, t_dec - 1, dec_bwd, dhs)

    # Peeled t = 0: decoder input is the zero step — d_w_ih contribution
    # vanishes; d_b_ih and the hidden-path grads remain.
    dz = jnp.zeros((bt, hidden), jnp.float32)
    x_0 = x_ref[e]
    for hh in range(p):
        h_new = hdec_s[hh, 1]
        h_prev = hdec_s[hh, 0]
        pred = jnp.sum(h_new * row_ref[hh], axis=1,
                       keepdims=True) + rob_ref[hh]
        dpred = c_pred * (pred - x_0[:, hh:hh + 1])
        g_row[hh] += jnp.sum(dpred * h_new, axis=0, keepdims=True)
        g_rob[hh] += jnp.sum(dpred, axis=0, keepdims=True)
        dh = dhs[hh] + dpred * row_ref[hh]
        xp0 = _dot(x_zero, hwi_ref[hh]) + hbi_ref[hh]
        dh_prev, ghid, gx = _gru_bwd_step(dh, h_prev, xp0,
                                          hwh_ref[hh], hbh_ref[hh])
        g_hwh[hh] += _outer_acc(h_prev, ghid)
        g_hbh[hh] += jnp.sum(ghid, axis=0, keepdims=True)
        g_hbi[hh] += jnp.sum(gx, axis=0, keepdims=True)
        dz = dz + dh_prev

    # Latent: z = mu + e^{lv/2}·eps; KL adds beta·(mu, (e^lv - 1)/2)/B.
    dmu = dz + (beta / b_total) * mu
    dlv = 0.5 * dz * (z - mu) + (beta / (2.0 * b_total)) * (jnp.exp(lv) - 1.0)

    g_muw[...] += _outer_acc(h_e, dmu)
    g_mub[...] += jnp.sum(dmu, axis=0, keepdims=True)
    g_lvw[...] += _outer_acc(h_e, dlv)
    g_lvb[...] += jnp.sum(dlv, axis=0, keepdims=True)
    dh_enc = (jax.lax.dot_general(dmu, muw_ref[...], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(dlv, lvw_ref[...], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32))

    def enc_bwd(i, dh):
        t = e - 1 - i
        h_prev = henc_s[t]
        xp = _dot(x_ref[t], ewi_ref[...]) + ebi_ref[...]
        dh_prev, ghid, gx = _gru_bwd_step(dh, h_prev, xp,
                                          ewh_ref[...], ebh_ref[...])
        g_ewh[...] += _outer_acc(h_prev, ghid)
        g_ebh[...] += jnp.sum(ghid, axis=0, keepdims=True)
        g_ewi[...] += _outer_acc(x_ref[t], gx)
        g_ebi[...] += jnp.sum(gx, axis=0, keepdims=True)
        return dh_prev

    jax.lax.fori_loop(0, e, enc_bwd, dh_enc)

    # ---------------- update + metrics (last tile) ----------------
    @pl.when(j == n_bt - 1)
    def _():
        recon = acc_s[0] / (b_total * t_dec)
        kl = acc_s[1] / b_total
        ridge = lam_ridge * (jnp.sum(row_ref[...] ** 2)
                             + jnp.sum(hwh_ref[...] ** 2))
        loss = recon + ridge + beta * kl
        mean_loss = (recon + ridge) / p

        # SGD on every leaf; ridge adds 2λ·w to readout.w and heads.w_hh
        # (ridge_value differentiated — author_CRVAE.py:324-328).
        o_ewi[...] = ewi_ref[...] - lr * g_ewi[...]
        o_ewh[...] = ewh_ref[...] - lr * g_ewh[...]
        o_ebi[...] = ebi_ref[...] - lr * g_ebi[...]
        o_ebh[...] = ebh_ref[...] - lr * g_ebh[...]
        o_muw[...] = muw_ref[...] - lr * g_muw[...]
        o_mub[...] = mub_ref[...] - lr * g_mub[...]
        o_lvw[...] = lvw_ref[...] - lr * g_lvw[...]
        o_lvb[...] = lvb_ref[...] - lr * g_lvb[...]
        o_hwh[...] = hwh_ref[...] - lr * (g_hwh[...]
                                          + 2.0 * lam_ridge * hwh_ref[...])
        o_hbi[...] = hbi_ref[...] - lr * g_hbi[...]
        o_hbh[...] = hbh_ref[...] - lr * g_hbh[...]
        o_row[...] = row_ref[...] - lr * (g_row[...]
                                          + 2.0 * lam_ridge * row_ref[...])
        o_rob[...] = rob_ref[...] - lr * g_rob[...]

        # heads w_ih: SGD step, parents-mask projection, column-group
        # soft-threshold (train/crvae_trainer.py::_project_and_prox; in the
        # (D, 3H) layout a reference "column" group is a D-row).
        usage_cnt = jnp.float32(0.0)
        for hh in range(p):
            w = (hwi_ref[hh] - lr * g_hwi[hh]) * mask_ref[hh]    # (D, 3H)
            norm = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
            thr = lam * lr
            denom = jnp.maximum(norm, jnp.maximum(thr, 1e-30))
            w = w * (jnp.maximum(norm - thr, 0.0) / denom)
            o_hwi[hh] = w
            new_norm2 = jnp.sum(w * w, axis=1, keepdims=True)
            usage_cnt += jnp.sum((new_norm2 > 0.0).astype(jnp.float32))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        met = jnp.where(lane == 0, loss, 0.0)
        met = jnp.where(lane == 1, recon, met)
        met = jnp.where(lane == 2, beta * kl, met)
        met = jnp.where(lane == 3, mean_loss, met)
        met = jnp.where(lane == 4, usage_cnt / (p * mask_ref.shape[1]), met)
        o_metrics[...] = met


def fused_phase1_step(model, cfg, params: CRVAEParams, parents: jax.Array,
                      batch: jax.Array, eps: jax.Array,
                      interpret: bool = False):
    """Run one fused phase-1 step.  batch: (B, T, p); eps: (B, H) standard
    normals (the reparameterization draw).  Returns (new CRVAEParams,
    metrics dict) matching the XLA step in ``make_phase1_step`` (KL latent
    regularizer; loss measured at the incoming params)."""
    b, t, d = batch.shape
    p, hidden = model.p, model.hidden
    e = model.enc_len
    t_dec = t - e
    three_h = 3 * hidden
    bt = _pick_bt(b, p, t_dec, e, t, d, hidden)
    if b % bt:
        raise ValueError(f"batch {b} not tileable (bt={bt})")
    n_bt = b // bt

    x_tm = jnp.swapaxes(batch, 0, 1)                   # (T, B, D)
    # parents[i, j] = "j is a parent of i" masks head i's input column j:
    # kernel layout (p, D, 1) with rows = input series.
    mask_k = parents[:, :, None].astype(jnp.float32)   # (p, D, 1)

    # Transposed (in, out) kernel layouts.
    ins = [
        x_tm, eps, mask_k,
        jnp.transpose(params.enc.w_ih), jnp.transpose(params.enc.w_hh),
        params.enc.b_ih[None, :], params.enc.b_hh[None, :],
        jnp.transpose(params.fc_mu.w), params.fc_mu.b[None, :],
        jnp.transpose(params.fc_std.w), params.fc_std.b[None, :],
        jnp.transpose(params.heads.w_ih * parents[:, None, :], (0, 2, 1)),
        jnp.transpose(params.heads.w_hh, (0, 2, 1)),
        params.heads.b_ih[:, None, :], params.heads.b_hh[:, None, :],
        params.readout.w,                              # already (p, 1, H)
        params.readout.b[:, :, None],                  # (p, 1, 1)
    ]

    const = lambda *shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),  # noqa: E731
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((t, bt, d), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, hidden), lambda j: (j, 0), memory_space=pltpu.VMEM),
        const(p, d, 1),
        const(d, three_h), const(hidden, three_h),
        const(1, three_h), const(1, three_h),
        const(hidden, hidden), const(1, hidden),
        const(hidden, hidden), const(1, hidden),
        const(p, d, three_h), const(p, hidden, three_h),
        const(p, 1, three_h), const(p, 1, three_h),
        const(p, 1, hidden), const(p, 1, 1),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(s, jnp.float32) for s in [
            (d, three_h), (hidden, three_h), (1, three_h), (1, three_h),
            (hidden, hidden), (1, hidden), (hidden, hidden), (1, hidden),
            (p, d, three_h), (p, hidden, three_h), (p, 1, three_h),
            (p, 1, three_h), (p, 1, hidden), (p, 1, 1), (1, 128),
        ]
    ]
    out_specs = [const(*s.shape) for s in out_shapes]

    kernel = functools.partial(
        _step_kernel, p=p, e=e, t_dec=t_dec, n_bt=n_bt, b_total=b,
        hidden=hidden, lr=float(cfg.lr), lam=float(cfg.lam),
        lam_ridge=float(cfg.lam_ridge), beta=float(cfg.beta))

    outs = pl.pallas_call(
        kernel,
        grid=(n_bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((e, bt, hidden), jnp.float32),
            pltpu.VMEM((p, t_dec + 1, bt, hidden), jnp.float32),
            pltpu.VMEM((d, three_h), jnp.float32),
            pltpu.VMEM((hidden, three_h), jnp.float32),
            pltpu.VMEM((1, three_h), jnp.float32),
            pltpu.VMEM((1, three_h), jnp.float32),
            pltpu.VMEM((hidden, hidden), jnp.float32),
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((hidden, hidden), jnp.float32),
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((p, d, three_h), jnp.float32),
            pltpu.VMEM((p, hidden, three_h), jnp.float32),
            pltpu.VMEM((p, 1, three_h), jnp.float32),
            pltpu.VMEM((p, 1, three_h), jnp.float32),
            pltpu.VMEM((p, 1, hidden), jnp.float32),
            pltpu.VMEM((p, 1, 1), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)

    (n_ewi, n_ewh, n_ebi, n_ebh, n_muw, n_mub, n_lvw, n_lvb,
     n_hwi, n_hwh, n_hbi, n_hbh, n_row, n_rob, metrics_v) = outs

    new_params = CRVAEParams(
        enc=GRUParams(w_ih=jnp.transpose(n_ewi), w_hh=jnp.transpose(n_ewh),
                      b_ih=n_ebi[0], b_hh=n_ebh[0]),
        fc_mu=Dense(w=jnp.transpose(n_muw), b=n_mub[0]),
        fc_std=Dense(w=jnp.transpose(n_lvw), b=n_lvb[0]),
        heads=GRUParams(w_ih=jnp.transpose(n_hwi, (0, 2, 1)),
                        w_hh=jnp.transpose(n_hwh, (0, 2, 1)),
                        b_ih=n_hbi[:, 0, :], b_hh=n_hbh[:, 0, :]),
        readout=Dense(w=n_row, b=n_rob[:, 0, :]),
    )
    metrics = {
        "loss": metrics_v[0, 0], "recon": metrics_v[0, 1],
        "latent_reg": metrics_v[0, 2], "mean_loss": metrics_v[0, 3],
        "variable_usage": metrics_v[0, 4],
    }
    return new_params, metrics
