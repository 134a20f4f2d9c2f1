"""Fused Swin window attention — Pallas TPU kernel.

Replaces the HBM-roundtripping jnp path (models/swin.py
``reference_window_attention``) and the reference stack's cuDNN/torch SDPA
(Swin inside MaskDINO, reference train_original.py:29). The (nW, 49, 49)
attention matrix never touches HBM.

TPU-first formulation: Swin windows are tiny (N=49, hd=32) — far below the
128x128 MXU tile — so per-window batched matmuls waste most of the systolic
array. This kernel packs TWO windows of the same head into one 128-row tile
(N padded 49->64, 2x64=128) and runs QK^T / PV as single dense 128-wide
MXU passes; the cross-window quadrants of the score matrix are masked to
-inf before the fused fp32 softmax. Relative-position bias (per head) and
the shifted-window mask (per window position) are added inside the kernel
from small side inputs — the full (nWt, nH, N, N) bias tensor of the jnp
path is never materialized.

Contract (wrapped by models/swin.py):
    fused_window_attention(q, k, v, bias, scale) -> out
with q/k/v (nWt, nH, N, hd) and additive bias (nWt, nH, N, N) — the same
signature as the jnp reference. A second entry point
``fused_window_attention_split`` takes the un-broadcast components
(rel_bias (nH,N,N), shift_mask (nW,N,N)|None) and is what the backbone
actually calls for zero bias materialization.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_pair_kernel(q_ref, k_ref, v_ref, rel_ref, msk_ref, out_ref, *,
                      n_tok: int, scale: float, pairs: int):
    """One grid step: ``pairs`` x (2 windows) x 1 head.

    q/k/v_ref: (2*pairs, 1, Np, hd); rel_ref: (1, 1, Np, Np) fp32;
    msk_ref: (2*pairs, 1, Np, Np) fp32 additive; out_ref like q_ref.
    Packing several pairs per step amortizes the grid-step overhead that
    dominates at these tiny shapes (2 MFLOP of matmul per pair).
    """
    np_ = q_ref.shape[2]
    hd = q_ref.shape[3]

    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * np_, 2 * np_), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * np_, 2 * np_), 1)
    same_window = (rows // np_) == (cols // np_)
    valid_col = (cols % np_) < n_tok

    rel = rel_ref[0, 0]                                   # (Np, Np)
    rel2 = jnp.concatenate([jnp.concatenate([rel, rel], 1)] * 2, 0)

    for p_i in range(pairs):                              # static unroll
        q = q_ref[2 * p_i:2 * p_i + 2].reshape(
            2 * np_, hd).astype(jnp.float32) * scale
        k = k_ref[2 * p_i:2 * p_i + 2].reshape(2 * np_, hd).astype(jnp.float32)
        v = v_ref[2 * p_i:2 * p_i + 2].reshape(2 * np_, hd)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

        m0 = msk_ref[2 * p_i, 0]
        m1 = msk_ref[2 * p_i + 1, 0]
        msk2 = jnp.concatenate(
            [jnp.concatenate([m0, m0], 1), jnp.concatenate([m1, m1], 1)], 0)

        s = s + jnp.where(same_window & valid_col, rel2 + msk2, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[2 * p_i:2 * p_i + 2] = o.astype(out_ref.dtype).reshape(
            2, 1, np_, hd)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_pair_kernel_geo(q_ref, k_ref, v_ref, rel_ref, out_ref, *,
                          n_tok: int, scale: float, pairs: int,
                          steps_per_img: int, ww: int, hp: int, wp: int,
                          ws: int, shift: int):
    """Like ``_attn_pair_kernel`` but the shifted-window region mask is
    computed in-kernel from window geometry instead of DMA'd — the (nW, N,
    N) fp32 mask re-read per grid step dominated the kernel's HBM traffic
    (1 MB/step vs 192 KB of q/k/v at pairs=8).

    Labels replicate models/swin.py ``_shift_attn_mask``: region id
    3*ry+rx with ry/rx from the slices [0, Hp-ws), [Hp-ws, Hp-shift),
    [Hp-shift, Hp) evaluated at rolled token coordinates.
    """
    np_ = q_ref.shape[2]
    hd = q_ref.shape[3]

    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * np_, 2 * np_), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * np_, 2 * np_), 1)
    same_window = (rows // np_) == (cols // np_)
    valid_col = (cols % np_) < n_tok

    rel = rel_ref[0, 0]                                   # (Np, Np)
    rel2 = jnp.concatenate([jnp.concatenate([rel, rel], 1)] * 2, 0)

    step = pl.program_id(0) % steps_per_img
    widx_base = step * (2 * pairs)

    def pair_label(w0):
        """(2*Np, 1) int32 region label per packed row for windows w0, w0+1."""
        r = jax.lax.broadcasted_iota(jnp.int32, (2 * np_, 1), 0)
        slot = r // np_
        t = r % np_
        w = w0 + slot
        wi = w // ww
        wj = w % ww
        gy = wi * ws + t // ws
        gx = wj * ws + t % ws
        ry = ((gy >= hp - ws).astype(jnp.int32)
              + (gy >= hp - shift).astype(jnp.int32))
        rx = ((gx >= wp - ws).astype(jnp.int32)
              + (gx >= wp - shift).astype(jnp.int32))
        return 3 * ry + rx

    for p_i in range(pairs):                              # static unroll
        q = q_ref[2 * p_i:2 * p_i + 2].reshape(
            2 * np_, hd).astype(jnp.float32) * scale
        k = k_ref[2 * p_i:2 * p_i + 2].reshape(2 * np_, hd).astype(jnp.float32)
        v = v_ref[2 * p_i:2 * p_i + 2].reshape(2 * np_, hd)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

        keep = same_window & valid_col
        if shift > 0:
            lab = pair_label(widx_base + 2 * p_i)         # (2Np, 1)
            keep = keep & (lab == lab.reshape(1, 2 * np_))
        s = s + jnp.where(keep, rel2, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[2 * p_i:2 * p_i + 2] = o.astype(out_ref.dtype).reshape(
            2, 1, np_, hd)


def _fused_window_attention_impl(q, k, v, rel_bias, shift_mask, *,
                                 scale: float, interpret: bool = False,
                                 max_pairs: int = 8):
    """q/k/v (B, nW, nH, N, hd); rel_bias (nH, N, N);
    shift_mask (nW, N, N) fp32. Returns (B, nW, nH, N, hd)."""
    b, nw, nh, n, hd = q.shape
    np_ = _round_up(n, 64)          # pack 2 windows into a 128-row tile
    pairs = max(1, min(max_pairs, _round_up(nw, 2) // 2))
    nw2 = _round_up(nw, 2 * pairs)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, nw2 - nw), (0, 0), (0, np_ - n),
                           (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    relp = jnp.pad(rel_bias.astype(jnp.float32),
                   ((0, 0), (0, np_ - n), (0, np_ - n)))
    mskp = jnp.pad(shift_mask.astype(jnp.float32),
                   ((0, nw2 - nw), (0, np_ - n), (0, np_ - n)))

    # flatten batch into the window axis: (B*nW2, nH, Np, hd)
    qp = qp.reshape(b * nw2, nh, np_, hd)
    kp = kp.reshape(b * nw2, nh, np_, hd)
    vp = vp.reshape(b * nw2, nh, np_, hd)

    steps_per_img = nw2 // (2 * pairs)
    grid = (b * steps_per_img, nh)

    qkv_spec = pl.BlockSpec((2 * pairs, 1, np_, hd),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    rel_spec = pl.BlockSpec((1, 1, np_, np_), lambda i, j: (j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    msk_spec = pl.BlockSpec(
        (2 * pairs, 1, np_, np_),
        lambda i, j: (i % steps_per_img, 0, 0, 0),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_pair_kernel, n_tok=n, scale=scale,
                          pairs=pairs),
        out_shape=jax.ShapeDtypeStruct((b * nw2, nh, np_, hd), q.dtype),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, rel_spec, msk_spec],
        out_specs=pl.BlockSpec((2 * pairs, 1, np_, hd),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nw2 * nh * np_ * np_ * hd * 2,
            bytes_accessed=3 * b * nw2 * nh * np_ * hd * q.dtype.itemsize,
            transcendentals=b * nw2 * nh * np_ * np_),
    )(qp, kp, vp, relp.reshape(nh, 1, np_, np_), mskp[:, None])

    out = out.reshape(b, nw2, nh, np_, hd)[:, :nw, :, :n]
    return out


def _fused_wa_geo_impl(q, k, v, rel_bias, *, scale: float,
                       geometry, interpret: bool = False,
                       max_pairs: int = 8):
    """Geometry-mask variant: q/k/v (B, nW, nH, N, hd); rel_bias (nH, N, N);
    geometry = (Hp, Wp, ws, shift). No mask tensor touches HBM."""
    b, nw, nh, n, hd = q.shape
    hp, wp, ws, shift = geometry
    ww = wp // ws
    np_ = _round_up(n, 64)
    pairs = max(1, min(max_pairs, _round_up(nw, 2) // 2))
    nw2 = _round_up(nw, 2 * pairs)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, nw2 - nw), (0, 0), (0, np_ - n),
                           (0, 0)))

    qp = pad(q).reshape(b * nw2, nh, np_, hd)
    kp = pad(k).reshape(b * nw2, nh, np_, hd)
    vp = pad(v).reshape(b * nw2, nh, np_, hd)
    relp = jnp.pad(rel_bias.astype(jnp.float32),
                   ((0, 0), (0, np_ - n), (0, np_ - n)))

    steps_per_img = nw2 // (2 * pairs)
    grid = (b * steps_per_img, nh)
    qkv_spec = pl.BlockSpec((2 * pairs, 1, np_, hd),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    rel_spec = pl.BlockSpec((1, 1, np_, np_), lambda i, j: (j, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_pair_kernel_geo, n_tok=n, scale=scale,
                          pairs=pairs, steps_per_img=steps_per_img, ww=ww,
                          hp=hp, wp=wp, ws=ws, shift=shift),
        out_shape=jax.ShapeDtypeStruct((b * nw2, nh, np_, hd), q.dtype),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, rel_spec],
        out_specs=pl.BlockSpec((2 * pairs, 1, np_, hd),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nw2 * nh * np_ * np_ * hd * 2,
            bytes_accessed=3 * b * nw2 * nh * np_ * hd * q.dtype.itemsize,
            transcendentals=b * nw2 * nh * np_ * np_),
    )(qp, kp, vp, relp.reshape(nh, 1, np_, np_))

    return out.reshape(b, nw2, nh, np_, hd)[:, :nw, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_wa_geo(q, k, v, rel_bias, scale, geometry, interpret):
    return _fused_wa_geo_impl(q, k, v, rel_bias, scale=scale,
                              geometry=geometry, interpret=interpret)


def _fused_wa_geo_fwd(q, k, v, rel_bias, scale, geometry, interpret):
    out = _fused_wa_geo(q, k, v, rel_bias, scale, geometry, interpret)
    return out, (q, k, v, rel_bias)


def _fused_wa_geo_bwd(scale, geometry, interpret, res, g):
    from vision_instance_seg_tpu.models.swin import _shift_attn_mask

    q, k, v, rel_bias = res
    hp, wp, ws, shift = geometry
    if shift > 0:
        shift_mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
    else:
        shift_mask = jnp.zeros((q.shape[1], q.shape[3], q.shape[3]),
                               jnp.float32)
    dq, dk, dv, drel, _ = _fused_wa_bwd(scale, interpret,
                                        (q, k, v, rel_bias, shift_mask), g)
    return dq, dk, dv, drel


# ---------------------------------------------------------------------------
# custom VJP: Pallas forward, jnp backward (standard attention gradients,
# recomputed from the residuals — no attention matrix is saved from fwd)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_wa(q, k, v, rel_bias, shift_mask, scale, interpret):
    return _fused_window_attention_impl(q, k, v, rel_bias, shift_mask,
                                        scale=scale, interpret=interpret)


def _fused_wa_fwd(q, k, v, rel_bias, shift_mask, scale, interpret):
    out = _fused_wa(q, k, v, rel_bias, shift_mask, scale, interpret)
    return out, (q, k, v, rel_bias, shift_mask)


def _fused_wa_bwd(scale, interpret, res, g):
    q, k, v, rel_bias, shift_mask = res
    # (B, nW, nH, N, hd) f32 math
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bwhqd,bwhkd->bwhqk", qf * scale, kf)
    bias = rel_bias[None, None].astype(jnp.float32) \
        + shift_mask[None, :, None].astype(jnp.float32)
    p = jax.nn.softmax(s + bias, axis=-1)
    dv = jnp.einsum("bwhqk,bwhqd->bwhkd", p, gf)
    dp = jnp.einsum("bwhqd,bwhkd->bwhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bwhqk,bwhkd->bwhqd", ds, kf) * scale
    dk = jnp.einsum("bwhqk,bwhqd->bwhkd", ds, qf) * scale
    drel = ds.sum((0, 1))                       # (nH, N, N)
    dmask = ds.sum((0, 2))                      # (nW, N, N)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            drel.astype(rel_bias.dtype), dmask.astype(shift_mask.dtype))


_fused_wa.defvjp(_fused_wa_fwd, _fused_wa_bwd)
_fused_wa_geo.defvjp(_fused_wa_geo_fwd, _fused_wa_geo_bwd)


def fused_window_attention(q, k, v, rel_bias,
                           shift_mask: Optional[jnp.ndarray],
                           scale: float, num_windows: int,
                           interpret: bool = False,
                           geometry=None):
    """AttnFn entry (models/swin.py contract): q/k/v (nWt, nH, N, hd),
    nWt = B*num_windows; rel_bias (nH, N, N);
    shift_mask (num_windows, N, N) or None. Differentiable (custom VJP:
    Pallas forward, recomputed-attention jnp backward).

    geometry=(Hp, Wp, ws, shift): derive the shifted-window region mask
    in-kernel instead of DMA-ing a materialized (nW, N, N) fp32 tensor
    every grid step (the dominant HBM traffic of the mask path);
    shift_mask is ignored in that case. models/swin.py passes geometry
    automatically (``wants_geometry``).
    """
    nwt, nh, n, hd = q.shape
    b = nwt // num_windows
    shp = (b, num_windows, nh, n, hd)
    if geometry is not None:
        out = _fused_wa_geo(q.reshape(shp), k.reshape(shp), v.reshape(shp),
                            rel_bias, float(scale), tuple(geometry),
                            interpret)
        return out.reshape(nwt, nh, n, hd)
    if shift_mask is None:
        shift_mask = jnp.zeros((num_windows, n, n), jnp.float32)
    out = _fused_wa(q.reshape(shp), k.reshape(shp), v.reshape(shp),
                    rel_bias, shift_mask, float(scale), interpret)
    return out.reshape(nwt, nh, n, hd)


fused_window_attention.wants_geometry = True


# ---------------------------------------------------------------------------
# NHWC fused path: partition + attention + merge in ONE kernel.
#
# The packed kernel above still requires the (B,H,W,C) -> (nWt, N, C) window
# partition/unpartition HBM copies and the 5-D qkv head-split transpose in
# models/swin.py — exactly the "stage-1/2 window partition/merge LAYOUT
# traffic" the docs/PERF.md roofline names as the flagship's open headroom
# item (~0.6 GB touched per stage-1 fusion pair at batch 8). This variant
# removes them: the qkv/proj Denses run directly on the NHWC map (identical
# parameters), and the kernel consumes the raw (B, Hp, Wp, 3C) qkv tensor —
# windows are formed in VMEM from 8-aligned sublane slices, so window
# geometry never touches HBM at all.
#
# Requires ws % 8 == 0 (window column slices ride the 8-row sublane tiling;
# the flagship's WINDOW_SIZE=8 satisfies it, reference-parity ws=7 configs
# keep the jnp path). Two windows of one head are packed per 128-row MXU
# tile as in ``_attn_pair_kernel``; shifted-window region masks are derived
# in-kernel from geometry (input arrives pre-rolled, as in the jnp path).
# ---------------------------------------------------------------------------


def _nhwc_geometry_helpers(ti, *, n: int, ws: int, shift: int, hp: int,
                           wp: int, pad_hw):
    """Shared fwd/bwd in-kernel helpers for one row-of-windows grid step.

    Returns (same_window, need_labels, region_labels, window):
    - same_window: (2N, 2N) bool mask of the diagonal window quadrants
    - region_labels(w0, nrows): (nrows, 1) int32 region id per packed token
      row (windows w0, w0+1): 3*ry+rx shifted-region labels at rolled
      coordinates (models/swin.py ``_shift_attn_mask``) plus 10*pad for
      canvas padding at pre-roll coordinates (pixel_decoder
      ``_window_pad_shift_mask``)
    - window(ref, w0): (N, C') token-major view of window w0 from an NHWC
      row block (1, ws, Wp, C')
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * n, 2 * n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * n, 2 * n), 1)
    same_window = (rows // n) == (cols // n)
    need_labels = shift > 0 or pad_hw is not None

    def region_labels(w0, nrows):
        r = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
        slot = r // n
        t = r % n
        wj = w0 + slot
        gy = ti * ws + t // ws
        gx = wj * ws + t % ws
        lab = jnp.zeros_like(gy)
        if shift > 0:
            ry = ((gy >= hp - ws).astype(jnp.int32)
                  + (gy >= hp - shift).astype(jnp.int32))
            rx = ((gx >= wp - ws).astype(jnp.int32)
                  + (gx >= wp - shift).astype(jnp.int32))
            lab = 3 * ry + rx
        if pad_hw is not None:
            h_r, w_r = pad_hw
            oy = gy + shift
            oy = jnp.where(oy >= hp, oy - hp, oy)   # pre-roll coordinates
            ox = gx + shift
            ox = jnp.where(ox >= wp, ox - wp, ox)
            pad = ((oy >= h_r) | (ox >= w_r)).astype(jnp.int32)
            lab = lab + 10 * pad
        return lab

    def window(ref, w0):
        return ref[0, :, w0 * ws:(w0 + 1) * ws, :].reshape(n, -1)

    return same_window, need_labels, region_labels, window


def _wa_nhwc_kernel(*refs, c: int, nh: int, ws: int, shift: int, hp: int,
                    wp: int, scale: float, split_qkv: bool, pad_hw):
    """One grid step = one row of windows, all heads.

    Inputs (``split_qkv=False``): qkv_ref (1, ws, Wp, 3C) — the backbone's
    fused qkv Dense output; (``split_qkv=True``): q/k/v_ref (1, ws, Wp, C)
    each — the window encoder's separate q/k/v projections. rel_ref
    (nH, N, N) f32 is grid-resident; out_ref (1, ws, Wp, C). N = ws*ws;
    window w covers sublane columns [w*ws, (w+1)*ws) — 8-aligned because
    ws % 8 == 0.

    ``pad_hw=(h, w)`` masks canvas-padding tokens exactly like
    models/pixel_decoder.py ``_window_pad_shift_mask`` (pad labels are
    evaluated at pre-roll coordinates); None reproduces the backbone's
    ``_shift_attn_mask`` semantics (padded tokens attend like real ones).
    """
    if split_qkv:
        q_ref, k_ref, v_ref, rel_ref, out_ref = refs
    else:
        qkv_ref, rel_ref, out_ref = refs
    hd = c // nh
    n = ws * ws
    nww = wp // ws
    same_window, need_labels, region_labels, window = _nhwc_geometry_helpers(
        pl.program_id(1), n=n, ws=ws, shift=shift, hp=hp, wp=wp,
        pad_hw=pad_hw)

    def load(w0, wn):
        """q/k/v of windows [w0, w0+wn) packed into (wn*N, C) each."""
        if split_qkv:
            parts = [(window(q_ref, w0 + i), window(k_ref, w0 + i),
                      window(v_ref, w0 + i)) for i in range(wn)]
        else:
            xs = [window(qkv_ref, w0 + i) for i in range(wn)]
            parts = [(x[:, :c], x[:, c:2 * c], x[:, 2 * c:]) for x in xs]
        if wn == 1:
            return parts[0]
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(3))

    def attend(qw, kw, vw, keep, rel):
        """(nrows, C) q/k/v -> (nrows, C) attention output."""
        outs = []
        for h in range(nh):
            q = qw[:, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
            k = kw[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            v = vw[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + jnp.where(keep, rel[h], NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype))
        return jnp.concatenate(outs, axis=-1)               # (nrows, C)

    # per-head 2x2-tiled bias, hoisted out of the window loop
    rel2 = [None] * nh
    if nww >= 2:
        for h in range(nh):
            r1 = rel_ref[h]                                 # (N, N) f32
            rel2[h] = jnp.concatenate(
                [jnp.concatenate([r1, r1], 1)] * 2, 0)      # (2N, 2N)

    for w0 in range(0, nww - 1, 2):                         # window pairs
        qw, kw, vw = load(w0, 2)
        keep = same_window
        if need_labels:
            lab = region_labels(w0, 2 * n)
            keep = keep & (lab == lab.reshape(1, 2 * n))
        o = attend(qw, kw, vw, keep, rel2)                  # (2N, C)
        out_ref[0, :, w0 * ws:(w0 + 1) * ws, :] = o[:n].reshape(ws, ws, c)
        out_ref[0, :, (w0 + 1) * ws:(w0 + 2) * ws, :] = (
            o[n:].reshape(ws, ws, c))

    if nww % 2:                                             # solo tail window
        w0 = nww - 1
        qw, kw, vw = load(w0, 1)
        keep = jnp.full((n, n), True)
        if need_labels:
            lab = region_labels(w0, n)
            keep = lab == lab.reshape(1, n)
        rel1 = [rel_ref[h] for h in range(nh)]
        o = attend(qw, kw, vw, keep, rel1)                  # (N, C)
        out_ref[0, :, w0 * ws:(w0 + 1) * ws, :] = o.reshape(ws, ws, c)


def _wa_nhwc_impl(operands, rel_bias, *, ws: int, shift: int, scale: float,
                  pad_hw=None, interpret: bool = False):
    """operands: (qkv,) fused or (q, k, v) split, each (B, Hp, Wp, *)."""
    split_qkv = len(operands) == 3
    b, hp, wp, cx = operands[0].shape
    c = cx if split_qkv else cx // 3
    nh = rel_bias.shape[0]
    n = ws * ws
    assert ws % 8 == 0 and hp % ws == 0 and wp % ws == 0, (ws, hp, wp)
    grid = (b, hp // ws)
    imap_in = lambda bi, ti: (bi, ti, 0, 0)
    nww = wp // ws
    dt = operands[0].dtype
    return pl.pallas_call(
        functools.partial(_wa_nhwc_kernel, c=c, nh=nh, ws=ws, shift=shift,
                          hp=hp, wp=wp, scale=scale, split_qkv=split_qkv,
                          pad_hw=pad_hw),
        grid=grid,
        in_specs=[pl.BlockSpec((1, ws, wp, op.shape[-1]), imap_in,
                               memory_space=pltpu.VMEM) for op in operands]
        + [
            # constant index map -> the bias stays VMEM-resident across steps
            pl.BlockSpec((nh, n, n), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, wp, c), imap_in,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=b * (hp // ws) * nww * nh * 4 * n * n * (c // nh),
            bytes_accessed=(sum(op.size * op.dtype.itemsize
                                for op in operands)
                            + b * hp * wp * c * dt.itemsize
                            + rel_bias.size * 4),
            transcendentals=b * hp * wp * n),
        interpret=interpret,
    )(*operands, rel_bias.astype(jnp.float32))


def _wa_nhwc_bwd_kernel(*refs, c: int, nh: int, ws: int, shift: int,
                        hp: int, wp: int, scale: float, split_qkv: bool,
                        pad_hw):
    """Backward of ``_wa_nhwc_kernel``: same grid/pairing, recomputes the
    attention in VMEM (flash-style — nothing saved from forward but the
    inputs) and emits dq/dk/dv plus the bias gradient.

    Inputs: the forward operands plus g_ref (1, ws, Wp, C). Outputs:
    d(operands) with the forward layouts, and drel_ref (nH, N, N) f32
    ACCUMULATED across the sequential grid (constant index map; zeroed on
    the first step). Masked logits get exact-zero ds, so masked bias cells
    receive exactly zero gradient (the jnp reference's -100 additive mask
    leaks ~e^-100 — equal within test tolerance).
    """
    if split_qkv:
        q_ref, k_ref, v_ref, rel_ref, g_ref = refs[:5]
        dq_ref, dk_ref, dv_ref, drel_ref = refs[5:]
    else:
        qkv_ref, rel_ref, g_ref = refs[:3]
        dqkv_ref, drel_ref = refs[3:]
    hd = c // nh
    n = ws * ws
    nww = wp // ws
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when((bi == 0) & (ti == 0))
    def _init():
        drel_ref[...] = jnp.zeros_like(drel_ref)

    same_window, need_labels, region_labels, window = _nhwc_geometry_helpers(
        ti, n=n, ws=ws, shift=shift, hp=hp, wp=wp, pad_hw=pad_hw)

    def load(w0, wn):
        if split_qkv:
            parts = [(window(q_ref, w0 + i), window(k_ref, w0 + i),
                      window(v_ref, w0 + i), window(g_ref, w0 + i))
                     for i in range(wn)]
        else:
            parts = [(x[:, :c], x[:, c:2 * c], x[:, 2 * c:],
                      window(g_ref, w0 + i))
                     for i, x in enumerate(window(qkv_ref, w0 + j)
                                           for j in range(wn))]
        if wn == 1:
            return parts[0]
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(4))

    def grads(qw, kw, vw, gw, keep, rel):
        """(nrows, C) operands/cotangent -> dq, dk, dv (nrows, C) f32 and
        the per-head ds diagonal-quadrant sum for drel."""
        dqs, dks, dvs, dss = [], [], [], []
        for h in range(nh):
            q = qw[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            k = kw[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            v = vw[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            g = gw[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + jnp.where(keep, rel[h], NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            # dv = p^T g; dp = g v^T; ds = p*(dp - rowsum(dp*p))
            dv = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dqs.append(dq * scale)
            dks.append(dk * scale)
            dvs.append(dv)
            dss.append(ds)
        return (jnp.concatenate(dqs, -1), jnp.concatenate(dks, -1),
                jnp.concatenate(dvs, -1), dss)

    def store(dq, dk, dv, w0):
        """Write one window's (N, C) grads back in the forward layouts."""
        sl = slice(w0 * ws, (w0 + 1) * ws)
        if split_qkv:
            dq_ref[0, :, sl, :] = dq.astype(dq_ref.dtype).reshape(ws, ws, c)
            dk_ref[0, :, sl, :] = dk.astype(dk_ref.dtype).reshape(ws, ws, c)
            dv_ref[0, :, sl, :] = dv.astype(dv_ref.dtype).reshape(ws, ws, c)
        else:
            dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
            dqkv_ref[0, :, sl, :] = dqkv.astype(
                dqkv_ref.dtype).reshape(ws, ws, 3 * c)

    rel2 = [None] * nh
    if nww >= 2:
        for h in range(nh):
            r1 = rel_ref[h]
            rel2[h] = jnp.concatenate(
                [jnp.concatenate([r1, r1], 1)] * 2, 0)

    for w0 in range(0, nww - 1, 2):
        qw, kw, vw, gw = load(w0, 2)
        keep = same_window
        if need_labels:
            lab = region_labels(w0, 2 * n)
            keep = keep & (lab == lab.reshape(1, 2 * n))
        dq, dk, dv, dss = grads(qw, kw, vw, gw, keep, rel2)
        store(dq[:n], dk[:n], dv[:n], w0)
        store(dq[n:], dk[n:], dv[n:], w0 + 1)
        for h in range(nh):
            # bias lives once per head: sum the two diagonal quadrants
            drel_ref[h] += dss[h][:n, :n] + dss[h][n:, n:]

    if nww % 2:
        w0 = nww - 1
        qw, kw, vw, gw = load(w0, 1)
        keep = jnp.full((n, n), True)
        if need_labels:
            lab = region_labels(w0, n)
            keep = lab == lab.reshape(1, n)
        rel1 = [rel_ref[h] for h in range(nh)]
        dq, dk, dv, dss = grads(qw, kw, vw, gw, keep, rel1)
        store(dq, dk, dv, w0)
        for h in range(nh):
            drel_ref[h] += dss[h]


def _wa_nhwc_bwd_impl(operands, rel_bias, g, *, ws: int, shift: int,
                      scale: float, pad_hw=None, interpret: bool = False):
    """operands: (qkv,) fused or (q, k, v) split. Returns (d(operands)...,
    drel) with the operand dtypes / f32 bias gradient."""
    split_qkv = len(operands) == 3
    b, hp, wp, cx = operands[0].shape
    c = cx if split_qkv else cx // 3
    nh = rel_bias.shape[0]
    n = ws * ws
    grid = (b, hp // ws)
    imap_in = lambda bi, ti: (bi, ti, 0, 0)
    rel_spec = pl.BlockSpec((nh, n, n), lambda bi, ti: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    op_specs = [pl.BlockSpec((1, ws, wp, op.shape[-1]), imap_in,
                             memory_space=pltpu.VMEM) for op in operands]
    g_spec = pl.BlockSpec((1, ws, wp, c), imap_in, memory_space=pltpu.VMEM)
    nww = wp // ws
    outs = pl.pallas_call(
        functools.partial(_wa_nhwc_bwd_kernel, c=c, nh=nh, ws=ws,
                          shift=shift, hp=hp, wp=wp, scale=scale,
                          split_qkv=split_qkv, pad_hw=pad_hw),
        grid=grid,
        in_specs=op_specs + [rel_spec, g_spec],
        out_specs=[pl.BlockSpec((1, ws, wp, op.shape[-1]), imap_in,
                                memory_space=pltpu.VMEM)
                   for op in operands] + [rel_spec],
        out_shape=[jax.ShapeDtypeStruct(op.shape, op.dtype)
                   for op in operands]
        + [jax.ShapeDtypeStruct((nh, n, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * (hp // ws) * nww * nh * 4 * n * n * (c // nh),
            bytes_accessed=2 * sum(op.size * op.dtype.itemsize
                                   for op in operands)
            + 2 * b * hp * wp * c * operands[0].dtype.itemsize
            + 2 * rel_bias.size * 4,
            transcendentals=b * hp * wp * n),
        interpret=interpret,
    )(*operands, rel_bias.astype(jnp.float32), g)
    return outs


# Pallas-vs-jnp backward selector for the NHWC kernels (compile-fragility
# escape hatch: VIST_WA_NHWC_BWD=jnp restores the recomputed-attention jnp
# backward with its partition copies)
_NHWC_PALLAS_BWD = os.environ.get("VIST_WA_NHWC_BWD", "pallas") == "pallas"


def _use_pallas_bwd(interpret: bool) -> bool:
    return _NHWC_PALLAS_BWD and (interpret
                                 or jax.default_backend() == "tpu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _wa_nhwc(qkv, rel_bias, scale, ws, shift, interpret):
    return _wa_nhwc_impl((qkv,), rel_bias, ws=ws, shift=shift, scale=scale,
                         interpret=interpret)


def _wa_nhwc_fwd(qkv, rel_bias, scale, ws, shift, interpret):
    out = _wa_nhwc(qkv, rel_bias, scale, ws, shift, interpret)
    return out, (qkv, rel_bias)


def _wa_nhwc_bwd(scale, ws, shift, interpret, res, g):
    """Backward: Pallas recompute kernel on TPU/interpret, jnp otherwise."""
    qkv, rel_bias = res
    if _use_pallas_bwd(interpret):
        dqkv, drel = _wa_nhwc_bwd_impl(
            (qkv,), rel_bias, g.astype(qkv.dtype), ws=ws, shift=shift,
            scale=scale, interpret=interpret)
        return dqkv, drel.astype(rel_bias.dtype)
    return _wa_nhwc_bwd_jnp(scale, ws, shift, res, g)


def _wa_nhwc_bwd_jnp(scale, ws, shift, res, g):
    """jnp backward (recomputed attention — no residual attn matrix)."""
    from vision_instance_seg_tpu.models.swin import (
        _shift_attn_mask, window_partition, window_unpartition)

    qkv, rel_bias = res
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    nh = rel_bias.shape[0]
    hd = c // nh
    n = ws * ws
    xw = window_partition(qkv.astype(jnp.float32), ws)      # (nWt, N, 3C)
    nwt = xw.shape[0]
    q = xw[..., :c].reshape(nwt, n, nh, hd)
    k = xw[..., c:2 * c].reshape(nwt, n, nh, hd)
    v = xw[..., 2 * c:].reshape(nwt, n, nh, hd)
    gw = window_partition(g.astype(jnp.float32), ws).reshape(nwt, n, nh, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    s = s + rel_bias[None].astype(jnp.float32)
    if shift > 0:
        nw = (hp // ws) * (wp // ws)
        m = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        s = (s.reshape(nwt // nw, nw, nh, n, n) + m[None, :, None]
             ).reshape(nwt, nh, n, n)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gw)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gw, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * scale
    drel = ds.sum(0)                                        # (nH, N, N)
    dxw = jnp.concatenate([dq.reshape(nwt, n, c), dk.reshape(nwt, n, c),
                           dv.reshape(nwt, n, c)], axis=-1)
    dqkv = window_unpartition(dxw, ws, hp, wp)
    return dqkv.astype(qkv.dtype), drel.astype(rel_bias.dtype)


_wa_nhwc.defvjp(_wa_nhwc_fwd, _wa_nhwc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _wa_nhwc_split(q, k, v, rel_bias, scale, ws, shift, pad_hw, interpret):
    return _wa_nhwc_impl((q, k, v), rel_bias, ws=ws, shift=shift,
                         scale=scale, pad_hw=pad_hw, interpret=interpret)


def _wa_nhwc_split_fwd(q, k, v, rel_bias, scale, ws, shift, pad_hw,
                       interpret):
    out = _wa_nhwc_split(q, k, v, rel_bias, scale, ws, shift, pad_hw,
                         interpret)
    return out, (q, k, v, rel_bias)


def _nhwc_window_mask(hp, wp, ws, shift, pad_hw):
    """(nW, N, N) additive mask matching the kernel's in-kernel labels."""
    from vision_instance_seg_tpu.models.pixel_decoder import (
        _window_pad_shift_mask)
    from vision_instance_seg_tpu.models.swin import _shift_attn_mask

    if pad_hw is not None:
        return jnp.asarray(_window_pad_shift_mask(pad_hw[0], pad_hw[1], ws,
                                                  shift))
    if shift > 0:
        return jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
    return None


def _wa_nhwc_split_bwd(scale, ws, shift, pad_hw, interpret, res, g):
    """Backward: Pallas recompute kernel on TPU/interpret, jnp otherwise."""
    q, k, v, rel_bias = res
    if _use_pallas_bwd(interpret):
        dq, dk, dv, drel = _wa_nhwc_bwd_impl(
            (q, k, v), rel_bias, g.astype(q.dtype), ws=ws, shift=shift,
            scale=scale, pad_hw=pad_hw, interpret=interpret)
        return dq, dk, dv, drel.astype(rel_bias.dtype)
    return _wa_nhwc_split_bwd_jnp(scale, ws, shift, pad_hw, res, g)


def _wa_nhwc_split_bwd_jnp(scale, ws, shift, pad_hw, res, g):
    """jnp backward (recomputed attention)."""
    from vision_instance_seg_tpu.models.swin import (
        window_partition, window_unpartition)

    q, k, v, rel_bias = res
    b, hp, wp, c = q.shape
    nh = rel_bias.shape[0]
    hd = c // nh
    n = ws * ws
    qw = window_partition(q.astype(jnp.float32), ws)
    nwt = qw.shape[0]
    qw = qw.reshape(nwt, n, nh, hd)
    kw = window_partition(k.astype(jnp.float32), ws).reshape(nwt, n, nh, hd)
    vw = window_partition(v.astype(jnp.float32), ws).reshape(nwt, n, nh, hd)
    gw = window_partition(g.astype(jnp.float32), ws).reshape(nwt, n, nh, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qw * scale, kw)
    s = s + rel_bias[None].astype(jnp.float32)
    m = _nhwc_window_mask(hp, wp, ws, shift, pad_hw)
    if m is not None:
        nw = (hp // ws) * (wp // ws)
        s = (s.reshape(nwt // nw, nw, nh, n, n) + m[None, :, None]
             ).reshape(nwt, nh, n, n)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gw)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gw, vw)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kw) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qw) * scale
    drel = ds.sum(0)                                        # (nH, N, N)
    up = lambda t: window_unpartition(t.reshape(nwt, n, c), ws, hp, wp)
    return (up(dq).astype(q.dtype), up(dk).astype(k.dtype),
            up(dv).astype(v.dtype), drel.astype(rel_bias.dtype))


_wa_nhwc_split.defvjp(_wa_nhwc_split_fwd, _wa_nhwc_split_bwd)


def _wa_nhwc_jnp(qkv, rel_bias, scale, ws, shift):
    """jnp reference of the NHWC contract (CPU fallback + test golden)."""
    from vision_instance_seg_tpu.models.swin import (
        _shift_attn_mask, _window_attention_nhd, window_partition,
        window_unpartition)

    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    nh = rel_bias.shape[0]
    hd = c // nh
    n = ws * ws
    xw = window_partition(qkv, ws)                          # (nWt, N, 3C)
    nwt = xw.shape[0]
    q = xw[..., :c].reshape(nwt, n, nh, hd)
    k = xw[..., c:2 * c].reshape(nwt, n, nh, hd)
    v = xw[..., 2 * c:].reshape(nwt, n, nh, hd)
    mask = (jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
            if shift > 0 else None)
    out = _window_attention_nhd(q, k, v, rel_bias, mask, scale)
    return window_unpartition(out.reshape(nwt, n, c), ws, hp, wp)


def fused_window_attention_nhwc(qkv, rel_bias, scale, geometry,
                                interpret: bool = False):
    """NHWC window attention: qkv (B, Hp, Wp, 3C) straight from the fused
    qkv Dense (pre-rolled when shifted), rel_bias (nH, N, N), geometry =
    (Hp, Wp, ws, shift). Returns (B, Hp, Wp, C). Differentiable (custom
    VJP: Pallas forward, recomputed-attention jnp backward).

    models/swin.py dispatches here via ``wants_nhwc`` — the window
    partition/unpartition copies and qkv head-split transpose of the
    token-major paths are skipped entirely. Off-TPU (CPU tests, the
    multichip dryrun) the numerically-equivalent jnp path runs instead.
    """
    hp, wp, ws, shift = geometry
    assert qkv.shape[1] == hp and qkv.shape[2] == wp, (qkv.shape, geometry)
    if not interpret and jax.default_backend() != "tpu":
        return _wa_nhwc_jnp(qkv, rel_bias, float(scale), int(ws), int(shift))
    return _wa_nhwc(qkv, rel_bias, float(scale), int(ws), int(shift),
                    bool(interpret))


fused_window_attention_nhwc.wants_nhwc = True


def _wa_nhwc_split_jnp(q, k, v, rel_bias, scale, ws, shift, pad_hw):
    """jnp reference of the split-qkv NHWC contract (CPU fallback/golden)."""
    from vision_instance_seg_tpu.models.swin import (
        _window_attention_nhd, window_partition, window_unpartition)

    b, hp, wp, c = q.shape
    nh = rel_bias.shape[0]
    hd = c // nh
    n = ws * ws
    qw = window_partition(q, ws)
    nwt = qw.shape[0]
    qw = qw.reshape(nwt, n, nh, hd)
    kw = window_partition(k, ws).reshape(nwt, n, nh, hd)
    vw = window_partition(v, ws).reshape(nwt, n, nh, hd)
    mask = _nhwc_window_mask(hp, wp, ws, shift, pad_hw)
    out = _window_attention_nhd(qw, kw, vw, rel_bias, mask, scale)
    return window_unpartition(out.reshape(nwt, n, c), ws, hp, wp)


def fused_window_attention_nhwc_split(q, k, v, rel_bias, scale, geometry,
                                      pad_hw=None, interpret: bool = False):
    """Split-projection NHWC window attention (the window-encoder contract):
    q/k/v (B, Hp, Wp, C) straight from separate Denses (padded + pre-rolled
    when shifted), rel_bias (nH, N, N), geometry = (Hp, Wp, ws, shift),
    pad_hw = (h, w) real extents for canvas-pad masking (None = no pad
    tokens / backbone semantics). Returns (B, Hp, Wp, C). Differentiable
    (custom VJP, recomputed-attention jnp backward). Off-TPU the
    numerically-equivalent jnp path runs instead.
    """
    hp, wp, ws, shift = geometry
    assert q.shape[1] == hp and q.shape[2] == wp, (q.shape, geometry)
    if pad_hw is not None and tuple(pad_hw) == (hp, wp):
        pad_hw = None                       # no pad tokens -> cheaper masks
    if pad_hw is not None:
        pad_hw = (int(pad_hw[0]), int(pad_hw[1]))
    if not interpret and jax.default_backend() != "tpu":
        return _wa_nhwc_split_jnp(q, k, v, rel_bias, float(scale), int(ws),
                                  int(shift), pad_hw)
    return _wa_nhwc_split(q, k, v, rel_bias, float(scale), int(ws),
                          int(shift), pad_hw, bool(interpret))


fused_window_attention_nhwc_split.wants_nhwc = True
