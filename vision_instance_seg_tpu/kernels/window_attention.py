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


def fused_window_attention(q, k, v, rel_bias,
                           shift_mask: Optional[jnp.ndarray],
                           scale: float, num_windows: int,
                           interpret: bool = False):
    """AttnFn entry (models/swin.py contract): q/k/v (nWt, nH, N, hd),
    nWt = B*num_windows; rel_bias (nH, N, N);
    shift_mask (num_windows, N, N) or None. Differentiable (custom VJP:
    Pallas forward, recomputed-attention jnp backward)."""
    nwt, nh, n, hd = q.shape
    b = nwt // num_windows
    shp = (b, num_windows, nh, n, hd)
    if shift_mask is None:
        shift_mask = jnp.zeros((num_windows, n, n), jnp.float32)
    out = _fused_wa(q.reshape(shp), k.reshape(shp), v.reshape(shp),
                    rel_bias, shift_mask, float(scale), interpret)
    return out.reshape(nwt, nh, n, hd)
