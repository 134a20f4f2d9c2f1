"""Multi-scale deformable attention (MSDeformAttn), TPU-native.

The reference's pixel decoder depends on MaskDINO's compiled CUDA kernel
``MSDeformAttn`` (maskdino/modeling/pixel_decoder/ops — pulled in via
``add_maskdino_config``/``build_model``, reference train_original.py:29).
Here the sampling core is a pure function over static per-level shapes:

    ms_deform_attn_core(value_levels, locations, weights) -> output

- jnp reference path: vectorized corner gathers via ``take_along_axis`` on
  the flattened (H*W) axis — everything batched, no scalar loops, XLA fuses
  the 4-corner lerp into the gathers. Row gathers are element-serial on
  TPU (~70ms/encoder-layer at 800px — docs/PERF.md), so this stays the
  reference-parity path; the flagship uses the windowed encoder
  (pixel_decoder.WindowEncoderLayer) / dense decoder cross-attention.
- ``core_fn`` hook: kernels/msdeform_attn.fused_ms_deform_attn plugs in
  under the same contract (TPU.USE_PALLAS_DEFORM_ATTN): the blocked
  windowed Pallas kernel for grid (encoder) queries, and
  ``ms_deform_attn_core_onehot`` below for free (decoder) queries.

Shapes (static): value (B, sum_L H_l*W_l, nH, hd); locations
(B, Q, nH, L, P, 2) normalized to [0,1]; weights (B, Q, nH, L, P) softmaxed
over L*P. Output (B, Q, nH*hd).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_instance_seg_tpu.models.layers import trunc_normal_init

# (value, spatial_shapes, locations, weights) -> (B, Q, nH, hd)
DeformCoreFn = Callable[..., jnp.ndarray]


def _bilinear_gather_level(value_l: jnp.ndarray, loc: jnp.ndarray,
                           h: int, w: int) -> jnp.ndarray:
    """Bilinear sample one level.

    value_l: (B, H*W, nH, hd); loc: (B, Q, nH, P, 2) in [0,1] normalized.
    Returns (B, Q, nH, P, hd). Matches the CUDA kernel's convention:
    sampling grid is align_corners=False ('pixel centers at (i+0.5)/W'),
    out-of-range corners contribute zero.
    """
    b, hw, nh, hd = value_l.shape
    q, p = loc.shape[1], loc.shape[3]
    x = loc[..., 0] * w - 0.5                       # (B, Q, nH, P)
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(value_l.dtype)
    ly = (y - y0).astype(value_l.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi, wgt):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # (B,Q,nH,P)
        # gather along flattened-HW axis: reshape to (B, Q*P, nH) index
        idx_f = idx.transpose(0, 1, 3, 2).reshape(b, q * p, nh)
        g = jnp.take_along_axis(value_l, idx_f[..., None], axis=1)  # (B,Q*P,nH,hd)
        g = g.reshape(b, q, p, nh, hd).transpose(0, 1, 3, 2, 4)     # (B,Q,nH,P,hd)
        wgt = jnp.where(valid, wgt, 0.0)
        return g * wgt[..., None].astype(value_l.dtype)

    out = (corner(y0i, x0i, (1 - ly) * (1 - lx))
           + corner(y0i, x0i + 1, (1 - ly) * lx)
           + corner(y0i + 1, x0i, ly * (1 - lx))
           + corner(y0i + 1, x0i + 1, ly * lx))
    return out


def ms_deform_attn_core_jnp(value: jnp.ndarray,
                            spatial_shapes: Sequence[Tuple[int, int]],
                            locations: jnp.ndarray,
                            weights: jnp.ndarray) -> jnp.ndarray:
    """Reference (pure-jnp) deformable sampling core.

    value: (B, sum HW, nH, hd) — levels concatenated along axis 1.
    spatial_shapes: static [(H_l, W_l)] per level.
    locations: (B, Q, nH, L, P, 2); weights: (B, Q, nH, L, P).
    Returns (B, Q, nH * hd).
    """
    b, _, nh, hd = value.shape
    q = locations.shape[1]
    splits = [h * w for h, w in spatial_shapes]
    offsets = np.cumsum([0] + splits)
    out = jnp.zeros((b, q, nh, hd), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lvl]), splits[lvl], 1)
        sampled = _bilinear_gather_level(v, locations[:, :, :, lvl], h, w)
        out = out + jnp.sum(
            sampled.astype(jnp.float32)
            * weights[:, :, :, lvl, :, None].astype(jnp.float32), axis=3)
    return out.reshape(b, q, nh * hd)


def ms_deform_attn_core_onehot(value: jnp.ndarray,
                               spatial_shapes: Sequence[Tuple[int, int]],
                               locations: jnp.ndarray,
                               weights: jnp.ndarray) -> jnp.ndarray:
    """No-gather sampling core for FREE (small-Q) queries.

    Same contract as ``ms_deform_attn_core_jnp``, but instead of the
    element-serial XLA row-gathers (TPU has no hardware gather; ~77 ms per
    decoder cross-attention layer per direction at batch 4), each level
    builds separable bilinear "two-hot" row/col factors — iota compares
    against the two corner indices, carrying the y/x lerp weights with the
    softmaxed attention weight folded into the y side — expands them with
    one fused broadcast-multiply-sum over points into a selection matrix
    (B, Q, nH, Hl*Wl), and contracts it with the level's values in ONE
    batched MXU matmul. Out-of-map corners match no index (or only
    zero-contribution positions), reproducing the jnp core's zeroing
    exactly, for ARBITRARY offsets (no halo/window contract). Fully
    differentiable through XLA — no custom VJP.

    Economics vs the blocked Pallas encoder kernel: the selection matrix
    is (Q, sum HW) DENSE, so this only makes sense when Q << sum HW (the
    MaskDINO decoder's ~300-400 box queries, reference
    maskdino/modeling/transformer_decoder); encoder (grid) queries stay on
    the windowed Pallas kernel.
    """
    b, _, nh, hd = value.shape
    q = locations.shape[1]
    splits = [h * w for h, w in spatial_shapes]
    offsets = np.cumsum([0] + splits)
    vdtype = value.dtype
    out = jnp.zeros((b, q, nh, hd), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lvl]),
                                         splits[lvl], 1)   # (B, M, nH, hd)
        loc = locations[:, :, :, lvl].astype(jnp.float32)  # (B,Q,nH,P,2)
        aw = weights[:, :, :, lvl].astype(jnp.float32)     # (B,Q,nH,P)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        xf = jnp.floor(x)
        yf = jnp.floor(y)
        lx = x - xf
        ly = y - yf
        xi = jnp.clip(xf, -2.0, float(w)).astype(jnp.int32)
        yi = jnp.clip(yf, -2.0, float(h)).astype(jnp.int32)
        iy = jnp.arange(h, dtype=jnp.int32)
        ix = jnp.arange(w, dtype=jnp.int32)
        yh = (jnp.where(iy == yi[..., None], ((1.0 - ly) * aw)[..., None],
                        0.0)
              + jnp.where(iy == yi[..., None] + 1, (ly * aw)[..., None],
                          0.0))                            # (B,Q,nH,P,H)
        xh = (jnp.where(ix == xi[..., None], (1.0 - lx)[..., None], 0.0)
              + jnp.where(ix == xi[..., None] + 1, lx[..., None],
                          0.0))                            # (B,Q,nH,P,W)
        # explicit point loop: bounds the intermediate at (B,Q,nH,H,W) —
        # a .sum over an outer-product axis would otherwise rely on XLA
        # fusing away a P-times-larger broadcast
        p = yh.shape[3]
        sel = yh[:, :, :, 0, :, None] * xh[:, :, :, 0, None, :]
        for pt in range(1, p):
            sel = sel + yh[:, :, :, pt, :, None] * xh[:, :, :, pt, None, :]
        sel = sel.reshape(b, q, nh, h * w).astype(vdtype)
        out = out + jnp.einsum("bqnm,bmnd->bqnd", sel, v,
                               preferred_element_type=jnp.float32)
    return out.reshape(b, q, nh * hd)


class MSDeformAttn(nn.Module):
    """Learned deformable attention layer (Deformable-DETR formulation)."""

    dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dtype: jnp.dtype = jnp.float32
    core_fn: Optional[DeformCoreFn] = None
    # Maximum |sampling offset| in pixels of the sampled level. When set
    # (or when ``core_fn`` carries an ``offset_clamp`` attribute, as the
    # fused Pallas kernel does), offsets are clamped BEFORE sampling, which
    # makes the blocked kernel's halo-window contract exact by construction:
    # every sample provably stays within ``halo`` px of the query tile, so
    # kernel == jnp core on the actual (clamped) locations — no silent
    # divergence for checkpoints with wide trained offsets.
    offset_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, query: jnp.ndarray, reference_points: jnp.ndarray,
                 value: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        """query (B, Q, C); reference_points (B, Q, L, 2) or (B, Q, L, 4)
        normalized; value (B, sum HW, C)."""
        b, q, c = query.shape
        nh, nl, npts = self.num_heads, self.num_levels, self.num_points
        hd = c // nh

        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, nh, hd)

        # init offsets like the CUDA impl: 8 compass directions scaled by ring
        def _offset_bias_init(key, shape, dtype=jnp.float32):
            thetas = np.arange(nh) * (2.0 * np.pi / nh)
            grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
            grid = grid / np.abs(grid).max(-1, keepdims=True)
            grid = np.tile(grid[:, None, None, :], (1, nl, npts, 1))
            for i in range(npts):
                grid[:, :, i, :] *= i + 1
            return jnp.asarray(grid.reshape(-1), dtype)

        off = nn.Dense(nh * nl * npts * 2, dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros,
                       bias_init=_offset_bias_init,
                       name="sampling_offsets")(query.astype(jnp.float32))
        off = off.reshape(b, q, nh, nl, npts, 2)

        aw = nn.Dense(nh * nl * npts, dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="attention_weights")(query.astype(jnp.float32))
        aw = jax.nn.softmax(aw.reshape(b, q, nh, nl * npts), axis=-1)
        aw = aw.reshape(b, q, nh, nl, npts)

        wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
        clamp = self.offset_clamp
        if clamp is None:
            clamp = getattr(self.core_fn, "offset_clamp", None)
        if q != sum(h_ * w_ for h_, w_ in spatial_shapes):
            # free (decoder) queries run on the one-hot core, which is
            # exact for ARBITRARY offsets — the halo contract only binds
            # the windowed encoder kernel; clamping here would diverge
            # from the reference CUDA op for no benefit
            clamp = None
        if reference_points.shape[-1] == 2:
            if clamp is not None:   # halo contract (see class docstring)
                off = jnp.clip(off, -float(clamp), float(clamp))
            loc = (reference_points[:, :, None, :, None, :]
                   + off / wh[None, None, None, :, None, :])
        else:  # box refs (cx, cy, w, h): offsets scaled by box size
            ref = reference_points
            loc = (ref[:, :, None, :, None, :2]
                   + off / npts * ref[:, :, None, :, None, 2:] * 0.5)

        core = self.core_fn or ms_deform_attn_core_jnp
        out = core(v, spatial_shapes, loc, aw)
        # checkpoint_name: under layer remat (TPU.REMAT_ENCODER) the policy
        # save_only_these_names('msdeform_core') keeps this one activation
        # so the backward does NOT re-trace the sampling kernels — halving
        # the Mosaic kernel instantiations in the train-step module (the
        # 4-scale compile OOM) and skipping the most expensive recompute
        # (~26 ms/layer at batch 4), for (B, Q, C) of saved HBM per layer.
        from jax.ad_checkpoint import checkpoint_name
        out = checkpoint_name(out.astype(self.dtype), "msdeform_core")
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
