"""MSDeformAttn pixel decoder (Mask2Former/MaskDINO style), TPU-native.

Replaces the reference stack's ``MSDeformAttnPixelDecoder`` (MaskDINO
maskdino/modeling/pixel_decoder, reached via build_model — reference
train_original.py:29, SEM_SEG_HEAD.PIXEL_DECODER_NAME in the base yaml).

Design notes (TPU-first):
- All spatial shapes are static (fixed train/eval canvases), so per-level
  token counts, position embeddings and reference points are compile-time
  constants — no dynamic-shape re-tracing.
- The encoder runs over the concatenated multi-scale token sequence with
  deformable attention (sparse sampling keeps cost linear in tokens —
  this is the "long-context" mechanism at 640-800px, SURVEY.md §5).
- Top-down FPN fusion produces stride-4 mask features; upsampling uses
  ``jax.image.resize`` (XLA native) and lateral fusion fuses into the conv.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_instance_seg_tpu.models.deform_attn import DeformCoreFn, MSDeformAttn
from vision_instance_seg_tpu.models.layers import (
    LayerNorm, position_embedding_sine, trunc_normal_init, embedding_init)
from vision_instance_seg_tpu.models.swin import (
    AttnFn, _relative_position_index, _window_attention_nhd,
    window_partition, window_unpartition)


class DeformableEncoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    ffn_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    core_fn: Optional[DeformCoreFn] = None

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        q = src + pos
        attn = MSDeformAttn(self.dim, self.num_heads, self.num_levels,
                            self.num_points, dtype=self.dtype,
                            core_fn=self.core_fn, name="self_attn")(
            q, reference_points, src, spatial_shapes)
        src = LayerNorm(dtype=self.dtype, name="norm1")(src + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        return LayerNorm(dtype=self.dtype, name="norm2")(src + y)


class _DeformableEncoderScanBody(nn.Module):
    """One deformable encoder layer in ``nn.scan`` form (carry = src).

    The 6 encoder layers are structurally identical, so the Python
    layer loop produced 6 duplicate traces of the layer body — and with
    the Pallas sampling kernels that meant ~22 Mosaic kernel
    instantiations per layer × fwd/bwd × 6 layers, a 7.7 MB MLIR module
    that OOM-killed the remote TPU compile helper on the 4-scale train
    step. Scanning over a stacked-parameter layer keeps ONE trace of the
    body regardless of depth (XLA `while`), shrinking both the program
    and compile time. Spatial shapes stay static via module attributes.
    """
    dim: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_dim: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    dtype: jnp.dtype = jnp.float32
    core_fn: Optional[DeformCoreFn] = None

    @nn.compact
    def __call__(self, src, pos, reference_points):
        out = DeformableEncoderLayer(
            self.dim, self.num_heads, self.num_levels, self.num_points,
            self.ffn_dim, dtype=self.dtype, core_fn=self.core_fn,
            name="layer")(src, pos, reference_points,
                          list(self.spatial_shapes))
        return out, ()


class _WindowEncoderScanBody(nn.Module):
    """An (unshifted, shifted) WindowEncoderLayer pair in ``nn.scan`` form
    (carry = src). Same motivation as _DeformableEncoderScanBody /
    swin._SwinStagePairBody: the flagship's 6 window-encoder layers are
    three structurally identical pairs, so one scanned pair trace replaces
    three duplicate traces — cutting the per-layer HBM->SMEM param-staging
    DMA tail (PERF.md roofline) and program size."""

    dim: int
    num_heads: int
    ffn_dim: int
    window_size: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, src, pos):
        kw = dict(dim=self.dim, num_heads=self.num_heads,
                  ffn_dim=self.ffn_dim, window_size=self.window_size,
                  dtype=self.dtype, attn_fn=self.attn_fn)
        # names avoid mesh.py's layer0/layer1 role tokens (those mark
        # column/row Dense kernels, not submodules)
        src = WindowEncoderLayer(shift=False, name="block0", **kw)(
            src, pos, None, list(self.spatial_shapes))
        src = WindowEncoderLayer(shift=True, name="block1", **kw)(
            src, pos, None, list(self.spatial_shapes))
        return src, ()


def _flash_or_dense_attention(q, k, v, scale: float):
    """(B, nH, S, hd) self-attention: TPU flash-attention Pallas kernel when
    available, dense jnp otherwise (CPU tests / tiny sequences)."""
    b, nh, s, hd = q.shape
    use_flash = (jax.default_backend() == "tpu" and s >= 1024
                 and hd in (32, 64, 128))
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)

        sp = -(-s // 512) * 512
        pad = sp - s
        if pad:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            seg = jnp.where(jnp.arange(sp) < s, 1, 2).astype(jnp.int32)
            seg = jnp.broadcast_to(seg[None], (b, sp))
            out = flash_attention(q, k, v,
                                  segment_ids=SegmentIds(q=seg, kv=seg),
                                  sm_scale=scale)
            return out[:, :, :s]
        return flash_attention(q, k, v, sm_scale=scale)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class FullAttentionEncoderLayer(nn.Module):
    """Dense self-attention encoder layer over the multi-scale tokens.

    TPU-native alternative to deformable sampling (config
    SEM_SEG_HEAD.ENCODER_ATTENTION="full"): at 640-800px the concatenated
    sequence is ~8-13k tokens, where dense MXU attention via the flash-
    attention Pallas kernel is faster on TPU than scattered bilinear
    gathers (deformable attention is a GPU-era compute-saving
    approximation; dense attention is strictly more expressive).
    """

    dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        del reference_points, spatial_shapes
        b, s, c = src.shape
        nh = self.num_heads
        hd = c // nh
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(src + pos)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(src + pos)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(src)
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        out = _flash_or_dense_attention(q, k, v, hd ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        attn = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
        src = LayerNorm(dtype=self.dtype, name="norm1")(src + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        return LayerNorm(dtype=self.dtype, name="norm2")(src + y)


def _window_pad_shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, ws^2, ws^2) for one encoder level.

    Combines the Swin shifted-window region mask with masking of the
    right/bottom padding that rounds (h, w) up to window multiples: a real
    token never attends to a padded or cross-region token. Uses -100 (not
    -inf) so all-masked rows (pure-pad windows) stay NaN-free; padded query
    rows are cropped after unpartition.
    """
    hp = -(-h // ws) * ws
    wp = -(-w // ws) * ws
    region = np.zeros((hp, wp), np.int32)
    if shift:
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                region[hs, wsl] = cnt
                cnt += 1
    pad = np.zeros((hp, wp), np.int32)
    pad[h:, :] = 1
    pad[:, w:] = 1
    if shift:  # x is rolled by (-shift, -shift) after padding; mirror that
        pad = np.roll(pad, (-shift, -shift), (0, 1))
    lab = region + 10 * pad
    lab = lab.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    lab = lab.reshape(-1, ws * ws)                       # nW, N
    diff = lab[:, :, None] != lab[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowEncoderLayer(nn.Module):
    """TPU-native multi-scale encoder layer: windowed intra-level attention
    + per-layer cross-scale fusion.

    Replaces the role of the reference's deformable encoder layer (MaskDINO
    MSDeformAttn encoder, reference train_original.py:29) with operations
    that map onto the MXU instead of scattered bilinear gathers: each level
    runs local window attention (the fused Pallas window kernel — the same
    one as the Swin backbone — packs two windows per 128-row MXU tile),
    windows shift by ws/2 on alternate layers for cross-window flow, and a
    cross-scale step resizes all levels to each level's grid and mixes them
    with a Dense projection (deformable attention's cross-level sampling,
    done densely — resize + 1x1 conv are XLA-native and cheap).
    """

    dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024
    window_size: int = 8
    shift: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        del reference_points
        b, s, c = src.shape
        nh, ws = self.num_heads, self.window_size
        hd = c // nh
        shift = ws // 2 if self.shift else 0

        # shared relative-position bias (window geometry identical per level)
        table = self.param("relative_position_bias_table", trunc_normal_init(),
                           ((2 * ws - 1) ** 2, nh), jnp.float32)
        rel_idx = jnp.asarray(_relative_position_index(ws))
        rel_bias = table[rel_idx.reshape(-1)].reshape(ws * ws, ws * ws, nh)
        rel_bias = rel_bias.transpose(2, 0, 1)            # nH, N, N

        qk_src = src + pos
        wq = nn.Dense(c, dtype=self.dtype, name="q_proj")
        wk = nn.Dense(c, dtype=self.dtype, name="k_proj")
        wv = nn.Dense(c, dtype=self.dtype, name="v_proj")
        use_nhwc = (getattr(self.attn_fn, "wants_nhwc", False)
                    and ws % 8 == 0)

        outs, offset = [], 0
        for li, (h, w) in enumerate(spatial_shapes):
            xq = qk_src[:, offset:offset + h * w].reshape(b, h, w, c)
            xv = src[:, offset:offset + h * w].reshape(b, h, w, c)
            offset += h * w
            hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
            padding = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
            xq = jnp.pad(xq, padding)
            xv = jnp.pad(xv, padding)
            if shift:
                xq = jnp.roll(xq, (-shift, -shift), (1, 2))
                xv = jnp.roll(xv, (-shift, -shift), (1, 2))
            n = ws * ws
            nw = (hp // ws) * (wp // ws)
            if use_nhwc:
                # fused partition+attention+merge kernel: projections run
                # on the NHWC maps (identical params), windows form in
                # VMEM, pad/shift masks derive in-kernel — no partition /
                # unpartition copies, no head transposes
                o = self.attn_fn(wq(xq), wk(xq), wv(xv), rel_bias,
                                 hd ** -0.5, (hp, wp, ws, shift),
                                 pad_hw=(h, w))
            else:
                q = wq(window_partition(xq, ws))          # (B*nW, N, C)
                k = wk(window_partition(xq, ws))
                v = wv(window_partition(xv, ws))
                mask = jnp.asarray(_window_pad_shift_mask(h, w, ws, shift))
                # an NHWC-only kernel can't take token-major operands
                # (ws % 8 != 0 falls back here) — use the jnp path
                if (self.attn_fn is None
                        or getattr(self.attn_fn, "wants_nhwc", False)):
                    # transpose-free jnp path: einsum dimension numbers
                    # carry the (N, nH) order natively (same trick as the
                    # backbone, models/swin.py _window_attention_nhd) —
                    # the six (0,2,1,3) layout copies never materialize
                    o = _window_attention_nhd(
                        q.reshape(-1, n, nh, hd), k.reshape(-1, n, nh, hd),
                        v.reshape(-1, n, nh, hd), rel_bias, mask,
                        hd ** -0.5).reshape(-1, n, c)
                else:
                    q = q.reshape(-1, n, nh, hd).transpose(0, 2, 1, 3)
                    k = k.reshape(-1, n, nh, hd).transpose(0, 2, 1, 3)
                    v = v.reshape(-1, n, nh, hd).transpose(0, 2, 1, 3)
                    o = self.attn_fn(q, k, v, rel_bias, mask, hd ** -0.5,
                                     nw)
                    o = o.transpose(0, 2, 1, 3).reshape(-1, n, c)
                o = window_unpartition(o, ws, hp, wp)
            if shift:
                o = jnp.roll(o, (shift, shift), (1, 2))
            outs.append(o[:, :h, :w])

        attn = jnp.concatenate(
            [o.reshape(b, -1, c) for o in outs], axis=1)
        attn = nn.Dense(c, dtype=self.dtype, name="out_proj")(attn)
        src = LayerNorm(dtype=self.dtype, name="norm1")(src + attn)

        # cross-scale fusion: every level sees every other level's features
        maps, offset = [], 0
        for (h, w) in spatial_shapes:
            maps.append(src[:, offset:offset + h * w].reshape(b, h, w, c))
            offset += h * w
        mixed = []
        for i, (h, w) in enumerate(spatial_shapes):
            feats = [m if j == i else jax.image.resize(
                m, (b, h, w, c), method="bilinear")
                for j, m in enumerate(maps)]
            y = nn.Dense(c, dtype=self.dtype, name=f"mix{i}")(
                jnp.concatenate(feats, axis=-1))
            mixed.append(y.reshape(b, h * w, c))
        src = LayerNorm(dtype=self.dtype, name="norm2")(
            src + jnp.concatenate(mixed, axis=1))

        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        return LayerNorm(dtype=self.dtype, name="norm3")(src + y)


def _encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]
                              ) -> np.ndarray:
    """(sum HW, L, 2) normalized pixel-center reference points (static)."""
    pts = []
    for (h, w) in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)                         # sum HW, 2
    return np.tile(ref[:, None, :], (1, len(spatial_shapes), 1))


class MSDeformAttnPixelDecoder(nn.Module):
    """Produces (mask_features, multi_scale_features).

    mask_features: (B, H/4, W/4, mask_dim)
    multi_scale_features: list of NHWC maps, highest-stride first, the
    ``num_decoder_levels`` scales fed round-robin to the transformer decoder.
    """

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    num_encoder_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    common_stride: int = 4
    # encoder scales; > len(transformer_in_features) adds extra stride-2
    # downsampled levels (MaskDINO "4s_dowsample1": res3-5 + one /64 level,
    # the reference's trained base yaml — train_original.py:256-260)
    total_num_feature_levels: int = 3
    encoder_attention: str = "deformable"   # "deformable" | "full" | "window"
    encoder_window_size: int = 8
    remat: bool = False    # jax.checkpoint each encoder layer (backward HBM)
    # fold the (structurally identical) deformable encoder layers into ONE
    # nn.scan trace over stacked params — required to keep the 4-scale
    # Pallas train-step program small enough to compile (see
    # _DeformableEncoderScanBody); loop layout kept for window/full modes
    scan_layers: bool = True
    # unroll factor for the scan: full unroll (== num_encoder_layers)
    # restores the loop's cross-layer XLA fusion for inference (measured
    # 50.2 vs 71.2 img/s rolled-vs-loop at 3-scale); training sets 1 so the
    # fwd+bwd Mosaic program stays small enough for the compile helper
    scan_unroll: int = 1
    # same fold for the window encoder: (unshifted, shifted) pairs scan
    # over stacked params (_WindowEncoderScanBody); needs an even layer
    # count >= 4 to be worth a scan, else the loop layout is kept
    scan_wenc: bool = True
    # "last" (upstream parity: FPN starts from the finest encoder level) |
    # "chain" (r1-r3: all encoder levels progressively fused)
    fpn_fusion: str = "last"
    dtype: jnp.dtype = jnp.float32
    core_fn: Optional[DeformCoreFn] = None
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        # ---- deformable encoder over the selected scales (high->low res
        # ordering follows the torch impl: input_proj list is reversed, i.e.
        # level 0 = lowest resolution)
        tf_feats = [features[f] for f in self.transformer_in_features][::-1]
        # extra downsampled encoder levels (MaskDINO 4s "dowsample1"):
        # stride-2 3x3 conv chain off the lowest-res backbone feature,
        # lowest resolution first
        extra = max(0, self.total_num_feature_levels - len(tf_feats))
        extra_feats: List[jnp.ndarray] = []
        prev = features[self.transformer_in_features[-1]]
        for k in range(extra):
            # padding=1 (symmetric), NOT flax's default SAME: at stride 2 on
            # even extents SAME pads (0, 1) while torch Conv2d(padding=1)
            # pads (1, 1) — same output size, shifted sampling grid (breaks
            # checkpoint import parity; tests/test_torch_parity.py)
            x = nn.Conv(self.conv_dim, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"input_proj_ds{k}")(prev)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj_ds{k}_norm")(
                x.astype(jnp.float32)).astype(self.dtype)
            extra_feats.insert(0, x)
            prev = x
        tf_feats = extra_feats + tf_feats
        num_levels = len(tf_feats)
        b = tf_feats[0].shape[0]

        srcs, poss, shapes = [], [], []
        level_embed = self.param("level_embed", embedding_init(),
                                 (num_levels, self.conv_dim), jnp.float32)
        for i, f in enumerate(tf_feats):
            h, w = f.shape[1], f.shape[2]
            if i < extra:               # stride-2 path already projected
                x = f
            else:
                x = nn.Dense(self.conv_dim, dtype=self.dtype,
                             name=f"input_proj{i - extra}")(f)
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f"input_proj{i - extra}_norm")(
                    x.astype(jnp.float32)).astype(self.dtype)
            pos = position_embedding_sine(h, w, self.conv_dim, dtype=self.dtype)
            srcs.append(x.reshape(b, h * w, self.conv_dim))
            poss.append(jnp.broadcast_to(pos[None], (b, h * w, self.conv_dim))
                        + level_embed[i].astype(self.dtype))
            shapes.append((h, w))

        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref = jnp.asarray(_encoder_reference_points(shapes))
        ref = jnp.broadcast_to(ref[None], (b,) + ref.shape)

        def _wrap(cls):
            # spatial_shapes (arg 4 counting self) is a static python list
            return nn.remat(cls, static_argnums=(4,)) if self.remat else cls

        if self.encoder_attention == "deformable" and self.scan_layers:
            # one scanned trace over stacked per-layer params (see
            # _DeformableEncoderScanBody docstring); remat applies to the
            # scan body, i.e. per layer, matching the loop behaviour.
            # Policy: keep the deformable-sampling core's output across the
            # remat boundary (everything else recomputes) — the backward
            # then contains NO second instantiation of the Pallas sampling
            # kernels (compile size) and skips their recompute (time), at
            # (B, sum HW, C) saved per layer (see MSDeformAttn).
            body = (nn.remat(_DeformableEncoderScanBody,
                             policy=jax.checkpoint_policies
                             .save_only_these_names("msdeform_core"))
                    if self.remat else _DeformableEncoderScanBody)
            stack = nn.scan(
                body,
                # 'intermediates' rides the scan stacked per layer so
                # capture_intermediates sees inside the fold (diagnostics
                # like scripts/repro_kernel_fault.py); absent unless a
                # caller requests capture, so normal runs are unchanged
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_encoder_layers,
                unroll=max(1, min(self.scan_unroll,
                                  self.num_encoder_layers)))
            src, _ = stack(
                self.conv_dim, self.num_heads, num_levels, self.num_points,
                self.ffn_dim, spatial_shapes=tuple(shapes),
                dtype=self.dtype, core_fn=self.core_fn,
                name="encoder_layers")(src, pos, ref)
        elif (self.encoder_attention == "window" and self.scan_wenc
              and self.num_encoder_layers >= 4
              and self.num_encoder_layers % 2 == 0):
            pairs = self.num_encoder_layers // 2
            body = (nn.remat(_WindowEncoderScanBody) if self.remat
                    else _WindowEncoderScanBody)
            stack = nn.scan(
                body, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,), length=pairs,
                unroll=max(1, min(self.scan_unroll, pairs)))
            src, _ = stack(
                self.conv_dim, self.num_heads, self.ffn_dim,
                window_size=self.encoder_window_size,
                spatial_shapes=tuple(shapes), dtype=self.dtype,
                attn_fn=self.attn_fn, name="wenc_layers")(src, pos)
        else:
            for li in range(self.num_encoder_layers):
                if self.encoder_attention == "window":
                    src = _wrap(WindowEncoderLayer)(
                        self.conv_dim, self.num_heads, self.ffn_dim,
                        window_size=self.encoder_window_size,
                        shift=bool(li % 2),
                        dtype=self.dtype, attn_fn=self.attn_fn,
                        name=f"encoder_layer{li}")(src, pos, ref, shapes)
                elif self.encoder_attention == "full":
                    src = _wrap(FullAttentionEncoderLayer)(
                        self.conv_dim, self.num_heads, self.ffn_dim,
                        dtype=self.dtype,
                        name=f"encoder_layer{li}")(src, pos, ref, shapes)
                else:
                    src = _wrap(DeformableEncoderLayer)(
                        self.conv_dim, self.num_heads, num_levels,
                        self.num_points, self.ffn_dim, dtype=self.dtype,
                        core_fn=self.core_fn,
                        name=f"encoder_layer{li}")(src, pos, ref, shapes)

        # split back to maps (level 0 = lowest res)
        outs = []
        offset = 0
        for (h, w) in shapes:
            outs.append(src[:, offset:offset + h * w].reshape(
                b, h, w, self.conv_dim))
            offset += h * w

        # ---- FPN top-down to common_stride using the non-transformer scales
        all_names = ["res2", "res3", "res4", "res5"]
        fpn_names = [n for n in all_names if n not in self.transformer_in_features]
        if self.fpn_fusion == "chain":
            # r1-r3 behavior: progressively fuse ALL encoder scales into the
            # mask-feature path (coarse context summed into res3)
            y = outs[0]
            for i in range(1, num_levels):
                target = outs[i]
                y = jax.image.resize(y, target.shape, method="bilinear")
                y = target + y
        else:
            # upstream parity ("last"): only the FINEST encoder level feeds
            # the FPN (maskdino_encoder.forward_features uses out[-1]; the
            # coarse levels reach the masks via the encoder's cross-level
            # attention, not the FPN)
            y = outs[-1]
        # then lateral-fuse the remaining high-res backbone scales (e.g. res2)
        for n in reversed(fpn_names):
            lat = features[n]
            lat = nn.Dense(self.conv_dim, use_bias=False, dtype=self.dtype,
                           name=f"lateral_{n}")(lat)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"lateral_{n}_norm")(
                lat.astype(jnp.float32)).astype(self.dtype)
            y = lat + jax.image.resize(y, lat.shape, method="bilinear")
            y = nn.Conv(self.conv_dim, (3, 3), use_bias=False,
                        dtype=self.dtype, name=f"output_{n}")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"output_{n}_norm")(
                y.astype(jnp.float32)).astype(self.dtype)
            y = nn.relu(y)

        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=self.dtype,
                                name="mask_features")(y)
        # all encoder scales, lowest resolution first; consumers slice
        # (Mask2Former decoder round-robins its NUM_FEATURE_LEVELS, the
        # MaskDINO decoder attends over all TOTAL_NUM_FEATURE_LEVELS)
        return mask_features, outs


def build_pixel_decoder(cfg, dtype=jnp.float32,
                        core_fn: Optional[DeformCoreFn] = None,
                        attn_fn: Optional[AttnFn] = None
                        ) -> MSDeformAttnPixelDecoder:
    s = cfg.MODEL.SEM_SEG_HEAD
    return MSDeformAttnPixelDecoder(
        conv_dim=s.CONVS_DIM, mask_dim=s.MASK_DIM,
        transformer_in_features=tuple(
            s.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES),
        num_encoder_layers=s.TRANSFORMER_ENC_LAYERS,
        num_heads=s.DEFORM_NUM_HEADS, num_points=s.DEFORM_NUM_POINTS,
        common_stride=s.COMMON_STRIDE,
        total_num_feature_levels=s.TOTAL_NUM_FEATURE_LEVELS,
        encoder_attention=s.get("ENCODER_ATTENTION", "deformable"),
        encoder_window_size=s.get("ENCODER_WINDOW_SIZE", 8),
        remat=bool(cfg.TPU.get("REMAT_ENCODER", False)),
        scan_layers=bool(cfg.TPU.get("SCAN_ENC_LAYERS", True)),
        scan_unroll=int(cfg.TPU.get("SCAN_ENC_UNROLL", 6)),
        scan_wenc=bool(cfg.TPU.get("SCAN_WENC_LAYERS", True)),
        fpn_fusion=str(s.get("FPN_FUSION", "last")),
        dtype=dtype, core_fn=core_fn, attn_fn=attn_fn)
