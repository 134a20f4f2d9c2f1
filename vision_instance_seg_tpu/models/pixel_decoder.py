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
    LayerNorm, position_embedding_sine, trunc_normal_init)


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
    num_decoder_levels: int = 3
    encoder_attention: str = "deformable"   # "deformable" | "full"
    dtype: jnp.dtype = jnp.float32
    core_fn: Optional[DeformCoreFn] = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        # ---- deformable encoder over the selected scales (high->low res
        # ordering follows the torch impl: input_proj list is reversed, i.e.
        # level 0 = lowest resolution)
        tf_feats = [features[f] for f in self.transformer_in_features][::-1]
        num_levels = len(tf_feats)
        b = tf_feats[0].shape[0]

        srcs, poss, shapes = [], [], []
        level_embed = self.param("level_embed", trunc_normal_init(),
                                 (num_levels, self.conv_dim), jnp.float32)
        for i, f in enumerate(tf_feats):
            h, w = f.shape[1], f.shape[2]
            x = nn.Dense(self.conv_dim, dtype=self.dtype,
                         name=f"input_proj{i}")(f)
            x = nn.GroupNorm(num_groups=32, name=f"input_proj{i}_norm")(
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

        for li in range(self.num_encoder_layers):
            if self.encoder_attention == "full":
                src = FullAttentionEncoderLayer(
                    self.conv_dim, self.num_heads, self.ffn_dim,
                    dtype=self.dtype,
                    name=f"encoder_layer{li}")(src, pos, ref, shapes)
            else:
                src = DeformableEncoderLayer(
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
        y = outs[0]
        # fuse encoder scales from low to high resolution first
        for i in range(1, num_levels):
            target = outs[i]
            y = jax.image.resize(y, target.shape, method="bilinear")
            y = target + y
        # then lateral-fuse the remaining high-res backbone scales (e.g. res2)
        for n in reversed(fpn_names):
            lat = features[n]
            lat = nn.Dense(self.conv_dim, use_bias=False, dtype=self.dtype,
                           name=f"lateral_{n}")(lat)
            lat = nn.GroupNorm(num_groups=32, name=f"lateral_{n}_norm")(
                lat.astype(jnp.float32)).astype(self.dtype)
            y = lat + jax.image.resize(y, lat.shape, method="bilinear")
            y = nn.Conv(self.conv_dim, (3, 3), use_bias=False,
                        dtype=self.dtype, name=f"output_{n}")(y)
            y = nn.GroupNorm(num_groups=32, name=f"output_{n}_norm")(
                y.astype(jnp.float32)).astype(self.dtype)
            y = nn.relu(y)

        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=self.dtype,
                                name="mask_features")(y)
        multi_scale = outs[:self.num_decoder_levels]
        return mask_features, multi_scale


def build_pixel_decoder(cfg, dtype=jnp.float32,
                        core_fn: Optional[DeformCoreFn] = None
                        ) -> MSDeformAttnPixelDecoder:
    s = cfg.MODEL.SEM_SEG_HEAD
    return MSDeformAttnPixelDecoder(
        conv_dim=s.CONVS_DIM, mask_dim=s.MASK_DIM,
        transformer_in_features=tuple(
            s.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES),
        num_encoder_layers=s.TRANSFORMER_ENC_LAYERS,
        num_heads=s.DEFORM_NUM_HEADS, num_points=s.DEFORM_NUM_POINTS,
        common_stride=s.COMMON_STRIDE,
        num_decoder_levels=s.NUM_FEATURE_LEVELS,
        encoder_attention=s.get("ENCODER_ATTENTION", "deformable"),
        dtype=dtype, core_fn=core_fn)
