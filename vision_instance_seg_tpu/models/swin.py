"""Swin Transformer backbone (T/S/B/L), TPU-native.

Re-designed from scratch for XLA/TPU rather than ported from the reference's
torch stack (the reference imports Swin via MaskDINO's fork of
``swin_transformer.py``; declared architecture README.md:2 "Swin Transformer
+ Mask2Former"):

- NHWC throughout (native TPU conv layout), static shapes: the train canvas
  is a fixed square (INPUT.IMAGE_SIZE) so every stage's window partition is
  static and jit compiles once.
- Shifted windows via ``jnp.roll`` (XLA lowers to cheap collective-free
  slice/concat), window partition via reshape/transpose only.
- The window attention core is a pluggable callable so the Pallas fused
  kernel (kernels/window_attention.py) can replace the jnp reference path
  (config TPU.USE_PALLAS_WINDOW_ATTN).
- Relative position bias stored as a (2W-1)^2 x nH table, gathered once per
  block (identical parameterization to the original paper so ImageNet
  weights import 1:1).
- bf16 activations / fp32 params; LayerNorm in fp32.

Stage outputs are {"res2": /4, "res3": /8, "res4": /16, "res5": /32} to match
what the pixel decoder consumes (reference SEM_SEG_HEAD.IN_FEATURES).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_instance_seg_tpu.models.layers import (
    DropPath, LayerNorm, Mlp, trunc_normal_init)

# Signature: (q, k, v, rel_bias, shift_mask, scale, num_windows) -> out
#   q,k,v:      (num_windows_total, num_heads, tokens, head_dim)
#   rel_bias:   (num_heads, tokens, tokens) additive (relative position)
#   shift_mask: (num_windows_per_image, tokens, tokens) additive, or None
AttnFn = Callable[..., jnp.ndarray]


def reference_window_attention(q, k, v, rel_bias, shift_mask, scale,
                               num_windows) -> jnp.ndarray:
    """Plain-jnp window attention; the numerical golden for the Pallas kernel.

    Logits are materialized in the COMPUTE dtype (f32 accumulation inside
    the MXU, then a fused convert): at 800px stage 1 the logit tensor is
    (6728, 3, 49, 49) and keeping it f32 cost ~1 GB of HBM traffic per
    layer across the bias-add/softmax/convert chain (profiled r3, ~40% of
    the backbone). The softmax exp runs in the compute dtype with an
    f32-accumulated sum, which preserves f32 numerics exactly when the
    compute dtype IS f32 (CPU goldens) and stays well within bf16
    tolerance otherwise (sum of <=49 positive terms).
    """
    nwt, nh, n, _ = q.shape
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32).astype(q.dtype)
    attn = attn + rel_bias[None].astype(q.dtype)
    if shift_mask is not None:
        nw = shift_mask.shape[0]
        m = shift_mask[None, :, None].astype(q.dtype)   # 1, nW, 1, N, N
        attn = (attn.reshape(nwt // nw, nw, nh, n, n) + m
                ).reshape(nwt, nh, n, n)
    amax = jax.lax.stop_gradient(jnp.max(attn, axis=-1, keepdims=True))
    e = jnp.exp(attn - amax)
    s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    attn = e / s.astype(e.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nWh*nWw, ws*ws, C). H, W must be multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_unpartition(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws^2, ws^2) index into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)                      # 2, ws^2
    rel = coords[:, :, None] - coords[:, None, :]       # 2, ws^2, ws^2
    rel = rel.transpose(1, 2, 0) + (ws - 1)             # shift to >= 0
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, ws^2, ws^2) for shifted windows: tokens from
    different pre-shift regions must not attend to each other."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    img = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    img = img.reshape(-1, ws * ws)                      # nW, ws^2
    diff = img[:, :, None] != img[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_attention_nhd(q, k, v, rel_bias, shift_mask,
                          scale) -> jnp.ndarray:
    """``reference_window_attention`` numerics with (nWt, N, nH, hd)
    operands and NO transposes — einsum dimension numbers carry the head
    axis wherever it sits, so XLA never materializes a layout copy of the
    qkv tensor. Same dtype strategy as the reference fn (compute-dtype
    logits, f32 MXU accumulation, f32 softmax denominator)."""
    nwt, n, nh, _ = q.shape
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32).astype(q.dtype)
    attn = attn + rel_bias[None].astype(q.dtype)
    if shift_mask is not None:
        nw = shift_mask.shape[0]
        m = shift_mask[None, :, None].astype(q.dtype)   # 1, nW, 1, N, N
        attn = (attn.reshape(nwt // nw, nw, nh, n, n) + m
                ).reshape(nwt, nh, n, n)
    amax = jax.lax.stop_gradient(jnp.max(attn, axis=-1, keepdims=True))
    e = jnp.exp(attn - amax)
    s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    attn = e / s.astype(e.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with relative position bias."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 num_windows: int, geometry=None) -> jnp.ndarray:
        # x: (nW_total, N, C) token-major, or (B, Hp, Wp, C) NHWC when
        # attn_fn.wants_nhwc (the fused partition+attention+merge kernel);
        # mask: (nW, N, N) or None;
        # geometry (Hp, Wp, ws, shift): passed to mask-free kernels
        n = self.window_size * self.window_size
        c = x.shape[-1]
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd ** -0.5

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * self.window_size - 1) ** 2, nh), jnp.float32)
        rel_idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = table[rel_idx.reshape(-1)].reshape(n, n, nh)
        bias = bias.transpose(2, 0, 1)                   # nH, N, N

        if x.ndim == 4:
            # NHWC fused path: qkv/proj run on the (B, Hp, Wp, C) map
            # (identical params — Dense acts on the last axis either way);
            # windows are formed in VMEM by the kernel, so the
            # partition/unpartition HBM copies never happen.
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                           kernel_init=trunc_normal_init(), name="qkv")(x)
            out = self.attn_fn(qkv, bias, scale, geometry)
            return nn.Dense(c, dtype=self.dtype,
                            kernel_init=trunc_normal_init(),
                            name="proj")(out)

        nwt = x.shape[0]
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(x)
        # an NHWC-only kernel can't take token-major operands (SwinBlock
        # falls back here when ws % 8 != 0) — use the default jnp path
        attn_fn = (None if getattr(self.attn_fn, "wants_nhwc", False)
                   else self.attn_fn)
        if attn_fn is None:
            # default jnp path, transpose-free: the 5-D qkv transpose to
            # (3, nWt, nH, N, hd) materialized a full copy of the stage-1
            # tensor (bf16[6728,49,3,3,32], ~3 ms/call at 800px profiled
            # r3); einsum dimension numbers carry the (N, nH) order
            # natively. Channel split order matches the (3, nH, hd)
            # reshape, so the torch qkv weight import is unchanged.
            q = qkv[..., :c].reshape(nwt, n, nh, hd)
            k = qkv[..., c:2 * c].reshape(nwt, n, nh, hd)
            v = qkv[..., 2 * c:].reshape(nwt, n, nh, hd)
            out = _window_attention_nhd(q, k, v, bias, mask, scale)
            out = out.reshape(nwt, n, c)
        else:
            qkv = qkv.reshape(nwt, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]             # (nWt, nH, N, hd)
            if geometry is not None and getattr(attn_fn,
                                                "wants_geometry", False):
                attn = attn_fn(q, k, v, bias, None, scale, num_windows,
                               geometry=geometry)
            else:
                attn = attn_fn(q, k, v, bias, mask, scale, num_windows)
            out = attn.transpose(0, 2, 1, 3).reshape(nwt, n, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 drop_path_rate=None) -> jnp.ndarray:
        # x: (B, H, W, C) UNPADDED; window padding happens here, AFTER
        # norm1, exactly like the upstream detection fork — pad tokens
        # must enter attention as exact ZEROS. The r1-r3 layout padded at
        # stage level (before norm1), so pad tokens carried LN(0) =
        # gamma*(-mu/sigma)+beta instead of 0 and real tokens in mixed
        # windows attended to different pad values than torch; found r4
        # by the Swin torch twin (tests/test_torch_parity.py), largest at
        # high pad fractions (res5 3x3 -> 7x7).
        # drop_path_rate: optional traced scalar overriding self.drop_path
        # (scanned stages feed per-block rates as scan inputs)
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size

        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x, hp, wp = _pad_to_windows(x, ws)
        use_geo = getattr(self.attn_fn, "wants_geometry", False)
        use_nhwc = getattr(self.attn_fn, "wants_nhwc", False) and ws % 8 == 0
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            # geometry-aware kernels derive the region mask in-kernel
            mask = None if (use_geo or use_nhwc) else jnp.asarray(
                _shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        attn = WindowAttention(
            self.dim, self.num_heads, ws, self.qkv_bias, self.qk_scale,
            dtype=self.dtype, attn_fn=self.attn_fn, name="attn")
        if use_nhwc:
            # fused partition+attention+merge kernel: stays NHWC end to end
            x = attn(x, None, (hp // ws) * (wp // ws),
                     geometry=(hp, wp, ws, shift))
        else:
            xw = window_partition(x, ws)
            xw = attn(xw, mask, (hp // ws) * (wp // ws),
                      geometry=(hp, wp, ws, shift) if use_geo else None)
            x = window_unpartition(xw, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(x, deterministic,
                                                rate=drop_path_rate)

        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path)(y, deterministic,
                                            rate=drop_path_rate)


class _SwinStagePairBody(nn.Module):
    """A (regular, shifted) SwinBlock pair in ``nn.scan`` form (carry = x).

    Swin stage bodies alternate W-MSA / SW-MSA, so consecutive blocks are
    structurally identical in pairs — scanning over stacked pair params
    keeps ONE trace of the pair regardless of stage depth. This targets the
    profiled per-layer cost that does NOT shrink with more layers of the
    same trace: the HBM->SMEM parameter/index staging DMA tail (docs/PERF.md
    roofline table "copy-start DMAs ... amortizes only with layer
    fusion/scan") and, for deep variants (S/B/L stage 3 = 18 blocks),
    program size / compile time. Per-block drop-path rates ride along as a
    scanned (pairs, 2) input since they vary per block (stochastic-depth
    linspace).
    """

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, x, deterministic, dpr):
        kw = dict(dim=self.dim, num_heads=self.num_heads,
                  window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                  qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                  dtype=self.dtype, attn_fn=self.attn_fn)
        x = SwinBlock(shift_size=0, name="block0", **kw)(
            x, deterministic, drop_path_rate=dpr[0])
        x = SwinBlock(shift_size=self.window_size // 2, name="block1", **kw)(
            x, deterministic, drop_path_rate=dpr[1])
        return x, ()


class PatchMerging(nn.Module):
    """Downsample 2x: concat 2x2 neighborhood -> LN -> Dense(2C)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            h, w = h + pad_h, w + pad_w
        # order matches torch impl: x0=(0::2,0::2) x1=(1::2,0::2) x2=(0::2,1::2) x3=(1::2,1::2)
        x = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=trunc_normal_init(), name="reduction")(x)


def _pad_to_windows(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, int, int]:
    b, h, w, c = x.shape
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, h + ph, w + pw


class SwinTransformer(nn.Module):
    """Swin backbone producing multi-scale NHWC features res2..res5.

    Variants: T (96,[2,2,6,2],[3,6,12,24]) S (96,[2,2,18,2],...)
              B (128,[2,2,18,2],[4,8,16,32]) L (192,...,[6,12,24,48]).
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = 0.0
    drop_path_rate: float = 0.3
    patch_norm: bool = True
    ape: bool = False
    pretrain_img_size: int = 224   # APE grid = pretrain_img_size/patch_size
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    use_checkpoint: bool = False
    # nn.scan stage bodies with >= 2 (regular, shifted) pairs — one trace
    # per stage instead of per block (see _SwinStagePairBody). Params move
    # from stage{s}_block{d} subtrees to a stacked stage{s}_blocks tree;
    # utils/weights.py restacks torch imports accordingly.
    scan_stages: bool = True
    # unroll factor (in PAIRS): full unroll keeps the loop's cross-layer
    # XLA fusion (stacked params still cut per-layer staging); 1 = rolled
    # while-loop (smallest program — the deformable encoder measured a
    # fusion cost when rolled, so default to full unroll and let training
    # CLIs roll if compile size demands it)
    scan_unroll: int = 9
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[AttnFn] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """x: (B, H, W, 3) normalized image -> dict of NHWC feature maps."""
        ps = self.patch_size
        b, h0, w0, _ = x.shape
        ph = (ps - h0 % ps) % ps
        pw = (ps - w0 % ps) % ps
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, name="patch_embed")(x)
        if self.patch_norm:
            x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        if self.ape:
            # absolute position embedding at the pretrain patch grid,
            # bicubic-resized to the actual grid (the Swin detection fork's
            # F.interpolate(..., mode='bicubic') forward; NHWC here)
            pp = self.pretrain_img_size // ps
            pos = self.param("absolute_pos_embed", trunc_normal_init(),
                             (1, pp, pp, self.embed_dim), jnp.float32)
            _, h1, w1, _ = x.shape
            pos = jax.image.resize(pos, (1, h1, w1, self.embed_dim),
                                   method="bicubic")
            x = x + pos.astype(x.dtype)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        # TPU.REMAT: rematerialize each block's activations in backward
        # (trades FLOPs for HBM — SURVEY.md build plan, jax.checkpoint).
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if self.use_checkpoint else SwinBlock
        outs = {}
        blk_i = 0
        for stage in range(len(self.depths)):
            dim = self.embed_dim * (2 ** stage)
            # window padding lives INSIDE SwinBlock (post-norm1, upstream
            # semantics — see SwinBlock docstring); feature strides stay
            # exactly 4/8/16/32 w.r.t. the input canvas
            depth = self.depths[stage]
            if self.scan_stages and depth % 2 == 0 and depth >= 4:
                # one scanned pair trace (length-1 scans gain nothing, so
                # depth-2 stages keep the plain loop / per-block params)
                body = (nn.remat(_SwinStagePairBody, static_argnums=(2,))
                        if self.use_checkpoint else _SwinStagePairBody)
                rates = jnp.asarray(dpr[blk_i:blk_i + depth],
                                    jnp.float32).reshape(depth // 2, 2)
                stack = nn.scan(
                    body, variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, 0), length=depth // 2,
                    unroll=max(1, min(self.scan_unroll, depth // 2)))
                x, _ = stack(
                    dim=dim, num_heads=self.num_heads[stage],
                    window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    dtype=self.dtype, attn_fn=self.attn_fn,
                    name=f"stage{stage}_blocks")(x, deterministic, rates)
                blk_i += depth
            else:
                for d in range(depth):
                    x = block_cls(
                        dim=dim, num_heads=self.num_heads[stage],
                        window_size=self.window_size,
                        shift_size=0 if d % 2 == 0 else self.window_size // 2,
                        mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                        qk_scale=self.qk_scale, drop_path=dpr[blk_i],
                        dtype=self.dtype, attn_fn=self.attn_fn,
                        name=f"stage{stage}_block{d}")(x, deterministic)
                    blk_i += 1
            feat_name = f"res{stage + 2}"
            if feat_name in self.out_features:
                # per-output-scale LN (matches torch impl's out norms)
                f = LayerNorm(dtype=self.dtype, name=f"norm{stage}")(x)
                outs[feat_name] = f
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim=dim, dtype=self.dtype,
                                 name=f"downsample{stage}")(x)
        return outs


SWIN_VARIANTS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def swin_output_channels(embed_dim: int) -> dict:
    return {f"res{i + 2}": embed_dim * (2 ** i) for i in range(4)}


def build_swin(cfg, dtype=jnp.float32, attn_fn: Optional[AttnFn] = None
               ) -> SwinTransformer:
    s = cfg.MODEL.SWIN
    return SwinTransformer(
        embed_dim=s.EMBED_DIM, depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS), window_size=s.WINDOW_SIZE,
        patch_size=s.PATCH_SIZE, mlp_ratio=s.MLP_RATIO, qkv_bias=s.QKV_BIAS,
        qk_scale=s.QK_SCALE, drop_path_rate=s.DROP_PATH_RATE,
        patch_norm=s.PATCH_NORM, ape=s.APE,
        pretrain_img_size=int(s.PRETRAIN_IMG_SIZE),
        out_features=tuple(s.OUT_FEATURES),
        use_checkpoint=s.USE_CHECKPOINT or bool(cfg.TPU.REMAT_BACKBONE),
        scan_stages=bool(cfg.TPU.get("SCAN_SWIN_STAGES", True)),
        scan_unroll=int(cfg.TPU.get("SCAN_SWIN_UNROLL", 9)),
        dtype=dtype, attn_fn=attn_fn)
