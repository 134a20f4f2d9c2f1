"""Shared neural-net building blocks (flax.linen, NHWC, TPU dtype policy).

The reference gets these from torch.nn via Detectron2/MaskDINO; here they are
re-designed for XLA: NHWC layouts (TPU conv native), bf16 compute with fp32
params, and no in-place ops. Dtype policy: modules take a ``dtype`` argument
for activation/matmul precision; parameters are always stored fp32 and cast
on use (matches SOLVER.AMP semantics of the reference,
train_experiments.py:72).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


def embedding_init():
    """N(0, 1) — torch ``nn.Embedding`` / ``nn.init.normal_`` parity.

    Query/level/label EMBEDDINGS need unit scale: they are identities, not
    weights. At trunc_normal(0.02) every query starts as nearly the SAME
    vector — self/cross attention cannot tell queries apart and per-query
    specialization (which the DINO box head depends on) is glacial. Found
    round 3: the MaskDINO box head predicted the same boxes for every image
    (bbox AP ~0) because 0.02-scale query_feat/query_box gave queries no
    identity; masks still localized since they ride on per-image
    mask_features. The reference uses nn.Embedding (N(0,1)) for all of
    these (mask2former/maskdino transformer decoders, deformable pixel
    decoder level_embed).
    """
    return nn.initializers.normal(stddev=1.0)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm's DropPath; used by Swin blocks)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None, rate=None):
        # ``rate`` overrides the static attribute with a (possibly traced)
        # scalar — nn.scan bodies receive per-layer drop-path rates as
        # scanned inputs, which cannot be static module attributes.
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or (rate is None and self.rate == 0.0):
            return x
        keep = 1.0 - (self.rate if rate is None else rate)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        # keep may be a traced f32 scalar (scanned per-layer rates); cast so
        # the output dtype matches x — an nn.scan carry must not promote
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                         jnp.zeros_like(x))


class Mlp(nn.Module):
    """Transformer MLP: Linear -> GELU -> Linear."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class LayerNorm(nn.LayerNorm):
    """fp32-param LayerNorm that computes in fp32 and casts back.

    LN statistics in bf16 lose precision; always normalize in fp32
    (standard TPU practice), then cast to the compute dtype. Epsilon is
    torch's 1e-5 (flax defaults 1e-6) so imported checkpoints reproduce
    the reference numerics exactly (tests/test_torch_parity.py).
    """

    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        y = super().__call__(x.astype(jnp.float32))
        return y.astype(self.dtype)


def get_norm(name: str, dtype=jnp.float32, num_groups: int = 32):
    if name in ("LN", "layer_norm"):
        return LayerNorm(dtype=dtype)
    if name in ("GN", "group_norm"):
        return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5,
                            dtype=jnp.float32)
    raise ValueError(f"unknown norm {name}")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics (inference affine transform only).

    The reference's R-50 backbone uses FrozenBN (detectron2 default for
    ImageNet-pretrained backbones). Stats/scale/bias are non-trainable
    variables loaded from the pretrained checkpoint.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.variable("frozen", "scale",
                              lambda: jnp.ones((self.features,), jnp.float32))
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        mean = self.variable("frozen", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("frozen", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        mul = (scale.value * jax.lax.rsqrt(var.value + self.eps)).astype(self.dtype)
        add = (bias.value - mean.value * scale.value *
               jax.lax.rsqrt(var.value + self.eps)).astype(self.dtype)
        return x * mul + add


class ConvNormAct(nn.Module):
    """Conv2D (NHWC) + optional GroupNorm + optional ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "GN"
    act: bool = True
    use_bias: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias = self.use_bias if self.use_bias is not None else self.norm == ""
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), use_bias=bias,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        1.0, "fan_out", "truncated_normal"))(x)
        if self.norm:
            x = get_norm(self.norm, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


def position_embedding_sine(h: int, w: int, dim: int,
                            temperature: float = 10000.0,
                            normalize: bool = True,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Sine-cosine 2D positional embedding, (H*W, dim).

    Same formulation as DETR/Mask2Former's PositionEmbeddingSine (the
    reference inherits it from Mask2Former); computed statically per scale.
    """
    assert dim % 2 == 0
    num_pos_feats = dim // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        scale = 2 * jnp.pi
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])],
                      axis=3).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])],
                      axis=3).reshape(h, w, num_pos_feats)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1).reshape(h * w, dim)
    return pos.astype(dtype)


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _interp_matrix_2tap(n_in: int, n_out: int) -> "np.ndarray":
    """(n_out, n_in) torch-style bilinear resampling matrix.

    align_corners=False half-pixel sampling with TWO taps per output and
    edge replication — torch ``F.interpolate(mode='bilinear')`` exactly.
    ``jax.image.resize(method='bilinear')`` matches this on UPSCALING but
    ANTIALIASES on downscaling (triangle filter widened by the scale
    factor), which silently diverged the Mask2Former attention-gate
    logits from the reference's (found r4 by the Swin torch twin:
    gate-agreeing queries diverged while every ungated tensor matched).
    """
    import numpy as np

    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        l0 = min(max(lo[o], 0), n_in - 1)
        l1 = min(max(lo[o] + 1, 0), n_in - 1)
        m[o, l0] += 1.0 - frac[o]
        m[o, l1] += frac[o]
    return m


def resize_bilinear_2tap(x: jnp.ndarray, h_out: int, w_out: int,
                         spatial_axes=(-2, -1)) -> jnp.ndarray:
    """Torch-parity bilinear resize over two trailing-ish spatial axes.

    Separable 2-tap resampling as two small matmuls (MXU work — faster on
    TPU than a gather-based resize, and exactly ``F.interpolate(...,
    mode='bilinear', align_corners=False, antialias=False)`` for up- AND
    down-scaling). Accumulates in f32 and casts back to x.dtype.
    """
    import numpy as np

    ah, aw = (a % x.ndim for a in spatial_axes)
    h_in, w_in = x.shape[ah], x.shape[aw]
    if h_in == h_out and w_in == w_out:
        return x
    my = jnp.asarray(_interp_matrix_2tap(h_in, h_out))
    mx = jnp.asarray(_interp_matrix_2tap(w_in, w_out))
    y = jnp.moveaxis(x, (ah, aw), (-2, -1)).astype(jnp.float32)
    y = jnp.einsum("oh,...hw->...ow", my, y)
    y = jnp.einsum("pw,...hw->...hp", mx, y)
    return jnp.moveaxis(y, (-2, -1), (ah, aw)).astype(x.dtype)
