"""ResNet backbone (R-50/R-101), TPU-native NHWC.

The reference's trained configuration is MaskDINO R-50
(training/maskdino/train_original.py:256-267: base yaml
``maskdino_R50_bs16_50ep_4s_dowsample1_2048.yaml`` + ImageNet R-50 init).
Detectron2's R-50 uses FrozenBN and a 7x7 stem; we reproduce that topology
(so torchvision/detectron2 ImageNet weights import 1:1) in NHWC with fused
conv+affine execution — FrozenBN folds into a per-channel multiply/add that
XLA fuses into the convolution epilogue.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_instance_seg_tpu.models.layers import FrozenBatchNorm


class BottleneckBlock(nn.Module):
    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      strides=(self.stride, self.stride), dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype,
                              name="conv1_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3), use_bias=False,
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=self.dilation, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype,
                              name="conv2_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype,
                              name="conv3_norm")(out)
        if self.in_channels != self.out_channels or self.stride != 1:
            sc = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                         strides=(self.stride, self.stride), dtype=self.dtype,
                         name="shortcut")(x)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype,
                                 name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


_DEPTH_TO_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    """ResNet producing {"res2": /4 C256, ..., "res5": /32 C2048} (NHWC)."""

    depth: int = 50
    stem_out_channels: int = 64
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic  # frozen-BN ResNet has no train-time stochasticity
        x = nn.Conv(self.stem_out_channels, (7, 7), strides=(2, 2),
                    padding=3, use_bias=False, dtype=self.dtype,
                    name="stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_out_channels, dtype=self.dtype,
                            name="stem_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        blocks_per_stage = _DEPTH_TO_BLOCKS[self.depth]
        in_ch = self.stem_out_channels
        outs = {}
        for stage, n_blocks in enumerate(blocks_per_stage):
            out_ch = 256 * (2 ** stage)
            mid_ch = 64 * (2 ** stage)
            for b in range(n_blocks):
                x = BottleneckBlock(
                    in_channels=in_ch, out_channels=out_ch,
                    bottleneck_channels=mid_ch,
                    stride=2 if (b == 0 and stage > 0) else 1,
                    dtype=self.dtype, name=f"res{stage + 2}_block{b}")(x)
                in_ch = out_ch
            name = f"res{stage + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs


def resnet_output_channels() -> dict:
    return {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}


def build_resnet(cfg, dtype=jnp.float32) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(depth=r.DEPTH, stem_out_channels=r.STEM_OUT_CHANNELS,
                  out_features=tuple(r.OUT_FEATURES), dtype=dtype)
