"""ResNet backbone blocks (NHWC, flax.linen).

Re-designed from the behavior of reference models/fpn_resnet.py:42-167 and
models/resnet.py: BasicBlock / Bottleneck residual blocks, the 7x7 stem, and
the 4-stage layer stack. TPU-first choices:
- NHWC layout (XLA's native conv layout on TPU).
- configurable compute dtype (bfloat16 activations, float32 params/BN).
- BatchNorm running stats in a flax `batch_stats` collection. Torch's
  momentum 0.1 update `running = 0.9*running + 0.1*batch` corresponds to
  flax momentum=0.9.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # == torch momentum 0.1 (see module docstring)


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (fpn_resnet.py:42-71)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, 3, self.stride, dtype=self.dtype, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, 3, 1, dtype=self.dtype, name="cb2")(out, train)
        if self.has_downsample:
            residual = ConvBN(
                self.planes * self.expansion, 1, self.stride, dtype=self.dtype, name="downsample"
            )(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (fpn_resnet.py:74-109)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, 1, 1, dtype=self.dtype, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, 3, self.stride, dtype=self.dtype, name="cb2")(out, train)
        out = nn.relu(out)
        out = ConvBN(self.planes * self.expansion, 1, 1, dtype=self.dtype, name="cb3")(out, train)
        if self.has_downsample:
            residual = ConvBN(
                self.planes * self.expansion, 1, self.stride, dtype=self.dtype, name="downsample"
            )(x, train)
        return nn.relu(out + residual)


# arch spec: (block class, per-stage block counts) — fpn_resnet.py:289-293.
RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNetBackbone(nn.Module):
    """Stem + layer1..layer4; returns the four stage outputs
    (fpn_resnet.py:179-187). Input (B, H, W, 3); stage strides 4/8/16/32."""

    num_layers: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, counts = RESNET_SPEC[self.num_layers]
        expansion = 4 if block_cls is Bottleneck else 1

        x = ConvBN(64, 7, 2, dtype=self.dtype, name="stem")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), counts)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                needs_ds = (s != 1) or (inplanes != planes * expansion)
                x = block_cls(
                    planes,
                    stride=s,
                    has_downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
                inplanes = planes * expansion
            outs.append(x)
        return tuple(outs)


def stage_channels(num_layers: int) -> Sequence[int]:
    block_cls, _ = RESNET_SPEC[num_layers]
    e = 4 if block_cls is Bottleneck else 1
    return tuple(c * e for c in (64, 128, 256, 512))
