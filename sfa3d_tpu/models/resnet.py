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


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index (dy*2 + dx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_to_s2d(k7: Any) -> Any:
    """(7, 7, C, F) stride-2 stem kernel -> the EXACTLY-equivalent
    (4, 4, 4C, F) stride-1 kernel over a space-to-depth(2) input.

    Derivation: output o of conv7x7/s2(pad 3) reads input rows 2o-3..2o+3.
    Embed K7 in an 8x8 kernel with a zero row/col at the TOP/LEFT, so the
    window becomes rows 2o-4..2o+3 = sd rows o-2..o+1 — a 4-tap stride-1
    conv with padding (2, 1). K4[u, v, (dy*2+dx)*C + c, f] = K8[2u+dy,
    2v+dx, c, f]. The classic TPU stem reformulation (MLPerf ResNet): same
    math, but the conv contracts over 4C input channels instead of C."""
    import numpy as np

    k7 = np.asarray(k7)
    _, _, c, f = k7.shape
    k8 = np.zeros((8, 8, c, f), k7.dtype)
    k8[1:, 1:] = k7
    k4 = k8.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return k4.reshape(4, 4, 4 * c, f)


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32
    # space-to-depth reformulation (stem only: kernel 7, stride 2). The
    # param tree keeps the {conv, bn} shape; the conv kernel is the
    # transformed (4, 4, 4C, F) layout (stem_kernel_to_s2d).
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            assert self.kernel == 7 and self.stride == 2, "s2d is the stem reformulation"
            x = space_to_depth2(x)
            x = nn.Conv(
                self.features,
                (4, 4),
                strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
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
            # at LEAST float32: bf16 activations get f32 statistics (the
            # TPU-safety pin); float64 numerics-audit inputs keep f64 so
            # sharded-vs-unsharded parity is provable at f64 resolution
            # (scripts/spatial_parity_check.py)
            dtype=jnp.promote_types(jnp.float32, self.dtype),
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
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, counts = RESNET_SPEC[self.num_layers]
        expansion = 4 if block_cls is Bottleneck else 1

        x = ConvBN(
            64, 7, 2, dtype=self.dtype, s2d=self.s2d_stem, name="stem"
        )(x, train)
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
