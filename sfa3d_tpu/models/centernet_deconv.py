"""CenterNet-style deconv detector (the reference's `resnet_*` arch variant).

Behavior parity with reference models/resnet.py:115-284: ResNet backbone ->
three stride-2 ConvTranspose (256 ch, k=4, pad=1, no bias) + BN + ReLU ->
one conv tower per head at the single 1/4 scale.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sfa3d_tpu.models.kfpn import HEADS, HeadTower
from sfa3d_tpu.models.resnet import BN_MOMENTUM, ResNetBackbone


class DeconvCenterNet(nn.Module):
    num_layers: int = 18
    head_conv: int = 64
    heads: Tuple[Tuple[str, int], ...] = tuple(sorted(HEADS.items()))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        _, _, _, x = ResNetBackbone(self.num_layers, dtype=self.dtype, name="backbone")(x, train)

        # Deconv stack (resnet.py:192-217): torch ConvTranspose2d(k=4, s=2,
        # p=1) == flax ConvTranspose(k=4, s=2, padding='SAME',
        # transpose_kernel=True), verified numerically in tests/test_model.py;
        # init N(0, 0.001) per init_weights (resnet.py:236-242).
        for i in range(3):
            x = nn.ConvTranspose(
                256,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                transpose_kernel=True,  # torch gradient-of-conv convention
                use_bias=False,
                kernel_init=nn.initializers.normal(stddev=0.001),
                dtype=self.dtype,
                name=f"deconv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                dtype=jnp.float32,
                name=f"deconv_bn{i}",
            )(x)
            x = nn.relu(x)

        return {
            head: HeadTower(
                self.head_conv, out_ch, is_hm="hm" in head,
                dtype=self.dtype, name=f"head_{head}",
            )(x)
            for head, out_ch in self.heads
        }
