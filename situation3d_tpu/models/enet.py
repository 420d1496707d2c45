"""ENet 2D CNN (flax.linen) — the legacy multiview 2D feature extractor.

Compact re-implementation of the vendored ENet (``lib/enet.py``:
``create_enet:130`` encoder and the ``create_enet_for_3d:697`` split into a
frozen feature trunk + trainable classifier) used by the ScanRefer-style
multiview path together with ops/projection.py. Architecture: initial block
(conv stride-2 || maxpool concat), stage 1 (downsample + 4 bottlenecks @64),
stage 2 (downsample + bottlenecks with dilation/asymmetric convs @128) —
the encoder half whose features feed the 2D->3D back-projection.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class InitialBlock(nn.Module):
    out_channels: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        conv = nn.Conv(self.out_channels - x.shape[-1], (3, 3), strides=(2, 2),
                       padding="SAME", use_bias=False, dtype=self.dtype)(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        out = jnp.concatenate([conv, pool], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        return nn.PReLU()(out)


class Bottleneck(nn.Module):
    """ENet bottleneck: 1x1 down -> main conv (regular / dilated /
    asymmetric / downsample) -> 1x1 up, PReLU residual."""
    out_channels: int
    internal_ratio: int = 4
    downsample: bool = False
    dilation: int = 1
    asymmetric: bool = False
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        internal = self.out_channels // self.internal_ratio
        residual = x
        stride = (2, 2) if self.downsample else (1, 1)
        h = nn.Conv(internal, (2, 2) if self.downsample else (1, 1),
                    strides=stride, use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        if self.asymmetric:
            h = nn.Conv(internal, (5, 1), padding="SAME", use_bias=False,
                        dtype=self.dtype)(h)
            h = nn.Conv(internal, (1, 5), padding="SAME", use_bias=False,
                        dtype=self.dtype)(h)
        else:
            h = nn.Conv(internal, (3, 3), padding="SAME",
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.Dropout(self.pdrop)(h, deterministic=not train)
        if self.downsample:
            residual = nn.max_pool(residual, (2, 2), strides=(2, 2),
                                   padding="SAME")
        if residual.shape[-1] != self.out_channels:
            pad = self.out_channels - residual.shape[-1]
            residual = jnp.pad(residual, ((0, 0),) * 3 + ((0, pad),))
        return nn.PReLU()(h + residual)


class ENetEncoder(nn.Module):
    """ENet encoder trunk -> [B, H/8, W/8, 128] features for back-projection."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        h = InitialBlock(16, self.dtype, name="initial")(x, train)
        h = Bottleneck(64, downsample=True, pdrop=0.01, dtype=self.dtype,
                       name="bottleneck1_0")(h, train)
        for i in range(4):
            h = Bottleneck(64, pdrop=0.01, dtype=self.dtype,
                           name=f"bottleneck1_{i+1}")(h, train)
        h = Bottleneck(128, downsample=True, dtype=self.dtype,
                       name="bottleneck2_0")(h, train)
        specs = [dict(), dict(dilation=2), dict(asymmetric=True),
                 dict(dilation=4), dict(), dict(dilation=8),
                 dict(asymmetric=True), dict(dilation=16)]
        for i, kw in enumerate(specs):
            h = Bottleneck(128, dtype=self.dtype,
                           name=f"bottleneck2_{i+1}", **kw)(h, train)
        return h


class ENetForMultiview(nn.Module):
    """create_enet_for_3d analogue: frozen trunk + trainable classifier head
    (per-pixel semantic logits used for auxiliary 2D supervision)."""
    num_classes: int = 41
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        feats = ENetEncoder(self.dtype, name="trunk")(x, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="classifier")(feats)
        return feats, logits
