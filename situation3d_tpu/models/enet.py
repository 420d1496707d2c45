"""ENet 2D CNN (flax.linen) — the legacy multiview 2D feature extractor.

Re-implementation of the vendored ENet (``lib/enet.py:130-695``) used by the
ScanRefer-style multiview path together with ops/projection.py. The live
reference network is **encoder-only**: the decoder stages are commented out
in the source (``lib/enet.py:592-695``), so ``create_enet`` is: initial
block (conv stride-2 || maxpool concat, ``:131-138``), stage 1 (downsample +
4 bottlenecks @64, ``:139-259``), stage 2 (downsample + 8 dilated/asymmetric
bottlenecks @128, ``:260-420``), stage 3 (the same 8-spec pattern repeated
@128, no downsample, ``:421-590``), and a bias-free 1x1 classifier
(``:588-590``).

``create_enet_for_3d`` (``lib/enet.py:697-716``) splits that stack into a
frozen trunk (everything up to stage 3), a trainable tail (stage 3's 8
bottlenecks: ``model[n-9:n-1]``) and the classifier; here the same split is
expressed as param-path prefixes consumed by the optimizer trainable masks
(train/optim.py) instead of ``requires_grad`` flags.
"""
from __future__ import annotations

from typing import Tuple

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
    asymmetric / downsample) -> 1x1 up, PReLU residual. Conv bias layout
    follows the reference: projection convs bias-free, the middle conv
    biased; asymmetric = (1,5) bias-free then (5,1) biased
    (lib/enet.py:268-280)."""
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
            h = nn.Conv(internal, (1, 5), padding="SAME", use_bias=False,
                        dtype=self.dtype)(h)
            h = nn.Conv(internal, (5, 1), padding="SAME", dtype=self.dtype)(h)
        else:
            h = nn.Conv(internal, (3, 3), padding="SAME",
                        kernel_dilation=(self.dilation, self.dilation),
                        dtype=self.dtype)(h)
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


# the repeated 8-bottleneck spec of stages 2 and 3 (lib/enet.py:263-590):
# regular, dil 2, asym 5, dil 4, regular, dil 8, asym 5, dil 16
_STAGE_SPECS = [dict(), dict(dilation=2), dict(asymmetric=True),
                dict(dilation=4), dict(), dict(dilation=8),
                dict(asymmetric=True), dict(dilation=16)]


class ENetStage12(nn.Module):
    """Initial block + stage 1 (@64) + stage 2 (@128) — the frozen trunk of
    create_enet_for_3d (lib/enet.py:703)."""
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
        for i, kw in enumerate(_STAGE_SPECS):
            h = Bottleneck(128, dtype=self.dtype,
                           name=f"bottleneck2_{i+1}", **kw)(h, train)
        return h


class ENetStage3(nn.Module):
    """Stage 3: the 8-spec pattern repeated at 128 channels with no
    downsample (lib/enet.py:421-590) — the trainable tail
    (``model[n-9:n-1]``, lib/enet.py:702)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        for i, kw in enumerate(_STAGE_SPECS):
            x = Bottleneck(128, dtype=self.dtype,
                           name=f"bottleneck3_{i}", **kw)(x, train)
        return x


class ENetEncoder(nn.Module):
    """Full ENet encoder trunk -> [B, H/8, W/8, 128] features."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        h = ENetStage12(self.dtype, name="stage12")(x, train)
        return ENetStage3(self.dtype, name="stage3")(h, train)


class ENetForMultiview(nn.Module):
    """create_enet_for_3d analogue (lib/enet.py:697-716): frozen trunk
    (stages 1-2) + trainable stage 3 + bias-free 1x1 classifier. Freeze the
    trunk with ``trainable_filter=enet_trainable_paths`` in the optimizer
    masks rather than requires_grad."""
    num_classes: int = 41
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = ENetStage12(self.dtype, name="fixed")(x, train)
        feats = ENetStage3(self.dtype, name="trainable")(h, train)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         dtype=self.dtype, name="classifier")(feats)
        return feats, logits


def enet_trainable_paths(path: Tuple[str, ...]) -> bool:
    """Path predicate for train/optim.py masks: stage 3 + classifier train,
    the ``fixed`` trunk does not (lib/enet.py:713-715)."""
    return not (path and path[0] == "fixed")
