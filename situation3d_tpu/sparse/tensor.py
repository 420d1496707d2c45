"""Batched fixed-capacity sparse voxel tensor.

The TPU-native replacement for ``ME.SparseTensor``: instead of MinkowskiEngine's
flat ragged packing with a batch column in the coords (built by
``SQA3D_collate_fn``, ``lib/sepdataset.py:459-494``), voxels live in a dense
padded ``[B, V, ...]`` layout with a validity mask. Static shapes mean the
whole network jits once; masked rows gather zeros and are excluded from
normalization statistics.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SparseVoxels:
    """A batch of sparse voxel sets at a common tensor stride.

    Attributes:
      coords: int32 [B, V, 3] voxel coords in stride-1 units (multiples of
        ``stride``); padding rows are zero.
      feats:  [B, V, C] features; padding rows are zero.
      mask:   bool [B, V] validity.
      stride: tensor stride (static; part of the pytree aux data).
    """
    coords: jnp.ndarray
    feats: jnp.ndarray
    mask: jnp.ndarray
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def with_feats(self, feats: jnp.ndarray) -> "SparseVoxels":
        return self.replace(feats=jnp.where(self.mask[..., None], feats, 0))

    def cat(self, other: "SparseVoxels") -> "SparseVoxels":
        """Feature concat of two tensors with identical coords (``ME.cat``)."""
        assert self.stride == other.stride
        return self.replace(feats=jnp.concatenate([self.feats, other.feats], axis=-1))

    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


def masked_mean(feats: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean over valid voxels only."""
    m = mask[..., None].astype(feats.dtype)
    s = jnp.sum(feats * m, axis=axis)
    n = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return s / n
