"""Sinusoidal positional encodings.

``voxel_position_table`` reproduces the reference's precomputed
``PositionalEncoding1D(1408 // 3)`` table over 256 positions
(``blip2_t5.py:93-99``): interleaved sin/cos with an even internal channel
count truncated back to the odd 469 channels. ``voxel_position_embedding``
applies it per xyz axis and concatenates (``blip2_t5.py:106-118``), zero-
padding the final 1407 -> 1408 channel.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def voxel_position_table(channels: int, n_pos: int = 256) -> np.ndarray:
    """[n_pos, channels] interleaved sin/cos table (PositionalEncoding1D)."""
    c2 = channels + (channels % 2)  # round up to even like the reference lib
    inv_freq = 1.0 / (10000 ** (np.arange(0, c2, 2, dtype=np.float64) / c2))
    pos = np.arange(n_pos, dtype=np.float64)[:, None]
    ang = pos * inv_freq[None, :]
    table = np.zeros((n_pos, c2), np.float32)
    table[:, 0::2] = np.sin(ang)
    table[:, 1::2] = np.cos(ang)
    return table[:, :channels]


def voxel_position_embedding(pc: jnp.ndarray, feat_dim: int,
                             table: jnp.ndarray) -> jnp.ndarray:
    """Per-axis table lookup, concatenated into [B, N, feat_dim].

    pc: int voxel coords [B, N, 3] (clamped into the table range).
    """
    n_pos, channels = table.shape
    idx = jnp.clip(pc.astype(jnp.int32), 0, n_pos - 1)
    parts = [table[idx[..., i]] for i in range(3)]
    emb = jnp.concatenate(parts, axis=-1)  # [B, N, 3*channels]
    pad = feat_dim - emb.shape[-1]
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (0, 0), (0, pad)))
    return emb[..., :feat_dim]
