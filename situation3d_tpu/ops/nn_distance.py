"""Chamfer-style nearest-neighbor distance + huber loss.

Re-implements ``situation3d/utils/nn_distance.py`` (``nn_distance:25``,
``huber_loss:6``): pairwise O(N*M) distances with per-side nearest neighbor,
optionally L1.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def huber_loss(error: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    abs_err = jnp.abs(error)
    quad = jnp.minimum(abs_err, delta)
    lin = abs_err - quad
    return 0.5 * quad ** 2 + delta * lin


def nn_distance(pc1: jnp.ndarray, pc2: jnp.ndarray, l1smooth: bool = False,
                delta: float = 1.0, l1: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Args: pc1 [B, N, C], pc2 [B, M, C].

    Returns (dist1 [B,N], idx1 [B,N], dist2 [B,M], idx2 [B,M]) where dist is
    the summed per-coordinate squared (or l1/huber) distance to the nearest
    point on the other side.
    """
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]       # [B, N, M, C]
    if l1smooth:
        d = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sum(diff ** 2, axis=-1)
    idx1 = jnp.argmin(d, axis=2).astype(jnp.int32)
    dist1 = jnp.min(d, axis=2)
    idx2 = jnp.argmin(d, axis=1).astype(jnp.int32)
    dist2 = jnp.min(d, axis=1)
    return dist1, idx1, dist2, idx2
