"""2D -> 3D feature back-projection (multiview path).

TPU-native re-implementation of ``lib/projection.py`` (ProjectionHelper:
frustum tests + depth-consistent point<->pixel correspondence at
``compute_projection:191``, and the ``Projection`` autograd Function at
``:283`` that scatters 2D CNN features onto 3D points). Here the whole pass
is one jittable gather: project points through the camera, validate against
the depth map, gather per-point image features; XLA fuses the projection
math into the gather (the "single gather/scatter kernel" of the north star)
and autodiff provides the deterministic scatter-add backward into the 2D
feature map.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CameraIntrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float


def project_points(
    points: jnp.ndarray,
    world2cam: jnp.ndarray,
    intr: CameraIntrinsics,
    image_hw: Tuple[int, int],
    depth: jnp.ndarray = None,
    depth_min: float = 0.1,
    depth_max: float = 8.0,
    depth_thresh: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point -> pixel correspondence with frustum + depth-consistency tests.

    Args:
      points: [N, 3] world coords.
      world2cam: [4, 4].
      intr: camera intrinsics.
      image_hw: (H, W) static.
      depth: optional [H, W] depth map for occlusion testing.

    Returns (pix [N, 2] int32 (row, col), valid [N] bool).
    """
    H, W = image_hw
    ones = jnp.ones_like(points[:, :1])
    cam = (jnp.concatenate([points, ones], -1) @ world2cam.T)[:, :3]
    z = cam[:, 2]
    u = intr.fx * cam[:, 0] / jnp.where(z == 0, 1e-6, z) + intr.cx
    v = intr.fy * cam[:, 1] / jnp.where(z == 0, 1e-6, z) + intr.cy
    col = jnp.round(u).astype(jnp.int32)
    row = jnp.round(v).astype(jnp.int32)
    valid = ((z > depth_min) & (z < depth_max)
             & (col >= 0) & (col < W) & (row >= 0) & (row < H))
    if depth is not None:
        rc = jnp.clip(row, 0, H - 1)
        cc = jnp.clip(col, 0, W - 1)
        d = depth[rc, cc]
        valid = valid & (jnp.abs(d - z) <= depth_thresh) & (d > 0)
    pix = jnp.stack([jnp.clip(row, 0, H - 1), jnp.clip(col, 0, W - 1)], -1)
    return pix, valid


def backproject_features(
    feat2d: jnp.ndarray,
    pix: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Gather image features onto points; invalid points get zeros.

    Args: feat2d [H, W, C]; pix [N, 2] int32; valid [N].
    Returns [N, C]. Differentiable: the backward is XLA's deterministic
    scatter-add into feat2d (replacing the reference's atomic scatter).
    """
    gathered = feat2d[pix[:, 0], pix[:, 1]]
    return jnp.where(valid[:, None], gathered, 0)


def multiview_backproject(
    points: jnp.ndarray,
    feats2d: jnp.ndarray,
    world2cams: jnp.ndarray,
    intr: CameraIntrinsics,
    depths: jnp.ndarray = None,
    reduce: str = "mean",
) -> jnp.ndarray:
    """Fuse V views onto one point cloud (ScanRefer-style multiview features).

    Args: points [N,3]; feats2d [V,H,W,C]; world2cams [V,4,4];
    depths optional [V,H,W]. Returns [N, C].
    """
    V, H, W, C = feats2d.shape

    if depths is not None:
        def one_view(f2d, w2c, depth):
            pix, valid = project_points(points, w2c, intr, (H, W), depth)
            return backproject_features(f2d, pix, valid), valid
        feats, valids = jax.vmap(one_view)(feats2d, world2cams, depths)
    else:
        def one_view(f2d, w2c):
            pix, valid = project_points(points, w2c, intr, (H, W), None)
            return backproject_features(f2d, pix, valid), valid
        feats, valids = jax.vmap(one_view)(feats2d, world2cams)
    w = valids.astype(feats.dtype)[..., None]
    if reduce == "mean":
        return jnp.sum(feats * w, 0) / jnp.maximum(jnp.sum(w, 0), 1.0)
    return jnp.max(jnp.where(w > 0, feats, -jnp.inf), 0).clip(min=0)
