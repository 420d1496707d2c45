"""Voxelization / sparse quantization.

Replaces the reference's host-side voxelizer
(``lib/openscene/voxelizer_dev.py:35-55`` and
``lib/openscene/voxelization_utils.py:44-137``, which hash integer voxel
coords and dedup with ``np.unique``).

Two paths:

* :func:`sparse_quantize_np` / :func:`voxelize_np` — NumPy host path used by
  the data pipeline (the reference voxelizes inside DataLoader workers); a
  C++ fast path (native/voxelhash.cpp) overrides these when built.
* :func:`voxelize_jax` — fully jittable fixed-capacity device path: packs
  per-sample voxel coords into int32 keys, sorts, dedups with head flags and
  emits padded ``[V,3]`` unique coords + inverse map + mask. This is what
  lets the whole sparse-conv pipeline live inside one XLA program.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-axis coordinate bound for int32 key packing: 3 * 10 bits = 30 bits < 31.
COORD_BITS = 10
COORD_BOUND = 1 << COORD_BITS  # 1024 voxels per axis (20.5 m at 0.02 m)


# ---------------------------------------------------------------------------
# Host (NumPy) path
# ---------------------------------------------------------------------------

def sparse_quantize_np(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dedup integer voxel coords.

    Returns ``(first_index, inverse)`` where ``first_index`` indexes the first
    occurrence (in original order) of each unique coord and ``inverse`` maps
    every input row to its unique id. Matches the reference's
    ``sparse_quantize(..., return_index=True, return_inverse=True)``.
    """
    coords = np.ascontiguousarray(coords.astype(np.int64))
    # lexicographic key; bounds here are generous because int64
    mins = coords.min(axis=0)
    shifted = coords - mins
    spans = shifted.max(axis=0) + 1
    key = (shifted[:, 0] * spans[1] + shifted[:, 1]) * spans[2] + shifted[:, 2]
    # stable unique-by-first-occurrence
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    head = np.ones(len(key), dtype=bool)
    head[1:] = sorted_key[1:] != sorted_key[:-1]
    unique_id_sorted = np.cumsum(head) - 1
    inverse = np.empty(len(key), dtype=np.int64)
    inverse[order] = unique_id_sorted
    first_index = order[head]
    return first_index, inverse


def voxelize_np(
    points: np.ndarray, voxel_size: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize float points to voxel coords and dedup.

    Returns ``(voxel_coords[int32 M,3], first_index[M], inverse[N])``.
    Mirrors ``Voxelizer.voxelize`` (scale by 1/voxel_size, floor, translate to
    zero-min, dedup keeping first occurrence).
    """
    coords = np.floor(points / voxel_size).astype(np.int64)
    coords -= coords.min(axis=0)
    first_index, inverse = sparse_quantize_np(coords)
    return coords[first_index].astype(np.int32), first_index, inverse


# ---------------------------------------------------------------------------
# Device (JAX) path — fixed capacity, jittable
# ---------------------------------------------------------------------------

def pack_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """Pack non-negative int coords [..., 3] (< COORD_BOUND each) into int32 keys."""
    c = coords.astype(jnp.int32)
    return (c[..., 0] << (2 * COORD_BITS)) | (c[..., 1] << COORD_BITS) | c[..., 2]


def unpack_coords(keys: jnp.ndarray) -> jnp.ndarray:
    mask = COORD_BOUND - 1
    x = (keys >> (2 * COORD_BITS)) & mask
    y = (keys >> COORD_BITS) & mask
    z = keys & mask
    return jnp.stack([x, y, z], axis=-1)


@partial(jax.jit, static_argnames=("capacity",))
def voxelize_jax(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jittable per-sample dedup of integer voxel coords with fixed capacity.

    Args:
      coords: int32 [N, 3] non-negative voxel coords (padding rows arbitrary).
      valid:  bool  [N] input-point validity mask.
      capacity: static output voxel budget V.

    Returns:
      unique_coords: int32 [V, 3] (padding rows zero).
      unique_mask:   bool  [V].
      inverse:       int32 [N] id into unique rows (padding points map to V-1's
                     slot but are masked).
      num_unique:    int32 scalar.

    vmap over a batch axis for [B, N, 3] inputs.
    """
    n = coords.shape[0]
    keys = pack_coords(jnp.clip(coords, 0, COORD_BOUND - 1))
    # push invalid rows to the end of the sort with a sentinel key
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    keys = jnp.where(valid, keys, sentinel)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # stable sort keeps original order within equal keys -> first occurrence wins
    sorted_keys, sorted_idx = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_keys[1:] != sorted_keys[:-1]]
    )
    head = head & (sorted_keys != sentinel)
    unique_id_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    num_unique = jnp.sum(head.astype(jnp.int32))
    # clamp ids into [0, capacity)
    uid = jnp.clip(unique_id_sorted, 0, capacity - 1)
    # scatter first-occurrence coords into the unique table; only head rows
    # write (others aimed out of range and dropped)
    write_slot = jnp.where(head, uid, capacity)
    unique_keys = jnp.zeros((capacity,), jnp.int32)
    unique_keys = unique_keys.at[write_slot].set(sorted_keys, mode="drop")
    unique_coords = unpack_coords(unique_keys)
    unique_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).squeeze(-1) < num_unique
    )
    unique_coords = jnp.where(unique_mask[:, None], unique_coords, 0)
    # inverse map back to original order
    inverse = jnp.zeros((n,), jnp.int32).at[sorted_idx].set(uid)
    inverse = jnp.where(valid, inverse, 0)
    return unique_coords, unique_mask, inverse, num_unique
