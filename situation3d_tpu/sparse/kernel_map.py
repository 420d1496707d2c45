"""Jittable sparse-convolution coordinate management.

The TPU-native replacement for MinkowskiEngine's C++/CUDA CoordinateManager
(coordinate hashing + kernel-map construction, the engine behind
``ME.MinkowskiConvolution`` used by ``situation3d/models/mink_unet.py``).

Instead of hash tables, voxel coords are packed into int32 keys per sample,
sorted once per stride level, and neighbor lookups become binary searches
(``searchsorted``) — O(K · V · log V) integer work that XLA compiles into the
same program as the conv compute. Misses map to a sentinel row that gathers
zeros.

Offset/region conventions follow MinkowskiEngine's hypercube kernel:
odd kernels are centered (offsets in ``[-(k-1)/2, (k-1)/2]``), even kernels
are forward-looking (offsets in ``[0, k)``), offsets are in units of the
input tensor stride. The canonical enumeration order is
``itertools.product`` with the x-axis slowest; ``ckpt_compat`` handles any
permutation needed when importing reference weights.
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.ops.voxelize import COORD_BOUND, pack_coords, voxelize_jax

_SENTINEL_KEY = np.int32(np.iinfo(np.int32).max)


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """Integer kernel offsets [K, 3] in the canonical order.

    Odd kernel => centered hypercube; even kernel => [0, k) (MinkowskiEngine
    convention for its strided kernel-2 convs).
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(kernel_size)
    return np.array(list(itertools.product(rng, rng, rng)), dtype=np.int32)


def _sorted_key_table(coords: jnp.ndarray, mask: jnp.ndarray, stride: int):
    """Sorted packed keys + original indices for one sample's voxel set."""
    v = coords.shape[0]
    keys = pack_coords(coords // stride)
    keys = jnp.where(mask, keys, _SENTINEL_KEY)
    idx = jax.lax.broadcasted_iota(jnp.int32, (v, 1), 0).squeeze(-1)
    sorted_keys, sorted_idx = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
    return sorted_keys, sorted_idx


def _lookup(sorted_keys, sorted_idx, query_keys, query_valid, miss):
    # method="sort" lowers to one large sort instead of a sequential
    # binary-search scan — ~4x faster on TPU for our V*K query volumes
    pos = jnp.searchsorted(sorted_keys, query_keys.ravel(), method="sort")
    pos = pos.reshape(query_keys.shape)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[pos] == query_keys) & query_valid
    return jnp.where(hit, sorted_idx[pos], miss).astype(jnp.int32)


@partial(jax.jit, static_argnames=("in_stride", "offset_stride"))
def build_kernel_map(
    in_coords: jnp.ndarray,
    in_mask: jnp.ndarray,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    in_stride: int,
    offset_stride: int,
) -> jnp.ndarray:
    """Neighbor map for a sparse conv, one sample.

    For output voxel j and kernel offset k the input voxel index with
    coords ``out_coords[j] + offsets[k] * offset_stride`` (or the sentinel
    ``V_in`` on miss). vmap over the batch axis.

    Args:
      in_coords:  int32 [V_in, 3] raw-unit coords (multiples of in_stride).
      in_mask:    bool [V_in].
      out_coords: int32 [V_out, 3].
      out_mask:   bool [V_out].
      offsets:    int32 [K, 3] integer kernel offsets.
      in_stride:  tensor stride of the input (packing divisor).
      offset_stride: raw units per offset step (== input tensor stride for
        convs; == output tensor stride for transpose convs).

    Returns:
      int32 [V_out, K] gather indices with miss => V_in.
    """
    v_in = in_coords.shape[0]
    sorted_keys, sorted_idx = _sorted_key_table(in_coords, in_mask, in_stride)

    q = out_coords[:, None, :] + offsets[None, :, :] * offset_stride  # [V_out,K,3]
    # a query is valid if in range and exactly divisible by the input stride
    divisible = jnp.all(q % in_stride == 0, axis=-1)
    in_range = jnp.all((q >= 0) & (q < COORD_BOUND * in_stride), axis=-1)
    valid = divisible & in_range & out_mask[:, None]
    qkeys = pack_coords(jnp.clip(q, 0, COORD_BOUND * in_stride - 1) // in_stride)
    return _lookup(sorted_keys, sorted_idx, qkeys, valid, v_in)


@partial(jax.jit, static_argnames=("in_stride", "extent"))
def build_level_grid(
    in_coords: jnp.ndarray,
    in_mask: jnp.ndarray,
    in_stride: int,
    extent: Tuple[int, int, int],
) -> jnp.ndarray:
    """Dense index grid for one level, one sample: grid[flat(c // stride)]
    = voxel row id, miss sentinel V_in elsewhere.

    The O(1)-probe alternative to the sorted-key tables: one scatter per
    level, then every kernel-map query is a single gather
    (:func:`lookup_kernel_map_dense`). Grid memory is transient
    (~extent/stride^3 x 4 B) and shared by all maps touching the level.

    Returns ``(grid, extent_misses)``: voxels outside the grid extent are
    dropped from the grid (they receive no neighbors) and counted in
    ``extent_misses`` so overflow is reported, never silent.
    """
    v_in = in_coords.shape[0]
    dx, dy, dz = (e // in_stride for e in extent)
    c = in_coords // in_stride
    in_extent = ((c[:, 0] < dx) & (c[:, 1] < dy) & (c[:, 2] < dz)
                 & jnp.all(c >= 0, axis=-1))
    flat = (c[:, 0] * dy + c[:, 1]) * dz + c[:, 2]
    total = dx * dy * dz
    write = jnp.where(in_mask & in_extent, flat, total)
    idx = jax.lax.broadcasted_iota(jnp.int32, (v_in, 1), 0).squeeze(-1)
    grid = jnp.full((total,), jnp.int32(v_in))
    extent_misses = jnp.sum((in_mask & ~in_extent).astype(jnp.int32))
    return grid.at[write].set(idx, mode="drop"), extent_misses


@partial(jax.jit, static_argnames=("in_stride", "offset_stride", "extent"))
def lookup_kernel_map_dense(
    grid: jnp.ndarray,
    v_in: int,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    in_stride: int,
    offset_stride: int,
    extent: Tuple[int, int, int],
) -> jnp.ndarray:
    """Kernel map via dense-grid gathers (same semantics as
    :func:`build_kernel_map`)."""
    dx, dy, dz = (e // in_stride for e in extent)
    q = out_coords[:, None, :] + offsets[None, :, :] * offset_stride
    divisible = jnp.all(q % in_stride == 0, axis=-1)
    qc = q // in_stride
    in_range = ((qc[..., 0] >= 0) & (qc[..., 0] < dx)
                & (qc[..., 1] >= 0) & (qc[..., 1] < dy)
                & (qc[..., 2] >= 0) & (qc[..., 2] < dz))
    valid = divisible & in_range & out_mask[:, None]
    qflat = (qc[..., 0] * dy + qc[..., 1]) * dz + qc[..., 2]
    qflat = jnp.clip(qflat, 0, grid.shape[0] - 1)
    return jnp.where(valid, grid[qflat], v_in).astype(jnp.int32)


@partial(jax.jit, static_argnames=("in_stride", "extent", "pad"))
def build_level_grid_padded(
    in_coords: jnp.ndarray,
    in_mask: jnp.ndarray,
    in_stride: int,
    extent: Tuple[int, int, int],
    pad: int = 2,
) -> jnp.ndarray:
    """Dense index grid with a ``pad``-cell sentinel ring on every face.

    The ring makes whole-neighborhood *block* gathers
    (:func:`lookup_kernel_map_block`) exact at the boundary: any query that
    steps outside the true extent lands in the ring and reads the miss
    sentinel — no per-offset range mask needed. ``pad=2`` covers kernel 5.

    Returns ``(grid [(dx+2p)*(dy+2p)*(dz+2p)], extent_misses)``.
    """
    v_in = in_coords.shape[0]
    dx, dy, dz = (e // in_stride for e in extent)
    dyp, dzp = dy + 2 * pad, dz + 2 * pad
    c = in_coords // in_stride
    in_extent = ((c[:, 0] < dx) & (c[:, 1] < dy) & (c[:, 2] < dz)
                 & jnp.all(c >= 0, axis=-1))
    flat = ((c[:, 0] + pad) * dyp + (c[:, 1] + pad)) * dzp + (c[:, 2] + pad)
    total = (dx + 2 * pad) * dyp * dzp
    write = jnp.where(in_mask & in_extent, flat, total)
    idx = jax.lax.broadcasted_iota(jnp.int32, (v_in, 1), 0).squeeze(-1)
    grid = jnp.full((total,), jnp.int32(v_in))
    extent_misses = jnp.sum((in_mask & ~in_extent).astype(jnp.int32))
    return grid.at[write].set(idx, mode="drop"), extent_misses


@partial(jax.jit, static_argnames=("ksize", "min_off", "in_stride", "extent",
                                   "pad"))
def lookup_kernel_map_block(
    grid: jnp.ndarray,
    v_in: int,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    ksize: int,
    min_off: int,
    in_stride: int,
    extent: Tuple[int, int, int],
    pad: int = 2,
) -> jnp.ndarray:
    """Kernel map via one (k, k, k) block gather per output voxel.

    Requires the kernel's offsets to step one input-grid cell per axis —
    true for the same-stride odd kernels (k3/k5, offsets*stride == one
    cell) and the strided kernel-2 down maps. One ``lax.gather`` row of
    k^3 contiguous cells replaces k^3 single-element gathers; measured
    ~70 M single rows/s on v5e made the elementwise path the dominant
    plan cost (k5 at V=49152, B=8: 734 ms -> block path ~ms scale).

    Args:
      grid: padded flat grid from :func:`build_level_grid_padded`.
      ksize/min_off: kernel size and minimum offset in cells (odd k:
        -(k-1)//2; k2 down maps: 0).
    Returns int32 [V_out, ksize^3] in kernel_offsets order (x slowest).
    """
    dx, dy, dz = (e // in_stride for e in extent)
    dxp, dyp, dzp = dx + 2 * pad, dy + 2 * pad, dz + 2 * pad
    grid3 = grid.reshape(dxp, dyp, dzp)
    qc = out_coords // in_stride
    # out-of-extent voxels (already counted as extent_misses at grid build)
    # get all-miss rows; masked rows carry zeros -> start in bounds
    row_ok = out_mask & jnp.all(qc >= 0, axis=-1) \
        & (qc[:, 0] < dx) & (qc[:, 1] < dy) & (qc[:, 2] < dz)
    starts = jnp.clip(qc + (pad + min_off), 0, jnp.asarray(
        [dxp - ksize, dyp - ksize, dzp - ksize], jnp.int32))
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    blocks = jax.lax.gather(
        grid3, starts, dn, slice_sizes=(ksize, ksize, ksize),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    blocks = blocks.reshape(out_coords.shape[0], ksize ** 3)
    return jnp.where(row_ok[:, None], blocks, v_in).astype(jnp.int32)


@partial(jax.jit, static_argnames=("in_stride", "offset_stride", "extent",
                                   "pad"))
def lookup_kernel_map_dense_padded(
    grid: jnp.ndarray,
    v_in: int,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    in_stride: int,
    offset_stride: int,
    extent: Tuple[int, int, int],
    pad: int = 2,
) -> jnp.ndarray:
    """Elementwise kernel map against the *padded* grid — for kernels whose
    offsets don't step whole input cells (the mirrored k2 transpose-conv
    up maps, offsets of half an input cell)."""
    dx, dy, dz = (e // in_stride for e in extent)
    dyp, dzp = dy + 2 * pad, dz + 2 * pad
    q = out_coords[:, None, :] + offsets[None, :, :] * offset_stride
    divisible = jnp.all(q % in_stride == 0, axis=-1)
    qc = q // in_stride
    in_range = ((qc[..., 0] >= 0) & (qc[..., 0] < dx)
                & (qc[..., 1] >= 0) & (qc[..., 1] < dy)
                & (qc[..., 2] >= 0) & (qc[..., 2] < dz))
    valid = divisible & in_range & out_mask[:, None]
    qflat = ((qc[..., 0] + pad) * dyp + (qc[..., 1] + pad)) * dzp \
        + (qc[..., 2] + pad)
    qflat = jnp.clip(qflat, 0, grid.shape[0] - 1)
    return jnp.where(valid, grid[qflat], v_in).astype(jnp.int32)


@partial(jax.jit, static_argnames=("factor", "capacity"))
def downsample_coords(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    factor: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Output coordinates of a strided conv, one sample.

    ME semantics: new coords = unique(floor(c / new_stride) * new_stride),
    new_stride = stride * factor.

    Returns (out_coords int32 [capacity, 3] in raw units, out_mask [capacity],
    dropped) where ``dropped`` counts unique voxels beyond ``capacity`` —
    those merge into the last slot (graceful, reported degradation rather
    than a crash; raise the per-stride capacity if it is ever non-zero).
    vmap over batch.
    """
    new_stride = stride * factor
    down = coords // new_stride
    uc, um, _, nu = voxelize_jax(down, mask, capacity)
    dropped = jnp.maximum(nu - capacity, 0)
    return uc * new_stride, um, dropped


@partial(jax.jit, static_argnames=("stride", "factor", "capacity", "extent"))
def downsample_coords_dense(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    factor: int,
    capacity: int,
    extent: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-free :func:`downsample_coords` via grid occupancy + cumsum
    compaction.

    The sort path costs one ``lax.sort`` of the full voxel set per level
    per sample (4 sorts/sample/forward — a large share of the measured
    ~30 ms/sample on-device plan cost). Here dedup is: scatter occupancy
    bits into the coarse dense grid, prefix-sum the grid to assign each
    occupied cell its rank, and scatter coords into their rank slot —
    all bandwidth-bound passes with no sort. Output order is ascending
    flat-grid order == ascending packed-key order (both lexicographic in
    (x, y, z)), so for in-extent scenes the result is **bit-identical**
    to the sort path (tested). Sole semantic difference: voxels outside
    ``extent`` are dropped here (counted in ``dropped``) where the sort
    path keeps them — under ``dense_lookup`` such voxels already receive
    no neighbors, so nothing downstream changes.

    Returns (out_coords int32 [capacity, 3] raw units, out_mask,
    dropped) like :func:`downsample_coords`. vmap over batch.
    """
    new_stride = stride * factor
    dx, dy, dz = (e // new_stride for e in extent)
    total = dx * dy * dz
    c = coords // new_stride
    in_ext = (mask & jnp.all(c >= 0, axis=-1)
              & (c[:, 0] < dx) & (c[:, 1] < dy) & (c[:, 2] < dz))
    flat = (c[:, 0] * dy + c[:, 1]) * dz + c[:, 2]
    flat_w = jnp.where(in_ext, flat, total)
    occ = jnp.zeros((total,), jnp.int32).at[flat_w].max(1, mode="drop")
    pos = jnp.cumsum(occ)                       # inclusive rank, 1-based
    n_unique = pos[-1]
    flat_r = jnp.where(in_ext, flat, 0)
    rank = pos[flat_r]                          # 1-based rank of the cell
    slot = rank - 1
    # capacity overflow mirrors downsample_coords exactly: overflowing
    # uniques "merge into the last slot" with the LARGEST key winning
    # (the sort path overwrites slot cap-1 in ascending key order) —
    # here only the max-rank cell writes it, keeping scatter collisions
    # deterministic
    keep = (slot < capacity - 1) | ((n_unique <= capacity)
                                    & (slot < capacity)) \
        | (rank == n_unique)
    write = jnp.where(in_ext & keep, jnp.minimum(slot, capacity - 1),
                      capacity)
    out = jnp.zeros((capacity, 3), jnp.int32).at[write].set(
        c * new_stride, mode="drop")
    out_mask = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0) \
        .squeeze(-1) < jnp.minimum(n_unique, capacity)
    dropped = jnp.maximum(n_unique - capacity, 0) \
        + jnp.sum((mask & ~in_ext).astype(jnp.int32))
    return out, out_mask, dropped


@partial(jax.jit, static_argnames=("stride", "factor", "capacity", "extent"))
def downsample_with_down_map(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    factor: int,
    capacity: int,
    extent: Tuple[int, int, int],
):
    """:func:`downsample_coords_dense` + the strided kernel-2 down map as a
    byproduct.

    The k2 down map (``[V_out, 8]`` — for each coarse voxel and offset in
    ``[0, 2)^3`` fine-stride units, the fine voxel index) is normally 8
    grid gathers per coarse voxel. But every fine voxel determines its
    entry directly: its coarse cell's output ``slot`` and its parity
    ``(c // stride) & 1`` per axis give ``map[slot, (ox*2+oy)*2+oz] = v``
    — and (cell, parity) <-> fine coord is a bijection, so the scatter is
    collision-free (deterministic). V_in writes replace 8*V_out gathers
    and the fine-level grid is not touched at all.

    Offset order matches ``kernel_offsets(2)`` (x slowest), so the result
    is exactly ``lookup_kernel_map_dense(fine_grid, ..., k2, ...)``
    restricted to in-extent voxels (tested). Returns
    ``(out_coords, out_mask, dropped, down_map [capacity, 8])``.
    """
    new_stride = stride * factor
    dx, dy, dz = (e // new_stride for e in extent)
    total = dx * dy * dz
    v_in = coords.shape[0]
    c = coords // new_stride
    in_ext = (mask & jnp.all(c >= 0, axis=-1)
              & (c[:, 0] < dx) & (c[:, 1] < dy) & (c[:, 2] < dz))
    flat = (c[:, 0] * dy + c[:, 1]) * dz + c[:, 2]
    flat_w = jnp.where(in_ext, flat, total)
    occ = jnp.zeros((total,), jnp.int32).at[flat_w].max(1, mode="drop")
    pos = jnp.cumsum(occ)
    n_unique = pos[-1]
    flat_r = jnp.where(in_ext, flat, 0)
    rank = pos[flat_r]
    slot = rank - 1
    keep = (slot < capacity - 1) | ((n_unique <= capacity)
                                    & (slot < capacity)) \
        | (rank == n_unique)
    write = jnp.where(in_ext & keep, jnp.minimum(slot, capacity - 1),
                      capacity)
    out = jnp.zeros((capacity, 3), jnp.int32).at[write].set(
        c * new_stride, mode="drop")
    out_mask = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0) \
        .squeeze(-1) < jnp.minimum(n_unique, capacity)
    dropped = jnp.maximum(n_unique - capacity, 0) \
        + jnp.sum((mask & ~in_ext).astype(jnp.int32))

    # down map: parity of the fine coord inside its coarse cell. The same
    # `keep` rule as the coord scatter, so on capacity overflow row cap-1
    # holds the WINNING (largest-key) cell's neighbors, matching its coords
    p = (coords // stride) & (factor - 1)                  # [V, 3] in [0, f)
    o = (p[:, 0] * factor + p[:, 1]) * factor + p[:, 2]    # kernel_offsets
    map_slot = jnp.where(in_ext & keep, jnp.minimum(slot, capacity - 1),
                         capacity)
    idx = jax.lax.broadcasted_iota(jnp.int32, (v_in, 1), 0).squeeze(-1)
    down_map = jnp.full((capacity, factor ** 3), jnp.int32(v_in)) \
        .at[map_slot, o].set(idx, mode="drop")

    # up map (transpose conv, mirrored offsets): for a fine voxel only the
    # query at its own parity offset is divisible by the output stride, so
    # the whole [V_in, 8] map is one scatter of the coarse slot into that
    # column — no coarse-grid lookups at all
    ok_up = in_ext & keep
    up_map = jnp.full((v_in, factor ** 3), jnp.int32(capacity)) \
        .at[jnp.where(ok_up, idx, v_in), o].set(
            jnp.where(ok_up, jnp.minimum(slot, capacity - 1), capacity),
            mode="drop")
    return out, out_mask, dropped, down_map, up_map


def gather_neighbors(feats: jnp.ndarray, nbr_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features with a zero row for misses.

    Args: feats [B, V_in, C]; nbr_idx int32 [B, V_out, K] (miss == V_in).
    Returns [B, V_out, K, C].
    """
    B, V_in, C = feats.shape
    padded = jnp.concatenate([feats, jnp.zeros((B, 1, C), feats.dtype)], axis=1)
    _, V_out, K = nbr_idx.shape
    flat = nbr_idx.reshape(B, V_out * K)
    out = jnp.take_along_axis(padded, flat[..., None], axis=1)
    return out.reshape(B, V_out, K, C)
