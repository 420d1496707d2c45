"""k3 kernel-map construction as a Pallas TPU kernel (VMEM-resident grid).

With the sort-free downsample on, the remaining on-device plan cost is
almost entirely the per-level k3 map builds: 27 single-int32 dense-grid
gathers per output voxel, served by XLA's gather engine at the measured
~65 M rows/s (CLAUDE.md) — ~19 ms of the ~85 ms/sample headline budget.

This kernel replaces them the TPU way. The dense level grid's existing
flat layout ``flat(x, y, z) = (x*Y + y)*Z + z`` IS already a z-packed
lane layout: reshaped to ``[R, 128]`` rows (``128 // Z`` (x, y)-columns
per 128-lane row when ``Z | 128``), ONE dynamic-sublane row load serves
all three z-offsets of a neighbor column. A k3 neighborhood is 9 (x, y)
columns x 3 z — so the 27 gathers become 9 VMEM row loads plus three
[128, 128] lane-select reduces (one per z-offset), with the whole grid
VMEM-resident across the level's map build.

Replaces the hash-probe kernel-map construction of MinkowskiEngine's
CoordinateManager (reference: MinkowskiEngine coordinate-map query CUDA
kernels) with dense-grid loads shaped to the TPU memory system.

Mosaic constraints (CLAUDE.md measured notes) shaping it:
- no dynamic lane indexing -> the per-voxel z-lane is selected by an
  iota compare + multiply + lane-sum (exact: at most one lane matches);
- dynamic sublane loads need 32-bit types -> int32 grid (it already is);
- no scalar stores to VMEM -> the 128 row loads per block statically
  unroll into a [128, 128] scratch;
- SMEM blocks obey the trailing-dim rule -> row ids stream as
  ``[B, 9*nblk, 1, 128]``; the 3-sublane output block gets its own array
  dim (``[B, 9, 3, Vp]``) so block dims equal array dims.

Grid of programs: ``(B, nblk, 9)`` with the column offset innermost; the
grid block (1, R, 128) stays resident for a whole sample. Output is
written K-major and transposed to the engine's ``[B, V, 27]`` outside
(cheap int32 relayout vs the gathers it replaces).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # output voxels per program (one sublane tile of row loads)


def _lookup_kernel(grid_ref, row_ref, lane_ref, out_ref, g_ref):
    for j in range(BLK):                          # static unroll
        r = row_ref[0, 0, 0, j]
        g_ref[j, :] = grid_ref[0, r, :]
    lane = lane_ref[0, 0]                         # [BLK, 1] int32
    li = jax.lax.broadcasted_iota(jnp.int32, (BLK, g_ref.shape[-1]), 1)
    g = g_ref[...]
    for dz in range(3):                           # z offsets -1, 0, +1
        sel = (li == (lane + (dz - 1))).astype(jnp.int32)
        out_ref[0, 0, dz, :] = jnp.sum(g * sel, axis=1)


def map_lookup_fits(
    level_cells: int,
    z_cells: int,
    budget_bytes: int = 10 * 2 ** 20,
) -> bool:
    """True when the level's dense grid fits the Pallas VMEM budget with
    the z-packed row layout (z_cells must divide the 128-lane row)."""
    if z_cells <= 0 or 128 % z_cells:
        return False
    rows = -(-level_cells // 128)
    grid = rows * 128 * 4
    scratch = BLK * 128 * 4
    io = 2 * (BLK * 4 + BLK * 4 + 3 * BLK * 4)
    return grid + scratch + io < budget_bytes


@functools.partial(jax.jit, static_argnames=("extent_cells", "v_in",
                                             "interpret"))
def k3_map_lookup_pallas(
    grid_flat: jnp.ndarray,
    out_cells: jnp.ndarray,
    out_mask: jnp.ndarray,
    extent_cells: Tuple[int, int, int],
    v_in: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """k3 kernel map from a dense level grid, one Pallas kernel, batched.

    Semantically identical to ``lookup_kernel_map_dense(grid, v_in,
    out_coords, out_mask, kernel_offsets(3), s, s, extent)`` for
    same-stride k3 maps (every query is stride-divisible) — tested
    bit-equal at primitive and model level.

    Args:
      grid_flat: int32 [B, X*Y*Z] dense grid in ``(x*Y + y)*Z + z`` order
        (from :func:`~situation3d_tpu.sparse.kernel_map.build_level_grid`);
        empty cells hold ``v_in``.
      out_cells: int32 [B, V, 3] output voxel CELL coords (raw // stride).
      out_mask:  bool [B, V].
      extent_cells: static per-level cell extent (X, Y, Z); Z must divide
        128 (checked by :func:`map_lookup_fits` before routing here).
      v_in: miss sentinel (== input-level capacity).

    Returns int32 [B, V, 27] in ``kernel_offsets(3)`` order, miss => v_in.
    """
    B, V = out_mask.shape
    X, Y, Z = extent_cells
    total = X * Y * Z
    assert 128 % Z == 0, Z
    pad_cells = (-total) % 128
    grid = grid_flat
    if pad_cells:
        grid = jnp.pad(grid, ((0, 0), (0, pad_cells)),
                       constant_values=v_in)
    R = (total + pad_cells) // 128
    grid = grid.reshape(B, R, 128)

    pad_v = (-V) % BLK
    Vp = V + pad_v
    nblk = Vp // BLK
    c = out_cells
    if pad_v:
        c = jnp.pad(c, ((0, 0), (0, pad_v), (0, 0)))
        out_mask = jnp.pad(out_mask, ((0, 0), (0, pad_v)))

    # 9 neighbor (x, y) columns per voxel, kernel_offsets order (x slowest)
    dxy = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                   np.int32)                                    # [9, 2]
    qx = c[:, None, :, 0] + dxy[None, :, None, 0]               # [B, 9, Vp]
    qy = c[:, None, :, 1] + dxy[None, :, None, 1]
    col_ok = (qx >= 0) & (qx < X) & (qy >= 0) & (qy < Y)
    col = jnp.clip(qx * Y + qy, 0, X * Y - 1)
    row = jnp.minimum(col * Z // 128, R - 1)
    # z-lane base inside the packed row; invalid columns get an impossible
    # lane so no z-offset selects anything (sum -> 0, masked below)
    zlane = (col * Z) % 128 + c[:, None, :, 2]
    zlane = jnp.where(col_ok, zlane, jnp.int32(-128))

    rows_s = row.reshape(B, 9 * nblk, 1, BLK)
    lanes_v = zlane.reshape(B, 9, nblk * BLK, 1)

    out = pl.pallas_call(
        _lookup_kernel,
        interpret=interpret,
        grid=(B, nblk, 9),
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda b, i, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BLK),
                         lambda b, i, o, nblk=nblk: (b, o * nblk + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, BLK, 1), lambda b, i, o: (b, o, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 3, BLK), lambda b, i, o: (b, o, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 9, 3, Vp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.int32)],
    )(grid, rows_s, lanes_v)

    # validity: z bounds are NOT enforced by the lane select (z-1 == -1
    # selects nothing -> 0, a REAL row id); rebuild the exact mask here.
    # k = o*3 + dz matches kernel_offsets(3) (x slowest) by construction.
    dz = np.array([-1, 0, 1], np.int32)
    qz = c[:, None, :, 2, None] + dz[None, None, None, :]       # [B,9,Vp,3]
    ok = (col_ok[..., None] & (qz >= 0) & (qz < Z)
          & out_mask[:, None, :, None])
    ok = ok.transpose(0, 2, 1, 3).reshape(B, Vp, 27)
    m = out.transpose(0, 3, 1, 2).reshape(B, Vp, 27)
    m = jnp.where(ok, m, jnp.int32(v_in))
    return m[:, :V]
