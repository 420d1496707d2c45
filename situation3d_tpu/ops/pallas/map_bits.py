"""Level-1 k3 kernel maps from a bit-packed VMEM occupancy grid.

`ops/pallas/map_lookup.py` serves k3 maps from a VMEM-resident int32
level grid — but only where the grid fits (~10 MB): at the default
extent that is levels 2-4. Level 1's grid is 8.4 M cells = 33.5 MB and
can never be VMEM-resident on a ~16 MB/core part, so its map build (the
single largest remaining plan item, ~20 ms/sample of the 27 ms plan,
DESIGN.md §10) stays on the XLA gather engine at ~65 M rows/s.

This kernel shrinks the TABLE instead of blocking it: with the sort-free
dense downsample (`sparse.dense_downsample`, default ON) every level-i
(i>=1) voxel table is EXACTLY the occupied cells of the level grid in
ascending flat order — so ``grid[flat] == rank of flat among occupied
cells``. Store 1 occupancy BIT per cell (1.05 MB for level 1) plus one
int32 exclusive prefix-popcount per 32-cell word (1.05 MB) and the row
id reconstructs as::

    row = pfx[flat >> 5] + popcount(bits[flat >> 5] & ((1 << (flat&31)) - 1))

Both tables are VMEM-resident; 27 HBM map gathers per output voxel
become 9 packed-row loads x 2 tables plus VPU bit math. The 33.5 MB
dense int32 grid build is dead code once nothing consumes it (XLA DCE).

Replaces the same MinkowskiEngine CoordinateManager hash-probe queries
as map_lookup.py (reference: MinkowskiEngine coordinate-map CUDA
kernels), for the level-1 shape class.

Layout: flat(x,y,z) = (x*Y + y)*Z + z; word w = flat >> 5. With
``Z % 32 == 0`` a z-column owns ``Zw = Z//32`` whole words at base
``col * Zw``; with ``Zw | 128`` all of a column's words share one
128-lane row (lane base ``(col*Zw) % 128``). The 3 z-offsets of a query
span at most 2 consecutive words (3 bits can't straddle 3 words):
word(z-1) ("Lo") and word(z+1) ("Hi"), both in the column's row, with
word(z) == Hi iff ``z % 32 == 0`` else Lo.

Mosaic constraints (CLAUDE.md): no dynamic lane indexing -> lane-select
by iota compare + multiply + row-sum; arithmetic (not logical) int32
right shift -> the popcount bit-twiddle masks are chosen sign-safe;
scalar row ids stream through SMEM as [., ., 1, 128] blocks.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # output voxels per program


def _popcount32(v):
    """Per-lane popcount of int32, safe under arithmetic right shift
    (every mask that meets a shifted value has bit 31 clear)."""
    m1 = jnp.int32(0x55555555)
    m2 = jnp.int32(0x33333333)
    m4 = jnp.int32(0x0F0F0F0F)
    v = v - ((v >> 1) & m1)
    v = (v & m2) + ((v >> 2) & m2)
    v = (v + (v >> 4)) & m4
    return (v * jnp.int32(0x01010101)) >> 24


def _bits_kernel(v_in, bits_ref, pfx_ref, row_ref, lo_ref, hi_ref, z_ref,
                 out_ref, gb_ref, gp_ref):
    for j in range(BLK):                          # static unroll
        r = row_ref[0, 0, 0, j]
        gb_ref[j, :] = bits_ref[0, r, :]
        gp_ref[j, :] = pfx_ref[0, r, :]
    li = jax.lax.broadcasted_iota(jnp.int32, (BLK, gb_ref.shape[-1]), 1)
    gb = gb_ref[...]
    gp = gp_ref[...]
    lo = lo_ref[0, 0]                             # [BLK, 1] int32 lanes
    hi = hi_ref[0, 0]
    zv = z_ref[0]                                 # [BLK, 1] cell z
    sel_lo = (li == lo).astype(jnp.int32)
    sel_hi = (li == hi).astype(jnp.int32)
    w_lo = jnp.sum(gb * sel_lo, axis=1, keepdims=True)
    p_lo = jnp.sum(gp * sel_lo, axis=1, keepdims=True)
    w_hi = jnp.sum(gb * sel_hi, axis=1, keepdims=True)
    p_hi = jnp.sum(gp * sel_hi, axis=1, keepdims=True)
    z_at_word0 = (zv & 31) == 0                   # word(z)==Hi iff z%32==0
    one = jnp.int32(1)
    miss = jnp.int32(v_in)
    for dz in range(3):                           # z offsets -1, 0, +1
        zq = zv + (dz - 1)
        if dz == 0:
            w, p = w_lo, p_lo
        elif dz == 2:
            w, p = w_hi, p_hi
        else:
            w = jnp.where(z_at_word0, w_hi, w_lo)
            p = jnp.where(z_at_word0, p_hi, p_lo)
        b = zq & 31                               # garbage-safe for zq=-1
        occ = (w >> b) & one
        low = (one << b) - one                    # b==31 wraps to 0x7fffffff
        rank = p + _popcount32(w & low)
        out_ref[0, 0, dz, :] = jnp.where(occ == one, rank, miss)[:, 0]


def map_bits_fits(
    level_cells: int,
    z_cells: int,
    budget_bytes: int = 10 * 2 ** 20,
) -> bool:
    """True when the bit-packed occupancy + prefix tables fit the Pallas
    VMEM budget with the word-packed row layout."""
    if z_cells <= 0 or z_cells % 32:
        return False
    zw = z_cells // 32
    if 128 % zw:
        return False
    words = -(-level_cells // 32)
    rows = -(-words // 128)
    tables = 2 * rows * 128 * 4
    scratch = 2 * BLK * 128 * 4
    io = 2 * (BLK * 4 * 3 + BLK * 4 + 3 * BLK * 4)
    return tables + scratch + io < budget_bytes


@functools.partial(jax.jit, static_argnames=("stride", "extent"))
def build_level_bits(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    extent: Tuple[int, int, int],
):
    """Occupancy bits + exclusive prefix popcount for one level, one
    sample (vmap over batch).

    Valid ONLY for levels whose voxel table is unique and ascending in
    flat-cell order — i.e. levels produced by the dense downsample
    (kernel_map.downsample_coords_dense order guarantee). Then
    ``pfx[w] + popcount(bits[w] & low(bit))`` IS the voxel row id.

    Returns (bits int32 [Wp], pfx int32 [Wp]) with Wp padded to 128.
    """
    dx, dy, dz = (e // stride for e in extent)
    total = dx * dy * dz
    words = -(-total // 32)
    wp = words + ((-words) % 128)
    c = coords // stride
    in_ext = (mask & jnp.all(c >= 0, axis=-1)
              & (c[:, 0] < dx) & (c[:, 1] < dy) & (c[:, 2] < dz))
    flat = (c[:, 0] * dy + c[:, 1]) * dz + c[:, 2]
    w = jnp.where(in_ext, flat >> 5, wp)
    add = jnp.left_shift(jnp.int32(1), flat & 31)
    # cells are unique -> distinct powers of two per word: add == or
    bits = jnp.zeros((wp,), jnp.int32).at[w].add(
        jnp.where(in_ext, add, 0), mode="drop")
    pc = _popcount32(bits)
    pfx = jnp.cumsum(pc) - pc                     # exclusive
    return bits, pfx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("extent_cells", "v_in",
                                             "interpret"))
def k3_map_lookup_bits(
    bits: jnp.ndarray,
    pfx: jnp.ndarray,
    out_cells: jnp.ndarray,
    out_mask: jnp.ndarray,
    extent_cells: Tuple[int, int, int],
    v_in: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """k3 kernel map from bit-packed occupancy, one Pallas kernel, batched.

    Semantically identical to ``lookup_kernel_map_dense(grid, v_in,
    out_coords, out_mask, kernel_offsets(3), s, s, extent)`` when the
    level's voxels are the grid's occupied cells in ascending flat order
    (tested bit-equal at primitive and model level).

    Args:
      bits: int32 [B, Wp] occupancy words from :func:`build_level_bits`.
      pfx:  int32 [B, Wp] exclusive prefix popcounts.
      out_cells: int32 [B, V, 3] output voxel CELL coords (raw // stride).
      out_mask:  bool [B, V].
      extent_cells: static per-level cell extent (X, Y, Z); Z % 32 == 0
        and (Z//32) | 128 (checked by :func:`map_bits_fits`).
      v_in: miss sentinel (== input-level capacity).

    Returns int32 [B, V, 27] in ``kernel_offsets(3)`` order, miss => v_in.
    """
    B, V = out_mask.shape
    X, Y, Z = extent_cells
    zw = Z // 32
    wp = bits.shape[1]
    assert wp % 128 == 0, wp
    R = wp // 128
    bits = bits.reshape(B, R, 128)
    pfx = pfx.reshape(B, R, 128)

    pad_v = (-V) % BLK
    Vp = V + pad_v
    nblk = Vp // BLK
    c = out_cells
    if pad_v:
        c = jnp.pad(c, ((0, 0), (0, pad_v), (0, 0)))
        out_mask = jnp.pad(out_mask, ((0, 0), (0, pad_v)))

    dxy = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                   np.int32)                                    # [9, 2]
    qx = c[:, None, :, 0] + dxy[None, :, None, 0]               # [B, 9, Vp]
    qy = c[:, None, :, 1] + dxy[None, :, None, 1]
    col_ok = (qx >= 0) & (qx < X) & (qy >= 0) & (qy < Y)
    col = jnp.clip(qx * Y + qy, 0, X * Y - 1)
    wb = col * zw
    row = jnp.minimum(wb >> 7, R - 1)
    lb = wb & 127
    zv = c[:, :, 2]                                             # [B, Vp]
    lo = lb + ((zv[:, None, :] - 1) >> 5)
    hi = lb + ((zv[:, None, :] + 1) >> 5)
    # invalid columns / out-of-column words select no lane -> word 0,
    # pfx 0 -> occ 0 -> miss inside; exact mask rebuilt outside anyway.
    # Lo/Hi validity is INDEPENDENT: at z==0 only Lo is out of column
    # (dz=0 reads Hi there), at z==Z-1 only Hi is (dz=0 reads Lo).
    lo = jnp.where(col_ok & (lo >= lb), lo, jnp.int32(-128))
    hi = jnp.where(col_ok & (hi < lb + zw), hi, jnp.int32(-128))

    rows_s = row.reshape(B, 9 * nblk, 1, BLK)
    lo_v = lo.reshape(B, 9, nblk * BLK, 1)
    hi_v = hi.reshape(B, 9, nblk * BLK, 1)
    z_v = jnp.clip(zv, 0, Z - 1).reshape(B, nblk * BLK, 1)

    out = pl.pallas_call(
        functools.partial(_bits_kernel, v_in),
        interpret=interpret,
        grid=(B, nblk, 9),
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda b, i, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda b, i, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BLK),
                         lambda b, i, o, nblk=nblk: (b, o * nblk + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, BLK, 1), lambda b, i, o: (b, o, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK, 1), lambda b, i, o: (b, o, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, 1), lambda b, i, o: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 3, BLK), lambda b, i, o: (b, o, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 9, 3, Vp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.int32),
                        pltpu.VMEM((BLK, 128), jnp.int32)],
    )(bits, pfx, rows_s, lo_v, hi_v, z_v)

    # exact validity mask, identical to map_lookup.py: bounds are NOT
    # enforced in-kernel (garbage ranks possible for clamped queries)
    dz = np.array([-1, 0, 1], np.int32)
    qz = c[:, None, :, 2, None] + dz[None, None, None, :]       # [B,9,Vp,3]
    ok = (col_ok[..., None] & (qz >= 0) & (qz < Z)
          & out_mask[:, None, :, None])
    ok = ok.transpose(0, 2, 1, 3).reshape(B, Vp, 27)
    m = out.transpose(0, 3, 1, 2).reshape(B, Vp, 27)
    m = jnp.where(ok, m, jnp.int32(v_in))
    return m[:, :V]
