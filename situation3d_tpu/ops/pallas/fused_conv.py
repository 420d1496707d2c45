"""Fused sparse convolution as one Pallas TPU kernel: gather + mask +
per-offset matmul, accumulated in VMEM.

The sparse engine's convs are ``sum_k gather(feats, map[:, k]) @ W[k]``.
The XLA path (and the plain VMEM gather in ``gather.py``) materializes the
gathered windows ``[B, K, V_out, C_in]`` in HBM between the gather and the
matmul — for a k3 conv that round-trip is 27x the feature-table bytes and
the gathered rows are served by XLA's gather engine (~80 M rows/s
measured).  This kernel keeps the whole per-sample feature table resident
in VMEM and serves each output block with dynamic-sublane vector loads
that feed the MXU directly: per conv, HBM sees the table once
(``V_in*C_in``), the map once (``V_out*K`` int32), and the output once —
the ``K*V_out*C_in`` intermediate never exists.

Replaces the CUDA gather/GEMM/scatter pipeline of MinkowskiEngine
(``reference: MinkowskiEngine convolution kernels``) the TPU way.

Mosaic constraints that shape it (CLAUDE.md measured notes):
- dynamic *sublane* indexing needs 32-bit element types -> the table is
  float32 in VMEM;
- no dynamic *lane* indexing -> rows must sit on sublanes.  A ``C_in <
  128`` table lane-pads 4x/2x and the level-1 (V=24576, C=32) table then
  blows the ~10 MB practical VMEM budget, so tables with ``C_in | 128``
  are PACKED ``P = 128 // C_in`` voxels per 128-lane row.  A packed row is
  gathered whole and the target voxel selected by a phase mask built from
  ``idx % P`` (vector compare against a lane iota) — the masked row then
  multiplies a P-times-tiled weight block, so selection costs zero extra
  MXU passes;
- scalar stores to VMEM are illegal -> the per-block row loop statically
  unrolls vector copies into a VMEM scratch (as in ``gather.py``);
- SMEM blocks obey the trailing-dim rule -> row indices stream as
  ``[B, K, nblk, blk]`` with ``blk`` a multiple of 128.

Grid is ``(B, V_out/blk, K)`` with the offset dimension innermost: the
output block ``(b, i)`` is revisited across the K consecutive steps and
accumulates in VMEM (f32), while the weight block walks ``W[k]``.

Backward is the standard XLA formulation (per-offset gather for dW,
scatter-add for dx) via ``jax.custom_vjp`` — deterministic, and identical
in cost to the unfused path's autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(table_ref, row_ref, idx_ref, w_ref, out_ref, g_ref, *,
                  block_rows: int, P: int, C_in: int, V_in: int,
                  in_dtype):
    k = pl.program_id(2)
    for j in range(block_rows):                     # static unroll
        r = row_ref[0, 0, 0, j]
        g_ref[j, :] = table_ref[0, r, :]
    idx = idx_ref[0, 0]                             # [blk, 1] int32
    valid = (idx >= 0) & (idx < V_in)               # [blk, 1]
    L = g_ref.shape[-1]
    if P > 1:
        lane_vox = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, L), 1) // C_in  # [blk, L] in [0, P)
        m = (lane_vox == (idx % P)) & valid
    else:
        m = jnp.broadcast_to(valid, (block_rows, L))
    g = (g_ref[...] * m.astype(jnp.float32)).astype(in_dtype)
    prod = jnp.dot(g, w_ref[0], preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _init():
        out_ref[0] = prod

    @pl.when(k != 0)
    def _acc():
        out_ref[0] = out_ref[0] + prod


def _pack_geometry(V_in: int, C_in: int):
    """(P voxels/row, L row lanes, table rows) for the packed VMEM table."""
    if C_in <= 128:
        if 128 % C_in:
            return None
        P = 128 // C_in
    else:
        if C_in % 128:
            return None
        P = 1
    L = P * C_in
    rows = -(-V_in // P)
    return P, L, rows


def fused_conv_fits(V_in: int, C_in: int, C_out: int,
                    block_rows: int = 256,
                    budget_bytes: int = 10 * 2 ** 20) -> bool:
    """Conservative VMEM budget for the fused conv (measured elsewhere:
    ~12.6 MB of table + pipeline buffers fails Mosaic allocation)."""
    geo = _pack_geometry(V_in, C_in)
    if geo is None:
        return False
    _, L, rows = geo
    table = rows * L * 4
    w = 2 * L * max(C_out, 128) * 4
    out = 2 * block_rows * max(C_out, 128) * 4
    idx = 2 * block_rows * 128 * 4 + block_rows * 4
    scratch = block_rows * L * 4
    return table + w + out + idx + scratch < budget_bytes


def fused_conv_wins(V_in: int, C_in: int, V_out: int, K: int,
                    flat_baseline: bool = False) -> bool:
    """Measured v5e routing (interleaved repeated A/B, B=8, bf16): the
    fused kernel beats the BATCHED take_along_axis path on every UNet
    shape EXCEPT the level-1 k3 class — C_in=32 with K*V_out >= ~0.5M
    output rows — where XLA's small-row gather engine is at its per-row
    fastest (~20 ns/row) and the packed kernel's per-row cost doesn't
    pay.  Wins vs batched: k2 level-0 in-table 1.35x, k2 mid-levels
    1.2-1.4x, k3 C_in=64 1.4-1.5x, C_in=128 1.1-1.2x, C_in=256 ~1.25x,
    k3 C_in=32 at V_out=12288 ~1.15x.

    ``flat_baseline``: the fallback is the FLAT t[i] gather form
    (sparse.conv_flat_gather, DESIGN.md §17), which re-decides the
    routing — interleaved per-class probe (scripts/mb_fused_vs_flat.py):
    flat beats fused at C_in<=128 (lvl2 1.30x, lvl3 1.15x, k2 1.29x);
    fused stays ~even/ahead only at C_in=256 (0.97x)."""
    if flat_baseline:
        return C_in >= 256
    return not (C_in <= 32 and K > 8 and V_out * K >= 500_000)


def _fused_conv_impl(feats: jnp.ndarray, nbr_idx: jnp.ndarray,
                     kernel: jnp.ndarray, block_rows: int,
                     interpret: bool) -> jnp.ndarray:
    B, V_in, C_in = feats.shape
    V_out, K = nbr_idx.shape[1], nbr_idx.shape[2]
    C_out = kernel.shape[-1]
    P, L, rows = _pack_geometry(V_in, C_in)

    pad_v = rows * P - V_in
    table = feats.astype(jnp.float32)
    if pad_v:
        table = jnp.pad(table, ((0, 0), (0, pad_v), (0, 0)))
    table = table.reshape(B, rows, L)

    idx_t = nbr_idx.transpose(0, 2, 1)              # [B, K, V_out]
    pad_r = (-V_out) % block_rows
    if pad_r:
        idx_t = jnp.pad(idx_t, ((0, 0), (0, 0), (0, pad_r)),
                        constant_values=V_in)       # pads are invalid
    R = V_out + pad_r
    nblk = R // block_rows
    row_t = jnp.clip(idx_t, 0, V_in - 1) // P
    # SMEM trailing-dim rule: the block must be (1, 1, 1, blk) with the
    # second-to-last ARRAY dim equal to 1 (Mosaic requires block dims to
    # divide (8, 128) or equal the array dims)
    row_s = row_t.reshape(B, K * nblk, 1, block_rows)
    idx_c = idx_t.reshape(B, K, R, 1)

    w = jnp.asarray(kernel, feats.dtype)            # [K, C_in, C_out]
    if P > 1:
        w = jnp.tile(w, (1, P, 1))                  # [K, L, C_out]

    out = pl.pallas_call(
        functools.partial(_fused_kernel, block_rows=block_rows, P=P,
                          C_in=C_in, V_in=V_in, in_dtype=feats.dtype),
        interpret=interpret,
        grid=(B, nblk, K),
        in_specs=[
            pl.BlockSpec((1, rows, L), lambda b, i, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_rows),
                         lambda b, i, k, nblk=nblk: (b, k * nblk + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_rows, 1), lambda b, i, k: (b, k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C_out), lambda b, i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, C_out),
                               lambda b, i, k: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_rows, L), jnp.float32)],
    )(table, row_s, idx_c, w)
    return out[:, :V_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_sparse_conv(feats: jnp.ndarray, nbr_idx: jnp.ndarray,
                      kernel: jnp.ndarray, block_rows: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """``out[b, v] = sum_k valid(idx[b,v,k]) * feats[b, idx[b,v,k]] @ W[k]``
    as ONE Pallas kernel (VMEM-resident feature table, MXU accumulation).

    Args:
      feats:   [B, V_in, C_in] (padding rows zero); any float dtype — the
        VMEM table is f32, matmul inputs are cast back to ``feats.dtype``.
      nbr_idx: int32 [B, V_out, K]; entries outside [0, V_in) contribute 0
        (both the engine's ``miss == V_in`` and ``-1`` conventions work).
      kernel:  [K, C_in, C_out].
    Returns [B, V_out, C_out] float32 (caller casts).
    """
    return _fused_conv_impl(feats, nbr_idx, kernel, block_rows, interpret)


def _fused_fwd(feats, nbr_idx, kernel, block_rows, interpret):
    return (_fused_conv_impl(feats, nbr_idx, kernel, block_rows, interpret),
            (feats, nbr_idx, kernel))


def _fused_bwd(block_rows, interpret, res, dy):
    """Per-offset XLA backward (deterministic scatter-add, like the
    reference's atomicAdd backward but order-fixed). dy: [B, V_out, C_out]
    f32."""
    feats, nbr_idx, kernel = res
    B, V_in, C_in = feats.shape
    K = nbr_idx.shape[2]
    padded = jnp.concatenate(
        [feats, jnp.zeros((B, 1, C_in), feats.dtype)], axis=1)
    idx_safe = jnp.where((nbr_idx >= 0) & (nbr_idx < V_in), nbr_idx, V_in)
    dpad = jnp.zeros((B, V_in + 1, C_in), jnp.float32)
    dW = []
    barange = jnp.arange(B)[:, None]
    for k in range(K):
        g = jnp.take_along_axis(padded, idx_safe[:, :, k, None], axis=1)
        dW.append(jnp.einsum("bvc,bvd->cd", g.astype(jnp.float32), dy))
        dx_k = jnp.einsum("bvd,cd->bvc", dy,
                          kernel[k].astype(jnp.float32))
        dpad = dpad.at[barange, idx_safe[:, :, k]].add(dx_k)
    return (dpad[:, :V_in].astype(feats.dtype), None,
            jnp.stack(dW).astype(kernel.dtype))


fused_sparse_conv.defvjp(_fused_fwd, _fused_bwd)
