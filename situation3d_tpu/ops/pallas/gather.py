"""Row gather as a Pallas TPU kernel (sparse-conv feature gather).

Every conv in the sparse engine is gather-bound: XLA's gather engine
measures ~150-300 M rows/s and ~12-14 GB/s on v5e regardless of table size
(DESIGN.md §1), far below HBM bandwidth. This kernel instead makes the
feature table VMEM-resident once per (batch row, conv) and serves each
output row with one dynamic-sublane vector load — no HBM traffic per row.

Mosaic constraints that shape it (DESIGN.md §4, CLAUDE.md):
- dynamic *sublane* indexing works for 32-bit element types only — the
  table is float32 inside the kernel (bf16 packs two rows per sublane);
- no dynamic *lane* indexing — rows must live on sublanes, so the table
  layout is [V, C] with C on lanes (C is padded to 128 by Mosaic; the
  kernel is intended for C >= 128 where padding is free);
- the per-row loop is statically unrolled in blocks of ``block_rows``
  (dynamic destination rows can't be stored; static ones can).

Used by sparse_conv_apply when ``cfg.sparse.pallas_gather`` enables it and
the table fits the VMEM budget; falls back to XLA take_along_axis
elsewhere. Backward stays XLA's deterministic scatter-add.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(table_ref, idx_ref, out_ref, *, block_rows: int):
    for j in range(block_rows):                    # static unroll
        row = idx_ref[0, 0, 0, j]
        out_ref[0, j, :] = table_ref[0, row, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def vmem_gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                     block_rows: int = 256) -> jnp.ndarray:
    """out[b, r, :] = table[b, idx[b, r], :].

    Args:
      table: [B, V, C] float32 — must fit VMEM (V*C*4 + block bytes < ~14MB).
      idx:   [B, R] int32 in [0, V); R must be a multiple of block_rows.
    Returns [B, R, C] float32.

    The indices stream through SMEM one ``block_rows`` block per grid step
    (a whole-array scalar prefetch would overflow the ~1MB SMEM at conv
    sizes, R = V*K > 256k rows). They are reshaped to
    ``[B, R/blk, 1, blk]`` so the SMEM block ``(1, 1, 1, blk)`` satisfies
    Mosaic's trailing-dim alignment rule (blk a multiple of 128).
    """
    B, V, C = table.shape
    R = idx.shape[1]
    assert R % block_rows == 0 and block_rows % 128 == 0, (R, block_rows)
    idx4 = idx.reshape(B, R // block_rows, 1, block_rows)
    grid = (B, R // block_rows)
    # the CPU backend (tests, multichip dryruns) only supports interpret
    # mode; Mosaic compiles on TPU/axon
    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        functools.partial(_gather_kernel, block_rows=block_rows),
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, V, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_rows), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), table.dtype),
    )(table, idx4)


def _gather_fwd(table, idx, block_rows):
    return vmem_gather_rows(table, idx, block_rows), (idx, table.shape)


def _gather_bwd(block_rows, res, g):
    """Deterministic scatter-add of output grads back into table rows (the
    XLA analogue of the reference's atomicAdd backward kernels)."""
    idx, tshape = res
    B = tshape[0]
    dtable = jnp.zeros(tshape, g.dtype).at[
        jnp.arange(B)[:, None], idx].add(g)
    return dtable, None


vmem_gather_rows.defvjp(_gather_fwd, _gather_bwd)


def gather_fits_vmem(V: int, C: int, block_rows: int = 256,
                     budget_bytes: int = 10 * 2 ** 20) -> bool:
    """Conservative VMEM check: f32 table (C padded to a lane multiple of
    128) + double-buffered output block. The 10MB budget is measured: a
    12.6MB table (V=24577, C=32) fails Mosaic allocation once the pipeline
    buffers join it."""
    c_pad = max(C, 128)
    table = V * c_pad * 4
    out = 2 * block_rows * c_pad * 4
    return table + out < budget_bytes
