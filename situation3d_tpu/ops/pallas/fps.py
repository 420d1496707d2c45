"""Farthest point sampling as a Pallas TPU kernel.

The sequential FPS loop (``sampling_gpu.cu:69-229``) maps poorly onto plain
XLA: each of the M iterations round-trips the [B, N] distance state through
HBM. This kernel keeps the whole state — coordinates, running min-distances,
selectability mask — resident in VMEM for one batch row per grid step, so an
iteration is a handful of VPU passes over [8, N] registers plus one argmax
reduction; only the M selected indices leave the chip.

Layout: coords enter as ``[B, 3, N]`` (channel-major so N rides the 128-wide
lane dimension; N padded to a lane multiple, padding at +inf). Output is
``[B, 8, M]`` int32 with row 0 meaningful (sublane-tile padding).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _fps_kernel(xyz_ref, out_ref, temp_ref, m: int):
    x = xyz_ref[0, 0:1, :]                    # [1, N]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    n = x.shape[-1]
    m_pad = out_ref.shape[-1]
    mag = x * x + y * y + z * z
    selectable = mag > 1e-3                   # padding & origin points excluded
    temp_ref[0:1, :] = jnp.full_like(x, _BIG)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)

    def body(j, carry):
        old, out_row = carry
        # fetch the previously selected point by one-hot reduction (Mosaic
        # cannot load/store at unaligned dynamic lane offsets)
        onehot = (col_n == old).astype(x.dtype)
        xo = jnp.sum(x * onehot)
        yo = jnp.sum(y * onehot)
        zo = jnp.sum(z * onehot)
        d = (x - xo) ** 2 + (y - yo) ** 2 + (z - zo) ** 2
        t = jnp.minimum(temp_ref[0:1, :], d)
        temp_ref[0:1, :] = t
        cand = jnp.where(selectable, t, -1.0)
        new = jnp.argmax(cand).astype(jnp.int32)  # [1, N] -> linear == column
        out_row = jnp.where(col_m == j, new, out_row)
        return new, out_row

    out_row = jnp.zeros((1, m_pad), jnp.int32)
    _, out_row = jax.lax.fori_loop(1, m, body, (jnp.int32(0), out_row))
    out_ref[0, 0:1, :] = out_row
    out_ref[0, 1:8, :] = jnp.zeros((7, m_pad), jnp.int32)


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int, interpret: bool = False
               ) -> jnp.ndarray:
    """Pallas FPS. xyz [B, N, 3] float32 -> [B, npoint] int32.

    Padding convention matches the reference: rows at the origin
    (|p|^2 <= 1e-3) are never selected.
    """
    B, N, _ = xyz.shape
    n_pad = -(-N // 128) * 128
    m_pad = -(-npoint // 128) * 128
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)       # [B, 3, N]
    if n_pad != N:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - N)))
    # pad sublanes 3 -> 8 for the f32 tile
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, 0)))

    out = pl.pallas_call(
        partial(_fps_kernel, m=npoint),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 8, n_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, m_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, n_pad), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:, 0, :npoint]
