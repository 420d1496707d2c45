"""Chip probe #4: bf16 conv0 reformulations after the int8 dead end
(probe #3: int8+taa 43 ms, int8+flat 99 ms vs plain 37 — the bitcast
grid's layout poisons the int8 row gather in situ).

Staying bf16 (bit-exact semantics), attack the two measured halves
(scatter 16.5 + gather 17.5 ms/sample, probe #1) separately:

  scat3          baseline: 3 scalar writes/voxel        (expect ~16.5)
  scat_win4      ONE lax.scatter of [V] 4-lane windows (update_window_dims)
  gath_taa       baseline take_along_axis, current layout (expect ~17.5)
  gath_xinner    take_along_axis, x-INNERMOST row layout: a voxel's 20
                 window rows become 4 runs of 5 consecutive rows (dx
                 contiguous) instead of 10 pairs 1.4k rows apart — the
                 gather engine can coalesce runs
  gath_xinner_fl flat t[i] form of the same (bf16 grid is native layout,
                 so the probe-2 flat win may survive here)

Real make_scene_batch coords; indices computed on device.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.config import Config, apply_overrides
    from bench import make_scene_batch, time_fn

    bc = 2
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    X, Y, Z = tuple(cfg.sparse.grid_extent)
    PAD = 2
    XP = X + 2 * PAD
    NYG = (Y + 1) // 4 + 2
    ZC = (Z - 1) // 8 + 2
    n_rows = XP * ZC * NYG
    batch, _, _ = make_scene_batch(cfg, bc, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]
    V = coords.shape[1]
    key = jax.random.PRNGKey(1)

    def idxmath(c, m):
        xp = c[..., 0] + PAD
        yp = c[..., 1] + PAD
        zp = c[..., 2] + PAD
        ext = m & jnp.all(c >= 0, -1) & (c[..., 0] < X) \
            & (c[..., 1] < Y) & (c[..., 2] < Z)
        # current layout: row = (xp*ZC + zc)*NYG + yg
        row_cur = (xp * ZC + (zp >> 3)) * NYG + (yp >> 2)
        # x-innermost: row = (zc*NYG + yg)*XP + xp
        row_xin = ((zp >> 3) * NYG + (yp >> 2)) * XP + xp
        lane = (((yp & 3) << 3) + (zp & 7)) * 4
        dxs = jnp.arange(-PAD, PAD + 1)
        c0 = (zp - PAD) >> 3
        g0 = (yp - PAD) >> 2
        two = jnp.arange(2)
        r_cur = ((xp[..., None, None, None] + dxs[None, None, :, None, None])
                 * ZC + c0[..., None, None, None] + two[None, None, None, :, None]) \
            * NYG + g0[..., None, None, None] + two[None, None, None, None, :]
        # x-innermost window rows ordered (zc, yg, dx): 4 runs of 5
        r_xin = (((c0[..., None, None, None] + two[None, None, :, None, None])
                  * NYG + g0[..., None, None, None] + two[None, None, None, :, None])
                 * XP + xp[..., None, None, None] + dxs[None, None, None, None, :])
        r_cur = jnp.where(ext[..., None, None, None], r_cur, 0)
        r_xin = jnp.where(ext[..., None, None, None], r_xin, 0)
        rowc = jnp.where(ext, row_cur, n_rows)
        rowx = jnp.where(ext, row_xin, n_rows)
        return (rowc.astype(jnp.int32), rowx.astype(jnp.int32),
                lane.astype(jnp.int32),
                r_cur.reshape(bc, V * 20).astype(jnp.int32),
                r_xin.reshape(bc, V * 20).astype(jnp.int32))

    rowc, rowx, lane, r_cur, r_xin = jax.jit(idxmath)(coords, mask)
    f3 = jax.jit(lambda k: jax.random.normal(
        k, (bc, V, 3), jnp.bfloat16))(key)
    f4 = jax.jit(lambda k: jax.random.normal(
        k, (bc, V, 4), jnp.bfloat16))(key)
    tab = jax.jit(lambda k: jax.random.normal(
        k, (bc, n_rows, 128), jnp.bfloat16))(key)
    tabf = jax.jit(lambda k: jax.random.normal(
        k, (bc * n_rows, 128), jnp.bfloat16))(key)
    rflat = jax.jit(lambda r: (
        r + (jnp.arange(bc, dtype=jnp.int32) * n_rows)[:, None]
    ).reshape(-1))(r_xin)

    def scat3(row, lane, f3):
        bidx = jnp.arange(bc)[:, None]
        r3 = jnp.broadcast_to(row[..., None], (bc, V, 3)).reshape(bc, -1)
        l3 = (lane[..., None] + jnp.arange(3, dtype=jnp.int32)).reshape(bc, -1)
        g = jnp.zeros((bc, n_rows, 128), jnp.bfloat16)
        g = g.at[bidx, r3, l3].set(f3.reshape(bc, -1), mode="drop")
        return g.astype(jnp.float32).sum()

    def scat_win4(row, lane, f4):
        # one scatter of [V] windows of 4 lanes (update_window_dims)
        g = jnp.zeros((bc, n_rows, 128), jnp.bfloat16)
        idx = jnp.stack([row, lane], axis=-1)          # [bc, V, 2]
        dims = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(2,),                   # the 4-lane window
            inserted_window_dims=(1,),                 # row dim
            operand_batching_dims=(0,),
            scatter_indices_batching_dims=(0,),
            scatter_dims_to_operand_dims=(1, 2))
        g = jax.lax.scatter(
            g, idx, f4[..., None, :].reshape(bc, V, 4), dims,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            unique_indices=True, indices_are_sorted=False)
        return g.astype(jnp.float32).sum()

    def gath_taa(tab, r):
        win = jnp.take_along_axis(tab, r[..., None], axis=1)
        return win.astype(jnp.float32).sum()

    def gath_flat(tabf, rf):
        return tabf[rf].astype(jnp.float32).sum()

    cases = {
        "scat3": (jax.jit(scat3), (rowc, lane, f3)),
        "scat_win4": (jax.jit(scat_win4), (rowc, lane, f4)),
        "gath_taa": (jax.jit(gath_taa), (tab, r_cur)),
        "gath_xinner": (jax.jit(gath_taa), (tab, r_xin)),
        "gath_xinner_fl": (jax.jit(gath_flat), (tabf, rflat)),
    }
    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        try:
            rr = fn(*args)
            _ = float(np.asarray(rr).ravel()[0])
            print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)
        except Exception as e:
            print(f"FAIL {name}: {repr(e)[:200]}", flush=True)
            cases[name] = None
    cases = {k: v for k, v in cases.items() if v is not None}

    out = {}
    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8)
            per = dt / bc * 1e3
            times[name].append(per)
            print(f"rep{rep} {name}: {per:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    print(json.dumps(out), flush=True)
    with open("/tmp/mb_conv0_probe4.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
