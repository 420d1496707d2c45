"""Chip probe #6: FLAT scatter forms for the conv0 grid build.

The flat-vs-batched asymmetry won three times on gathers (DESIGN.md
§15/§17). The conv0 grid SCATTER (16.5 ms/sample, now ~31% of e2e) is
the batched 3D form `g.at[b, row, lane].set(v)` — this probe times its
flat analogues on the REAL conv0 rows/lanes (same idxmath as
sparse_conv0_zwin, bc=2 chunks like production):

  scat3_b      baseline batched [bc, n_rows, 128] 3-scalar writes
  scat3_2d     [bc*n_rows, 128] rows flattened, lanes batched
  scat3_1d     fully flat [bc*n_rows*128] 1-D scalar writes
  scat3_1d_u   same + unique_indices=True (true by construction)
  memset       zeros-only reference (one row touched) — isolates the
               grid materialization cost common to all variants

Run: ``python scripts/mb_conv0_probe6.py``; /tmp/mb_conv0_probe6.json.
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
    C_in = 3
    key = jax.random.PRNGKey(1)

    def idxmath(c, m):
        xp = c[..., 0] + PAD
        yp = c[..., 1] + PAD
        zp = c[..., 2] + PAD
        ext = m & jnp.all(c >= 0, -1) & (c[..., 0] < X) \
            & (c[..., 1] < Y) & (c[..., 2] < Z)
        row = (xp * ZC + (zp >> 3)) * NYG + (yp >> 2)
        row = jnp.where(ext, row, n_rows)
        lane = (((yp & 3) << 3) + (zp & 7)) * 4
        return row.astype(jnp.int32), lane.astype(jnp.int32)

    row, lane = jax.jit(idxmath)(coords, mask)
    f3 = jax.jit(lambda k: jax.random.normal(k, (bc, V, 3), jnp.bfloat16))(key)

    bidx = jnp.arange(bc)[:, None]
    ch = jnp.arange(C_in, dtype=jnp.int32)

    def scat3_b(row, lane, f3):
        r3 = jnp.broadcast_to(row[..., None], (bc, V, C_in)).reshape(bc, -1)
        l3 = (lane[..., None] + ch).reshape(bc, -1)
        g = jnp.zeros((bc, n_rows + 1, 128), jnp.bfloat16)
        g = g.at[bidx, r3, l3].set(f3.reshape(bc, -1), mode="drop")
        return g[0, 0].astype(jnp.float32).sum()

    def scat3_2d(row, lane, f3):
        rowf = row + (jnp.arange(bc, dtype=jnp.int32) * (n_rows + 1))[:, None]
        r3 = jnp.broadcast_to(rowf[..., None],
                              (bc, V, C_in)).reshape(-1)
        l3 = (lane[..., None] + ch).reshape(-1)
        g = jnp.zeros((bc * (n_rows + 1), 128), jnp.bfloat16)
        g = g.at[r3, l3].set(f3.reshape(-1), mode="drop")
        return g[0].astype(jnp.float32).sum()

    def scat3_1d(row, lane, f3, uniq=False):
        rowf = row + (jnp.arange(bc, dtype=jnp.int32) * (n_rows + 1))[:, None]
        flat = (rowf[..., None] * 128 + lane[..., None] + ch).reshape(-1)
        g = jnp.zeros((bc * (n_rows + 1) * 128,), jnp.bfloat16)
        g = g.at[flat].set(f3.reshape(-1), mode="drop",
                           unique_indices=uniq)
        return g[:128].astype(jnp.float32).sum()

    def memset(row, lane, f3):
        g = jnp.zeros((bc, n_rows + 1, 128), jnp.bfloat16)
        g = g.at[bidx, row[:, :1], lane[:, :1]].set(f3[:, :1, 0],
                                                    mode="drop")
        return g[0, 0].astype(jnp.float32).sum()

    cases = {
        "scat3_b": (jax.jit(scat3_b), (row, lane, f3)),
        "scat3_2d": (jax.jit(scat3_2d), (row, lane, f3)),
        "scat3_1d": (jax.jit(lambda r, l, f: scat3_1d(r, l, f, False)),
                     (row, lane, f3)),
        "scat3_1d_u": (jax.jit(lambda r, l, f: scat3_1d(r, l, f, True)),
                       (row, lane, f3)),
        "memset": (jax.jit(memset), (row, lane, f3)),
    }

    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        try:
            _ = float(np.asarray(fn(*args)).ravel()[0])
            print(f"compile {name}: {time.monotonic() - t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"FAIL {name}: {repr(e)[:200]}", flush=True)
            cases[name] = None
    cases = {k: v for k, v in cases.items() if v is not None}

    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8) / bc * 1e3
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/sample", flush=True)

    out = {}
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_conv0_probe6.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
