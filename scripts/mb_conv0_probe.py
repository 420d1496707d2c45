"""Chip probe: decompose the int8 conv0 loss (A/B measured 13.34 -> 12.38
despite the 3.7x isolated int8 row-gather win — scripts/mb_int8_gather.py).

Cases (B=8, real headline coords/extent, interleaved 3 rounds):
  conv0_plain        production z-window conv0 (bf16 grid)
  conv0_int8         the full int8_grid variant that lost end-to-end
  scat_bf16          grid build only, production scatter (3 scalars/voxel)
  scat_i8            grid build only, packed int32 + bitcast + reshape
  gath_bf16          REAL window indices, NATIVE bf16 grid -> gather+mm
  gath_i8            REAL window indices, NATIVE int8 grid -> gather+mm
The gath_* pair carries the real conv0 index locality (the first
microbench used uniform-random rows); the scat_* pair isolates the
packed-int32 lane-padding / bitcast-relayout suspicion.
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
    from situation3d_tpu.sparse.conv import sparse_conv0_zwin

    from bench import make_scene_batch, time_fn

    B = int(os.environ.get("BENCH_B", "8"))
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    sp = cfg.sparse
    X, Y, Z = extent = tuple(sp.grid_extent)
    batch, coords_np, mask_np = make_scene_batch(cfg, B, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]
    V = coords.shape[1]
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.rand(B, V, 3).astype(np.float32) * 255,
                        jnp.bfloat16) * mask[..., None]
    kernel = jnp.asarray(rng.randn(125, 3, sp.init_dim).astype(np.float32) * 0.1)

    f_plain = jax.jit(lambda f, c, m, k: sparse_conv0_zwin(
        f, c, m, k, extent)[0].sum())
    f_int8 = jax.jit(lambda f, c, m, k: sparse_conv0_zwin(
        f, c, m, k, extent, int8_grid=True)[0].sum())

    # ---- grid geometry (mirror of sparse_conv0_zwin) ---------------------
    PAD, CH = 2, 4
    XP = X + 2 * PAD
    NYG = (Y + 1) // 4 + 2
    ZC = (Z - 1) // 8 + 2
    n_rows = XP * ZC * NYG
    bc = 2

    cnp = np.asarray(coords[:bc])
    mnp = np.asarray(mask[:bc])
    xp = cnp[..., 0] + PAD
    yp = cnp[..., 1] + PAD
    zp = cnp[..., 2] + PAD
    row_np = (xp * ZC + (zp >> 3)) * NYG + (yp >> 2)
    row_np = np.where(mnp, row_np, n_rows).astype(np.int32)
    lane32_np = ((yp & 3) * 8 + (zp & 7)).astype(np.int32)
    dxs = np.arange(-PAD, PAD + 1, dtype=np.int64)
    c0 = (zp - PAD) >> 3
    g0 = (yp - PAD) >> 2
    r_np = ((xp[..., None, None, None] + dxs[None, None, :, None, None])
            * ZC + c0[..., None, None, None]
            + np.arange(2)[None, None, None, :, None]) \
        * NYG + g0[..., None, None, None] \
        + np.arange(2)[None, None, None, None, :]
    r_np = np.where(mnp[..., None, None, None], r_np, 0) \
        .reshape(bc, V * 20).astype(np.int32)

    row_d = jnp.asarray(row_np)
    lane32_d = jnp.asarray(lane32_np)
    r_d = jnp.asarray(r_np)
    word_d = jnp.asarray(rng.randint(0, 1 << 30, (bc, V)).astype(np.int32))
    f3_d = jnp.asarray(rng.randn(bc, V, 3).astype(np.float32), jnp.bfloat16)
    WP = jnp.asarray(rng.randn(2560, 32 * sp.init_dim).astype(np.float32),
                     jnp.bfloat16)

    def scat_bf16(row, lane32, f3):
        bidx = jnp.arange(bc)[:, None]
        r3 = jnp.broadcast_to(row[..., None], (bc, V, 3)).reshape(bc, -1)
        l3 = (lane32[..., None] * 4
              + jnp.arange(3, dtype=jnp.int32)).reshape(bc, -1)
        g = jnp.zeros((bc, n_rows, 128), jnp.bfloat16)
        g = g.at[bidx, r3, l3].set(f3.reshape(bc, -1), mode="drop")
        return g.astype(jnp.float32).sum()

    def scat_i8(row, lane32, word):
        bidx = jnp.arange(bc)[:, None]
        g32 = jnp.zeros((bc, n_rows, 32), jnp.int32)
        g32 = g32.at[bidx, row, lane32].set(word, mode="drop")
        g8 = jax.lax.bitcast_convert_type(g32, jnp.int8) \
            .reshape(bc, n_rows, 128)
        return g8.astype(jnp.float32).sum()

    tab_bf = jax.jit(lambda k: jax.random.normal(
        k, (bc, n_rows, 128), jnp.bfloat16))(jax.random.PRNGKey(0))
    tab_i8 = jax.jit(lambda k: jax.random.randint(
        k, (bc, n_rows, 128), -128, 127, jnp.int8))(jax.random.PRNGKey(0))

    def gath(tab, r, wp):
        win = jnp.take_along_axis(tab, r[..., None], axis=1)
        out = jnp.einsum("bvm,mq->bvq",
                         win.reshape(bc, V, 2560).astype(jnp.bfloat16), wp,
                         preferred_element_type=jnp.float32)
        return out.sum()

    cases = {
        "conv0_plain": (f_plain, (feats, coords, mask, kernel)),
        "conv0_int8": (f_int8, (feats, coords, mask, kernel)),
        "scat_bf16": (jax.jit(scat_bf16), (row_d, lane32_d, f3_d)),
        "scat_i8": (jax.jit(scat_i8), (row_d, lane32_d, word_d)),
        "gath_bf16": (jax.jit(gath), (tab_bf, r_d, WP)),
        "gath_i8": (jax.jit(gath), (tab_i8, r_d, WP)),
    }
    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        rr = fn(*args)
        _ = float(np.asarray(rr).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    scale = {"conv0_plain": B, "conv0_int8": B}
    out = {}
    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8)
            per = dt / scale.get(name, bc) * 1e3
            times[name].append(per)
            print(f"rep{rep} {name}: {per:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    print(json.dumps(out), flush=True)
    with open("/tmp/mb_conv0_probe.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
