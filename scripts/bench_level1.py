"""Chip microbench: where does the QA forward's per-sample budget go,
and would a level-1 z-window conv pay?

Context (round 3): after the z-window conv0, sort-free downsample and the
fused Pallas convs, the headline sits at 11.83 samples/s (84.5 ms/sample,
B=8).  The one conv class still on the XLA gather path is level 1
(C_in=32, V=24576, k3 — 4 convs/sample, `fused_conv_wins` routes it back).
This script measures, interleaved (single-shot chip microbenches drift up
to 2x; interleaved repeats reproduce):

  1. block1-class conv: XLA vs fused Pallas, real kernel map;
  2. conv0 z-window alone;
  3. on-device plan build (current defaults), and the level-1 grid+k3-map
     share of it;
  4. PROTOTYPE of a level-1 z-window conv's primitives at true scale:
     scatter [V,32]->dense (2y,2z,32ch)-packed grid, 12 window-row
     gathers/voxel, phase-expanded matmul + one-hot select — the decision
     data for building it for real.

Run on the chip: `python scripts/bench_level1.py` (~10-30 min relay
compile on a cold cache).  Results land in /tmp/bench_level1.json.
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
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   kernel_offsets,
                                                   lookup_kernel_map_dense)
    from situation3d_tpu.sparse.minkunet import build_unet_plan
    from situation3d_tpu.sparse.conv import (sparse_conv_apply,
                                             sparse_conv0_zwin)
    from situation3d_tpu.ops.pallas.fused_conv import fused_sparse_conv

    from bench import make_scene_batch, time_fn

    B = 8
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    sp = cfg.sparse
    batch, coords_np, mask_np = make_scene_batch(cfg, B, np.random.RandomState(0))
    coords = batch["voxel_coords"]
    mask = batch["voxel_mask"]
    extent = tuple(sp.grid_extent)
    caps = sp.capacities

    out = {}

    # ---- on-device plan (defaults) -----------------------------------
    smoke = bool(os.environ.get("SMOKE"))
    plan_fn = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=extent, need_k5=False,
        dense_downsample=True)["levels"][1]["map_k3"])
    if not smoke:
        t_plan = time_fn(plan_fn, coords, mask, iters=5)
        out["plan_full_ms_per_sample"] = t_plan / B * 1e3
    plan = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=extent, need_k5=False,
        dense_downsample=True))(coords, mask)
    L1 = plan["levels"][1]
    l1_coords, l1_mask, l1_map = (np.asarray(L1["coords"]),
                                  np.asarray(L1["mask"]), L1["map_k3"])
    l1_coords_j = jnp.asarray(l1_coords)
    l1_mask_j = jnp.asarray(l1_mask)

    # level-1 grid + k3 map alone (what a zwin level-1 would delete)
    k3 = jnp.asarray(kernel_offsets(3))

    def l1_gridmap(c, m):
        grid, _ = jax.vmap(lambda cc, mm: build_level_grid(
            cc, mm, 2, extent))(c, m)
        return jax.vmap(lambda g, oc, om: lookup_kernel_map_dense(
            g, caps[1], oc, om, k3, 2, 2, extent))(grid, c, m)

    f_l1map = jax.jit(l1_gridmap)
    if not smoke:
        out["l1_grid_plus_k3map_ms_per_sample"] = time_fn(
            f_l1map, l1_coords_j, l1_mask_j, iters=5) / B * 1e3

    # ---- block1-class conv: XLA vs fused -----------------------------
    rng = np.random.RandomState(1)
    V1, C1 = caps[1], 32
    f1 = jnp.asarray(rng.randn(B, V1, C1).astype(np.float32),
                     jnp.bfloat16) * l1_mask_j[..., None]
    w1 = jnp.asarray(rng.randn(27, C1, C1).astype(np.float32), jnp.bfloat16)

    f_xla = jax.jit(lambda f, n, w: sparse_conv_apply(
        f, n, w, pallas_gather=False))
    f_fus = jax.jit(lambda f, n, w: fused_sparse_conv(f, n, w, 256, False))

    # ---- conv0 zwin ----------------------------------------------------
    f0 = jnp.asarray(rng.randn(B, caps[0], 3).astype(np.float32),
                     jnp.bfloat16) * mask[..., None]
    w0 = jnp.asarray(rng.randn(125, 3, 32).astype(np.float32), jnp.bfloat16)
    f_zwin0 = jax.jit(lambda f, c, m, w: sparse_conv0_zwin(
        f, c, m, w, extent)[0])

    # ---- level-2 C64 fused vs XLA (sanity anchor) ---------------------
    L2 = plan["levels"][2]
    l2_map = L2["map_k3"]
    V2, C2 = caps[2], 64
    f2 = jnp.asarray(rng.randn(B, V2, C2).astype(np.float32), jnp.bfloat16)
    f2 = f2 * jnp.asarray(np.asarray(L2["mask"]))[..., None]
    w2 = jnp.asarray(rng.randn(27, C2, C2).astype(np.float32), jnp.bfloat16)

    # ---- zwin-level1 prototype ----------------------------------------
    # grid cells (x, y>>1, z>>1), lanes = (2y, 2z, 32ch); stride-2 level of
    # extent (512,512,256) -> cells (256,256,128) -> rows 256*128*64
    R = (extent[0] // 2) * (extent[1] // 2 // 2) * (extent[2] // 2 // 2)
    bc = 2
    rows_sc = jnp.asarray(rng.randint(0, R, (B, V1)).astype(np.int32))
    win_rows = jnp.asarray(rng.randint(0, R, (B, V1, 12)).astype(np.int32))
    phase = jnp.asarray(rng.randint(0, 4, (B, V1)).astype(np.int32))
    wp = jnp.asarray(rng.randn(12 * 128, 4 * 32).astype(np.float32),
                     jnp.bfloat16)

    def proto_one(args):
        f, rs, wr, ph = args
        n = f.shape[0]
        # lane-shift: place 32 channels at slot*32 via 4 static pads
        slot = ph  # stand-in: slot distribution == phase distribution
        f128 = jnp.zeros((n, V1, 128), jnp.bfloat16)
        for s in range(4):
            fs = jnp.pad(f, ((0, 0), (0, 0), (32 * s, 96 - 32 * s)))
            f128 = jnp.where((slot == s)[..., None], fs, f128)
        grid = jnp.zeros((n, R, 128), jnp.bfloat16)
        grid = grid.at[jnp.arange(n)[:, None], rs].set(f128)
        win = jnp.take_along_axis(
            grid, wr.reshape(n, V1 * 12)[..., None], axis=1)
        out_all = jnp.einsum("bvm,mq->bvq", win.reshape(n, V1, 12 * 128),
                             wp, preferred_element_type=jnp.float32)
        oh = jax.nn.one_hot(ph, 4, dtype=jnp.bfloat16)
        o = jnp.einsum("bvpo,bvp->bvo",
                       out_all.reshape(n, V1, 4, 32).astype(jnp.bfloat16),
                       oh, preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    def proto(f, rs, wr, ph):
        o = jax.lax.map(proto_one, (
            f.reshape(B // bc, bc, V1, C1),
            rs.reshape(B // bc, bc, V1),
            wr.reshape(B // bc, bc, V1, 12),
            ph.reshape(B // bc, bc, V1)))
        return o.reshape(B, V1, 32)

    f_proto = jax.jit(proto)

    # gather-only variant: how much of the prototype is the window gather
    def proto_gather_only(f, rs, wr, ph):
        def one(args):
            f, rs, wr, ph = args
            n = f.shape[0]
            grid = jnp.zeros((n, R, 128), jnp.bfloat16)
            f128 = jnp.pad(f, ((0, 0), (0, 0), (0, 96)))
            grid = grid.at[jnp.arange(n)[:, None], rs].set(f128)
            win = jnp.take_along_axis(
                grid, wr.reshape(n, V1 * 12)[..., None], axis=1)
            return jnp.sum(win.reshape(n, V1, 12, 128), axis=2)
        o = jax.lax.map(one, (
            f.reshape(B // bc, bc, V1, C1),
            rs.reshape(B // bc, bc, V1),
            wr.reshape(B // bc, bc, V1, 12),
            ph.reshape(B // bc, bc, V1)))
        return o.reshape(B, V1, 128)

    f_proto_g = jax.jit(proto_gather_only)

    # ---- interleaved timing -------------------------------------------
    if os.environ.get("SMOKE"):
        for name, (fn, args) in {
            "plan": (plan_fn, (coords, mask)),
            "l1map": (f_l1map, (l1_coords_j, l1_mask_j)),
            "block1_xla": (f_xla, (f1, l1_map, w1)),
            "block1_fused": (f_fus, (f1, l1_map, w1)),
            "conv0_zwin": (f_zwin0, (f0, coords, mask, w0)),
            "zwin1_proto": (f_proto, (f1, rows_sc, win_rows, phase)),
            "zwin1_proto_gather": (f_proto_g, (f1, rows_sc, win_rows, phase)),
        }.items():
            print(name, jax.eval_shape(fn, *args), flush=True)
        return

    variants = {
        "block1_xla": (f_xla, (f1, l1_map, w1)),
        "block1_fused": (f_fus, (f1, l1_map, w1)),
        "conv0_zwin": (f_zwin0, (f0, coords, mask, w0)),
        "lvl2_xla": (f_xla, (f2, l2_map, w2)),
        "lvl2_fused": (f_fus, (f2, l2_map, w2)),
        "zwin1_proto": (f_proto, (f1, rows_sc, win_rows, phase)),
        "zwin1_proto_gather": (f_proto_g, (f1, rows_sc, win_rows, phase)),
    }
    times = {k: [] for k in variants}
    for rep in range(3):
        for k, (fn, args) in variants.items():
            dt = time_fn(fn, *args, iters=8)
            times[k].append(dt / B * 1e3)
            print(f"rep{rep} {k}: {dt / B * 1e3:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
        out[k + "_all"] = [round(x, 3) for x in v]

    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/bench_level1.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
