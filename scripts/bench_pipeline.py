"""Chip microbench: the WHOLE QA forward as a measured per-stage budget
table (VERDICT r3 #2).

Round 3 ended with the driver measuring 107.1% of the "gather roofline" —
after the fused Pallas convs (gathers served from VMEM, DESIGN.md §9) and
the Pallas kernel maps (§11, §12), the modeled HBM-gather denominators no
longer describe the program, so the model can't name the next lever. This
script replaces it with measurement: every stage class of the headline
forward timed standalone, interleaved (single-shot chip numbers drift up
to 2x; interleaved repeats reproduce), summing to ≈ the end-to-end.

Stage classes (B=8, pinned headline config):
  plan      on-device build_unet_plan (all maps forced live)
  conv0     z-window conv0 (k5, 3->32, V=49152)
  k2_down   the 4 strided downsample convs (k2, gather path)
  lvl1_k3   4x k3 C32->32 @V=24576 — XLA per-offset path (the one class
            where both Pallas paths measured slower; DESIGN.md §9, §10)
  lvl2_k3   (32->64) + 3x(64->64) @V=12288 — fused Pallas
  lvl3_k3   (64->128) + 3x(128->128) @V=6144 — fused Pallas
  lvl4_k3   (128->256) + 3x(256->256) @V=3072 — fused Pallas
  pool      situated token pooling (dedup + segment-mean + sample)
  qpath     language tower + MCAN fusion + heads (scene_tokens fast path)
  tower     scene tower via model.apply -> att_feat_pre (= plan + convs +
            bn/relu + pool as XLA actually fuses them)
  e2e       full headline forward (answer_scores)

Checks: conv-stage sum + plan + pool ≈ tower; tower + qpath ≈ e2e.
Residual (tower - plan - pool - conv stages) = bn/relu/1x1/layout glue.

Run on the chip: ``python scripts/bench_pipeline.py`` (~20-40 min relay
compile on a cold cache; SMOKE=1 for a CPU shape-check). Results land in
/tmp/bench_pipeline.json — DESIGN.md §13 and bench.py's modeled ceiling
quote them.
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
    from situation3d_tpu.models.sig3d import SIG3D
    from situation3d_tpu.models.sig3d import situated_token_pool
    from situation3d_tpu.sparse.conv import sparse_conv_apply, sparse_conv0_zwin
    from situation3d_tpu.sparse.minkunet import build_unet_plan

    from bench import make_scene_batch, time_fn

    smoke = bool(os.environ.get("SMOKE"))
    B = int(os.environ.get("BENCH_B", "8"))
    tiny = [  # SMOKE: CPU shape-check only — full sizes don't fit 1 core
        "sparse.capacities=2048,1024,512,256,128",
        "sparse.grid_extent=(128,128,64)", "data.voxel_size=0.08",
        "data.voxel_capacity=2048",
    ] if smoke else []
    cfg = apply_overrides(Config(), ["data.num_answers=706", *tiny])
    sp = cfg.sparse
    extent = tuple(sp.grid_extent)
    caps = sp.capacities
    batch, coords_np, mask_np = make_scene_batch(cfg, B, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]
    out = {"B": B}

    plan_kw = dict(dense_lookup=sp.dense_lookup, extent=extent,
                   need_k5=not (sp.conv0_zwin and sp.dense_lookup),
                   dense_downsample=sp.dense_downsample,
                   pallas_map=sp.pallas_map,
                   pallas_map_bits=sp.pallas_map_bits)

    # ---- plan (force every map the QA forward consumes live) ------------
    def plan_live(c, m):
        p = build_unet_plan(c, m, caps, **plan_kw)
        acc = jnp.zeros((), jnp.int64) if jax.config.jax_enable_x64 \
            else jnp.zeros((), jnp.int32)
        for i, lvl in enumerate(p["levels"]):
            if i >= 1:  # QA forward reads map_k3 (levels>=1) + map_down
                acc = acc + lvl["map_k3"].sum() + lvl["map_down"].sum()
        return acc

    f_plan = jax.jit(plan_live)

    # materialized plan for the standalone conv stages
    plan = jax.jit(lambda c, m: build_unet_plan(c, m, caps, **plan_kw))(
        coords, mask)
    L = plan["levels"]
    rng = np.random.RandomState(1)

    def feats(v, c, lvl):
        f = jnp.asarray(rng.randn(B, v, c).astype(np.float32), jnp.bfloat16)
        return f * jnp.asarray(np.asarray(L[lvl]["mask"]))[..., None]

    def w(k, ci, co):
        return jnp.asarray(rng.randn(k, ci, co).astype(np.float32),
                           jnp.bfloat16)

    # routing identical to MinkUNet (minkunet.py MinkUNet.__call__):
    # config-driven — r5 defaults route every conv through the flat t[i]
    # XLA path (DESIGN.md §17)
    PG = sp.pallas_gather
    if sp.fused_conv:
        PG = "fused_force" if sp.fused_conv == "force" else "fused"
    if getattr(sp, "conv_flat_gather", False):
        PG = (PG if isinstance(PG, str) and PG else "") + "+flat"

    # ---- conv0 (z-window) ------------------------------------------------
    f0 = feats(caps[0], sp.in_channels, 0)
    w0 = w(125, sp.in_channels, sp.init_dim)
    # scalar return like every other stage: the full [B,V,32] bf16 output
    # (~25 MB) would drag through the ~0.07 GB/s relay on each timed
    # loop's completion fetch and bias the stage by ~5 ms/sample
    f_conv0 = jax.jit(lambda f, c, m, k: sparse_conv0_zwin(
        f, c, m, k, extent,
        int8_grid=getattr(sp, "conv0_int8", False),
        flat_gather=getattr(sp, "conv0_flat_gather", False),
        unique_scatter=getattr(sp, "conv0_unique_scatter", False))[0].sum())

    # ---- the 4 k2 downsample convs (chained, one program) ----------------
    k2maps = [jnp.asarray(np.asarray(L[i]["map_down"])) for i in (1, 2, 3, 4)]
    k2ch = [(sp.init_dim, sp.init_dim), (sp.planes[0], sp.planes[0]),
            (sp.planes[1], sp.planes[1]), (sp.planes[2], sp.planes[2])]
    k2f = [feats(caps[i - 1], k2ch[i - 1][0], i - 1) for i in (1, 2, 3, 4)]
    k2w = [w(8, ci, co) for ci, co in k2ch]

    def k2_all(fs, ms, ws):
        acc = jnp.zeros((), jnp.float32)
        for f, m_, w_ in zip(fs, ms, ws):
            acc = acc + sparse_conv_apply(f, m_, w_, pallas_gather=PG).sum()
        return acc

    f_k2 = jax.jit(k2_all)

    # ---- per-level k3 ResLayer stacks ------------------------------------
    def lvl_stack(lvl, c_in, c_out):
        """4 chained k3 convs: (c_in->c_out) + 3x(c_out->c_out), the
        ResLayer conv sequence at one level (bn/relu/residuals excluded —
        they land in the tower residual)."""
        m_ = jnp.asarray(np.asarray(L[lvl]["map_k3"]))
        f = feats(caps[lvl], c_in, lvl)
        ws = [w(27, c_in, c_out)] + [w(27, c_out, c_out)] * 3

        def run(f, m_, *ws):
            h = f
            for w_ in ws:
                h = sparse_conv_apply(h, m_, w_, pallas_gather=PG)
            return h.sum()

        return jax.jit(run), (f, m_, *ws)

    f_l1, a_l1 = lvl_stack(1, sp.init_dim, sp.planes[0])
    f_l2, a_l2 = lvl_stack(2, sp.planes[0], sp.planes[1])
    f_l3, a_l3 = lvl_stack(3, sp.planes[1], sp.planes[2])
    f_l4, a_l4 = lvl_stack(4, sp.planes[2], sp.planes[3])

    # ---- situated token pooling ------------------------------------------
    fb = feats(caps[4], sp.bottleneck_channels, 4)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def pool(fb, c, m, keys):
        tok, posn = jax.vmap(
            lambda cc, ff, mm, kk: situated_token_pool(
                cc, ff, mm, 16, cfg.model.num_scene_tokens,
                cfg.data.voxel_size, kk)
        )(c, fb, m, keys)
        return tok.sum() + posn.sum()

    f_pool = jax.jit(pool)
    a_pool = (fb, jnp.asarray(np.asarray(L[4]["coords"])),
              jnp.asarray(np.asarray(L[4]["mask"])), keys)

    # ---- model-level programs: e2e, tower, qpath --------------------------
    model = SIG3D(cfg, num_answers=706, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        b, train=False), batch)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    variables = jax.jit(lambda: jax.tree_util.tree_unflatten(treedef, [
        0.02 * jax.random.normal(jax.random.fold_in(
            jax.random.PRNGKey(0), i), s.shape, s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype) for i, s in enumerate(leaves)]))()
    key = jax.random.PRNGKey(2)

    f_e2e = jax.jit(lambda v, b, k: model.apply(
        v, b, train=False, rngs={"sample": k})["answer_scores"])
    f_tower = jax.jit(lambda v, b, k: model.apply(
        v, b, train=False, rngs={"sample": k})["att_feat_pre"].sum())

    out_shapes = jax.eval_shape(
        lambda v, b, k: model.apply(v, b, train=False, rngs={"sample": k}),
        variables, batch, key)
    tok_s = out_shapes["att_feat_pre"]
    pos_s = out_shapes["scene_positions"]
    rngq = np.random.RandomState(3)
    q_batch = {k: v for k, v in batch.items() if not k.startswith("voxel_")}
    q_batch["scene_tokens"] = jnp.asarray(
        rngq.randn(*tok_s.shape).astype(np.float32), tok_s.dtype)
    q_batch["scene_token_positions"] = jnp.asarray(
        rngq.randn(*pos_s.shape).astype(np.float32), pos_s.dtype)
    f_qpath = jax.jit(lambda v, b, k: model.apply(
        v, b, train=False, rngs={"sample": k})["answer_scores"])

    stages = {
        "plan": (f_plan, (coords, mask)),
        "conv0": (f_conv0, (f0, coords, mask, w0)),
        "k2_down": (f_k2, (k2f, k2maps, k2w)),
        "lvl1_k3": (f_l1, a_l1),
        "lvl2_k3": (f_l2, a_l2),
        "lvl3_k3": (f_l3, a_l3),
        "lvl4_k3": (f_l4, a_l4),
        "pool": (f_pool, a_pool),
        "qpath": (f_qpath, (variables, q_batch, key)),
        "tower": (f_tower, (variables, batch, key)),
        "e2e": (f_e2e, (variables, batch, key)),
    }

    if smoke:
        for name, (fn, args) in stages.items():
            print(name, jax.eval_shape(fn, *args), flush=True)
        return

    # compile everything first (costs reported; relay compiles dominate)
    for name, (fn, args) in stages.items():
        t0 = time.monotonic()
        r = fn(*args)
        _ = float(np.asarray(r).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    times = {k: [] for k in stages}
    for rep in range(3):
        for name, (fn, args) in stages.items():
            iters = 5 if name in ("e2e", "tower") else 8
            dt = time_fn(fn, *args, iters=iters)
            times[name].append(dt / B * 1e3)
            print(f"rep{rep} {name}: {dt / B * 1e3:.3f} ms/sample",
                  flush=True)

    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
        out[k + "_all"] = [round(x, 3) for x in v]

    conv_sum = sum(out[k + "_ms_per_sample"] for k in
                   ("conv0", "k2_down", "lvl1_k3", "lvl2_k3", "lvl3_k3",
                    "lvl4_k3"))
    stage_sum = conv_sum + out["plan_ms_per_sample"] + out["pool_ms_per_sample"]
    out["conv_stages_sum_ms"] = round(conv_sum, 3)
    out["tower_residual_ms"] = round(
        out["tower_ms_per_sample"] - stage_sum, 3)
    out["tower_plus_qpath_ms"] = round(
        out["tower_ms_per_sample"] + out["qpath_ms_per_sample"], 3)
    out["e2e_samples_per_sec"] = round(1e3 / out["e2e_ms_per_sample"] , 2)

    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/bench_pipeline.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
