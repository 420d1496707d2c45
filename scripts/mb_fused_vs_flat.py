"""Chip probe: per-class FORWARD, fused Pallas kernel vs flat-XLA
per-offset ("+flat" alone), interleaved.

The flat t[i] gather beat the taa-XLA path 3x at level 1
(mb_flat_convs.py) — the fused kernel's 1.1-1.5x wins were measured
against the OLD taa baseline (DESIGN.md §9), so the routing
(fused_conv_wins) must be re-decided against flat-XLA.

Run: ``python scripts/mb_fused_vs_flat.py``; /tmp/mb_fused_vs_flat.json.
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
    from situation3d_tpu.sparse.conv import sparse_conv_apply
    from situation3d_tpu.sparse.minkunet import build_unet_plan

    from bench import make_scene_batch, time_fn

    B = int(os.environ.get("BENCH_B", "8"))
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    sp = cfg.sparse
    extent = tuple(sp.grid_extent)
    caps = sp.capacities
    batch, _, _ = make_scene_batch(cfg, B, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]

    plan_kw = dict(dense_lookup=sp.dense_lookup, extent=extent,
                   need_k5=not (sp.conv0_zwin and sp.dense_lookup),
                   dense_downsample=sp.dense_downsample,
                   pallas_map=sp.pallas_map,
                   pallas_map_bits=sp.pallas_map_bits)
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

    cases = {}

    def lvl_case(lvl, c_in, c_out, pg):
        m_ = jnp.asarray(np.asarray(L[lvl]["map_k3"]))
        f = feats(caps[lvl], c_in, lvl)
        ws = [w(27, c_in, c_out)] + [w(27, c_out, c_out)] * 3

        def loss(fws, m_):
            h, ws = fws[0], fws[1:]
            for w_ in ws:
                h = sparse_conv_apply(h, m_, w_, pallas_gather=pg)
            return h.astype(jnp.float32).sum()

        return (jax.jit(loss), ((f, *ws), m_))

    for lvl, ci, co in ((2, sp.planes[0], sp.planes[1]),
                        (3, sp.planes[1], sp.planes[2]),
                        (4, sp.planes[2], sp.planes[3])):
        cases[f"l{lvl}_fused"] = lvl_case(lvl, ci, co, "fused")
        cases[f"l{lvl}_flat"] = lvl_case(lvl, ci, co, "+flat")

    k2maps = [jnp.asarray(np.asarray(L[i]["map_down"])) for i in (1, 2, 3, 4)]
    k2ch = [(sp.init_dim, sp.init_dim), (sp.planes[0], sp.planes[0]),
            (sp.planes[1], sp.planes[1]), (sp.planes[2], sp.planes[2])]
    k2f = tuple(feats(caps[i - 1], k2ch[i - 1][0], i - 1) for i in (1, 2, 3, 4))
    k2w = tuple(w(8, ci, co) for ci, co in k2ch)

    def k2_loss(pg):
        def loss(fws, ms):
            fs, ws = fws[:4], fws[4:]
            acc = jnp.zeros((), jnp.float32)
            for f, m_, w_ in zip(fs, ms, ws):
                acc = acc + sparse_conv_apply(
                    f, m_, w_, pallas_gather=pg).astype(jnp.float32).sum()
            return acc
        return loss

    cases["k2_fused"] = (jax.jit(k2_loss("fused")), ((*k2f, *k2w), k2maps))
    cases["k2_flat"] = (jax.jit(k2_loss("+flat")), ((*k2f, *k2w), k2maps))

    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        _ = float(np.asarray(fn(*args)).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8) / B * 1e3
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/sample", flush=True)

    out = {"B": B}
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    for cls in ("l2", "l3", "l4", "k2"):
        a = out.get(f"{cls}_fused_ms_per_sample")
        b = out.get(f"{cls}_flat_ms_per_sample")
        if a and b:
            out[f"{cls}_flat_over_fused"] = round(a / b, 3)
    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_fused_vs_flat.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
