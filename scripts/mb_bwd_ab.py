"""Chip probe: per-class backward cost, autodiff vs gather-only
(sparse.gather_bwd, DESIGN.md §16) — interleaved in ONE process.

mb_train_bwd.py measured the autodiff backward deltas at 2-10x the
forward (lvl1 41.8, lvl2 22.6, k2 15.6, lvl3 10.4, lvl4 7.3 ms/sample —
scatter-add dominated). This times value_and_grad of each conv class
under both backward formulations, interleaved, so the per-class win is
called from one process (single-shot chip numbers drift; CLAUDE.md).

Run: ``python scripts/mb_bwd_ab.py``. Results: /tmp/mb_bwd_ab.json.
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

    PG = "fused"

    def scalar_grad(loss):
        vg = jax.value_and_grad(loss)

        def run(*args):
            v, g = vg(*args)
            return v + jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), g,
                jnp.zeros((), jnp.float32))

        return run

    cases = {}

    def lvl_stack(lvl, c_in, c_out, sym):
        m_ = jnp.asarray(np.asarray(L[lvl]["map_k3"]))
        f = feats(caps[lvl], c_in, lvl)
        ws = [w(27, c_in, c_out)] + [w(27, c_out, c_out)] * 3

        def loss(fws, m_):
            h, ws = fws[0], fws[1:]
            for w_ in ws:
                h = sparse_conv_apply(h, m_, w_, pallas_gather=PG,
                                      symmetric_bwd=sym)
            return h.astype(jnp.float32).sum()

        return (jax.jit(scalar_grad(loss)), ((f, *ws), m_))

    for lvl, ci, co in ((1, sp.init_dim, sp.planes[0]),
                        (2, sp.planes[0], sp.planes[1]),
                        (3, sp.planes[1], sp.planes[2]),
                        (4, sp.planes[2], sp.planes[3])):
        cases[f"lvl{lvl}_auto"] = lvl_stack(lvl, ci, co, False)
        cases[f"lvl{lvl}_gbwd"] = lvl_stack(lvl, ci, co, True)

    # k2 downsample chain: autodiff vs transpose-map backward
    k2maps = [jnp.asarray(np.asarray(L[i]["map_down"])) for i in (1, 2, 3, 4)]
    k2tmaps = [jnp.asarray(np.asarray(L[i - 1]["map_up"]))
               for i in (1, 2, 3, 4)]
    k2ch = [(sp.init_dim, sp.init_dim), (sp.planes[0], sp.planes[0]),
            (sp.planes[1], sp.planes[1]), (sp.planes[2], sp.planes[2])]
    k2f = tuple(feats(caps[i - 1], k2ch[i - 1][0], i - 1) for i in (1, 2, 3, 4))
    k2w = tuple(w(8, ci, co) for ci, co in k2ch)

    def k2_loss(tm):
        def loss(fws, ms):
            fs, ws = fws[:4], fws[4:]
            acc = jnp.zeros((), jnp.float32)
            for i, (f, m_, w_) in enumerate(zip(fs, ms, ws)):
                acc = acc + sparse_conv_apply(
                    f, m_, w_, pallas_gather=PG,
                    transpose_map=tm[i] if tm else None
                ).astype(jnp.float32).sum()
            return acc
        return loss

    cases["k2_auto"] = (jax.jit(scalar_grad(k2_loss(None))),
                        ((*k2f, *k2w), k2maps))
    cases["k2_gbwd"] = (jax.jit(scalar_grad(k2_loss(k2tmaps))),
                        ((*k2f, *k2w), k2maps))

    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        r = fn(*args)
        _ = float(np.asarray(r).ravel()[0])
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
    for cls in ("lvl1", "lvl2", "lvl3", "lvl4", "k2"):
        a = out.get(f"{cls}_auto_ms_per_sample")
        b = out.get(f"{cls}_gbwd_ms_per_sample")
        if a and b:
            out[f"{cls}_speedup"] = round(a / b, 3)
    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_bwd_ab.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
