"""Chip probe: flat t[i] row gathers in the XLA per-offset conv paths
(sparse.conv_flat_gather, "+flat" routing) — interleaved A/B in situ.

The conv0 flat-gather switch won 13% in situ (DESIGN.md §15). The same
access-path choice exists in (a) the level-1 k3 forward (the one conv
class on the XLA per-offset path — 27x24576 gathers of 64 B rows) and
(b) the gather-only backward loops of every conv (DESIGN.md §16, dy-row
gathers 64-512 B). This times both, taa vs flat, interleaved.

Run: ``python scripts/mb_flat_convs.py``; results /tmp/mb_flat_convs.json.
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

    def scalar_grad(loss):
        vg = jax.value_and_grad(loss)

        def run(*args):
            v, g = vg(*args)
            return v + jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), g,
                jnp.zeros((), jnp.float32))

        return run

    cases = {}

    def lvl_case(lvl, c_in, c_out, pg, grad):
        m_ = jnp.asarray(np.asarray(L[lvl]["map_k3"]))
        f = feats(caps[lvl], c_in, lvl)
        ws = [w(27, c_in, c_out)] + [w(27, c_out, c_out)] * 3

        def loss(fws, m_):
            h, ws = fws[0], fws[1:]
            for w_ in ws:
                h = sparse_conv_apply(h, m_, w_, pallas_gather=pg,
                                      symmetric_bwd=grad)
            return h.astype(jnp.float32).sum()

        fn = scalar_grad(loss) if grad else loss
        return (jax.jit(fn), ((f, *ws), m_))

    cases["l1f_taa"] = lvl_case(1, sp.init_dim, sp.planes[0], "fused", False)
    cases["l1f_flat"] = lvl_case(1, sp.init_dim, sp.planes[0],
                                 "fused+flat", False)
    cases["l1g_taa"] = lvl_case(1, sp.init_dim, sp.planes[0], "fused", True)
    cases["l1g_flat"] = lvl_case(1, sp.init_dim, sp.planes[0],
                                 "fused+flat", True)
    cases["l2g_taa"] = lvl_case(2, sp.planes[0], sp.planes[1], "fused", True)
    cases["l2g_flat"] = lvl_case(2, sp.planes[0], sp.planes[1],
                                 "fused+flat", True)

    # k2 chain grads (transpose-map backward), taa vs flat dy gathers
    k2maps = [jnp.asarray(np.asarray(L[i]["map_down"])) for i in (1, 2, 3, 4)]
    k2tmaps = [jnp.asarray(np.asarray(L[i - 1]["map_up"]))
               for i in (1, 2, 3, 4)]
    k2ch = [(sp.init_dim, sp.init_dim), (sp.planes[0], sp.planes[0]),
            (sp.planes[1], sp.planes[1]), (sp.planes[2], sp.planes[2])]
    k2f = tuple(feats(caps[i - 1], k2ch[i - 1][0], i - 1) for i in (1, 2, 3, 4))
    k2w = tuple(w(8, ci, co) for ci, co in k2ch)

    def k2_loss(pg):
        def loss(fws, ms):
            fs, ws = fws[:4], fws[4:]
            acc = jnp.zeros((), jnp.float32)
            for i, (f, m_, w_) in enumerate(zip(fs, ms, ws)):
                acc = acc + sparse_conv_apply(
                    f, m_, w_, pallas_gather=pg, transpose_map=k2tmaps[i]
                ).astype(jnp.float32).sum()
            return acc
        return loss

    cases["k2g_taa"] = (jax.jit(scalar_grad(k2_loss("fused"))),
                        ((*k2f, *k2w), k2maps))
    cases["k2g_flat"] = (jax.jit(scalar_grad(k2_loss("fused+flat"))),
                        ((*k2f, *k2w), k2maps))

    vals = {}
    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        vals[name] = float(np.asarray(fn(*args)).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s "
              f"(sum={vals[name]:.6g})", flush=True)
    out = {"B": B, "pairs_sum_equal": all(
        vals[k] == vals[k.replace('_flat', '_taa')]
        for k in vals if k.endswith('_flat'))}

    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8) / B * 1e3
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    for cls in ("l1f", "l1g", "l2g", "k2g"):
        a = out.get(f"{cls}_taa_ms_per_sample")
        b = out.get(f"{cls}_flat_ms_per_sample")
        if a and b:
            out[f"{cls}_flat_speedup"] = round(a / b, 3)
    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_flat_convs.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
