"""Chip probe: WHERE the train step's backward time goes (VERDICT r4 #4).

Driver/bench facts: fwd e2e is 75.4 ms/sample (DESIGN.md §13), train step
(fwd + loss + bwd + adamw) was 98.6 ms/sample (10.14 samples/s, r3) — so
backward + update is only ~23 ms/sample.  conv0's expensive halves
(scatter 16.5 + gather 17.5) do NOT recur in its backward (the input is
raw colors: no dx; dW reuses the stored gathered windows), which is why
the ratio is so far below the classic 2-3x.  This probe times each conv
stage's fwd vs value_and_grad standalone (same stage harness as
scripts/bench_pipeline.py) so the bwd delta per class is measured, plus
the adamw update on the real SIG3D param tree.

Stages (delta = grad_time - fwd_time, ms/sample):
  conv0      z-window k5 (grad wrt kernel only — input is data)
  lvl1_k3    4x k3 C32 XLA per-offset (grad wrt feats + kernels)
  lvl2_k3    fused Pallas, custom VJP (XLA per-offset bwd)
  lvl3_k3, lvl4_k3, k2_down  same
  adamw      tx.update + apply_updates on the full SIG3D tree

Run: ``python scripts/mb_train_bwd.py`` (relay compiles ~minutes/stage).
Results land in /tmp/mb_train_bwd.json; DESIGN.md §15 quotes them.
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
    from situation3d_tpu.sparse.conv import (sparse_conv_apply,
                                             sparse_conv0_zwin)
    from situation3d_tpu.sparse.minkunet import build_unet_plan

    from bench import make_scene_batch, time_fn

    smoke = bool(os.environ.get("SMOKE"))
    B = int(os.environ.get("BENCH_B", "8"))
    tiny = [
        "sparse.capacities=2048,1024,512,256,128",
        "sparse.grid_extent=(128,128,64)", "data.voxel_size=0.08",
        "data.voxel_capacity=2048",
    ] if smoke else []
    cfg = apply_overrides(Config(), ["data.num_answers=706", *tiny])
    sp = cfg.sparse
    extent = tuple(sp.grid_extent)
    caps = sp.capacities
    batch, _, _ = make_scene_batch(cfg, B, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]
    out = {"B": B}

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
    cases = {}

    def scalar_grad(loss):
        """value_and_grad reduced to ONE device scalar: fetching a grads
        tree through the ~0.07 GB/s relay would bias the timing by
        hundreds of ms (CLAUDE.md)."""
        vg = jax.value_and_grad(loss)

        def run(*args):
            v, g = vg(*args)
            return v + jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), g,
                jnp.zeros((), jnp.float32))

        return run

    # ---- conv0: grad wrt kernel only (input = colors, no dx) -------------
    f0 = feats(caps[0], sp.in_channels, 0)
    w0 = w(125, sp.in_channels, sp.init_dim)

    def conv0_loss(k, f, c, m):
        return sparse_conv0_zwin(f, c, m, k, extent)[0] \
            .astype(jnp.float32).sum()

    cases["conv0"] = (
        jax.jit(conv0_loss), jax.jit(scalar_grad(conv0_loss)),
        (w0, f0, coords, mask))

    # ---- per-level k3 stacks: grad wrt feats + all 4 kernels -------------
    def lvl_stack(lvl, c_in, c_out):
        m_ = jnp.asarray(np.asarray(L[lvl]["map_k3"]))
        f = feats(caps[lvl], c_in, lvl)
        ws = [w(27, c_in, c_out)] + [w(27, c_out, c_out)] * 3

        def loss(fws, m_):
            h, ws = fws[0], fws[1:]
            for w_ in ws:
                h = sparse_conv_apply(h, m_, w_, pallas_gather=PG)
            return h.astype(jnp.float32).sum()

        return (jax.jit(loss), jax.jit(scalar_grad(loss)),
                ((f, *ws), m_))

    cases["lvl1_k3"] = lvl_stack(1, sp.init_dim, sp.planes[0])
    cases["lvl2_k3"] = lvl_stack(2, sp.planes[0], sp.planes[1])
    cases["lvl3_k3"] = lvl_stack(3, sp.planes[1], sp.planes[2])
    cases["lvl4_k3"] = lvl_stack(4, sp.planes[2], sp.planes[3])

    # ---- the 4 k2 downsample convs ---------------------------------------
    k2maps = [jnp.asarray(np.asarray(L[i]["map_down"])) for i in (1, 2, 3, 4)]
    k2ch = [(sp.init_dim, sp.init_dim), (sp.planes[0], sp.planes[0]),
            (sp.planes[1], sp.planes[1]), (sp.planes[2], sp.planes[2])]
    k2f = tuple(feats(caps[i - 1], k2ch[i - 1][0], i - 1) for i in (1, 2, 3, 4))
    k2w = tuple(w(8, ci, co) for ci, co in k2ch)

    def k2_loss(fws, ms):
        fs, ws = fws[:4], fws[4:]
        acc = jnp.zeros((), jnp.float32)
        for f, m_, w_ in zip(fs, ms, ws):
            acc = acc + sparse_conv_apply(
                f, m_, w_, pallas_gather=PG).astype(jnp.float32).sum()
        return acc

    cases["k2_down"] = (
        jax.jit(k2_loss), jax.jit(scalar_grad(k2_loss)),
        ((*k2f, *k2w), k2maps))

    # ---- adamw update on the real SIG3D param tree -----------------------
    from situation3d_tpu.models.sig3d import SIG3D
    from situation3d_tpu.train.trainer import make_sig3d_optimizer
    model = SIG3D(cfg, num_answers=706, dtype=jnp.bfloat16)
    v_shapes = jax.eval_shape(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        b, train=False), batch)
    lv, td = jax.tree_util.tree_flatten(v_shapes)
    v = jax.jit(lambda: jax.tree_util.tree_unflatten(td, [
        0.02 * jax.random.normal(jax.random.fold_in(
            jax.random.PRNGKey(1), i), s.shape, s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype) for i, s in enumerate(lv)]))()
    import optax
    tx, _ = make_sig3d_optimizer(cfg, v["params"], 100)
    opt_state = jax.jit(tx.init)(v["params"])
    grads = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x) * 1e-3, p))(v["params"])

    def adamw_step(g, p, s):
        u, ns = tx.update(g, s, p)
        np_ = optax.apply_updates(p, u)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype(jnp.float32).sum(), np_,
            jnp.zeros((), jnp.float32))

    cases["adamw"] = (None, jax.jit(adamw_step),
                      (grads, v["params"], opt_state))

    if smoke:
        for name, (ffwd, fgrad, args) in cases.items():
            print(name, jax.eval_shape(fgrad, *args)
                  if ffwd is None else jax.eval_shape(ffwd, *args),
                  flush=True)
        return

    def fetch(r):
        return float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])

    for name, (ffwd, fgrad, args) in cases.items():
        t0 = time.monotonic()
        if ffwd is not None:
            fetch(ffwd(*args))
        fetch(fgrad(*args))
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    times = {}
    for rep in range(3):
        for name, (ffwd, fgrad, args) in cases.items():
            for tag, fn in (("fwd", ffwd), ("grad", fgrad)):
                if fn is None:
                    continue
                dt = time_fn(fn, *args, iters=8) / B * 1e3
                times.setdefault(f"{name}_{tag}", []).append(dt)
                print(f"rep{rep} {name}_{tag}: {dt:.3f} ms/sample",
                      flush=True)

    for k, v_ in times.items():
        out[k + "_ms_per_sample"] = round(min(v_), 3)
    for name in cases:
        f_, g_ = out.get(f"{name}_fwd_ms_per_sample"), \
            out.get(f"{name}_grad_ms_per_sample")
        if f_ is not None and g_ is not None:
            out[f"{name}_bwd_delta_ms"] = round(g_ - f_, 3)

    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_train_bwd.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
