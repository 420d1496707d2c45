"""Benchmark: situation3d_tpu throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline: end-to-end scene-QA inference samples/sec/chip — tokenized
question + voxelized scene in, answer logits out, including on-device
kernel-map construction (the analogue of the reference's eval loop at
``situation3d/eval/eval.py:287-290``). The reference publishes no numbers
(BASELINE.json "published": {}), so vs_baseline is null until a measured
PyTorch baseline exists.

"extra" carries the evidence behind the headline (VERDICT r1 #3):
- batch size used (tuned; set BENCH_B to override),
- host-plan-path samples/s: forward given precomputed kernel maps — the
  production path where plan building overlaps on host via data/prefetch.py
  (plan build time reported separately),
- train-step samples/s (forward+loss+backward+adamw),
- gather-roofline % : the sparse convs are gather-bound (DESIGN.md: XLA
  gather engine ~13 GB/s, ~250 Mrows/s on v5e); we count the bytes/rows
  each conv gathers per sample and report measured/roofline,
- Blip2T5 greedy decode tokens/s at flan-t5-xl size (skip: BENCH_BLIP2=0).

Set BENCH_FAST=1 to run the headline only.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

GATHER_GBPS = 13e9      # measured v5e gather bandwidth, feature rows (DESIGN.md)
GATHER_ROWS = 250e6     # measured v5e gather row rate, feature rows
MAP_ROWS = 65e6         # measured v5e single-int32 gather rate (kernel maps)


def make_scene_batch(cfg, B, rng):
    import jax.numpy as jnp

    cap = cfg.sparse.capacities[0]
    L = cfg.data.max_text_len
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    feats = np.zeros((B, cap, 3), np.float32)
    for b in range(B):
        pts = (rng.rand(50000, 3) * np.array([8.0, 6.0, 3.0])) / cfg.data.voxel_size
        c = np.unique(np.floor(pts).astype(np.int32), axis=0)[:cap]
        coords[b, : len(c)], mask[b, : len(c)] = c, True
        feats[b, : len(c)] = rng.rand(len(c), 3) * 255
    sm = np.zeros((B, L), np.int32); sm[:, :60] = 1
    qm = np.zeros((B, L), np.int32); qm[:, :20] = 1
    A = cfg.data.num_answers
    cats = np.eye(A, dtype=np.float32)[rng.randint(0, A, B)]
    return {
        "s_ids": jnp.asarray(rng.randint(4, 30000, (B, L)).astype(np.int32)),
        "s_mask": jnp.asarray(sm),
        "q_ids": jnp.asarray(rng.randint(4, 30000, (B, L)).astype(np.int32)),
        "q_mask": jnp.asarray(qm),
        "voxel_coords": jnp.asarray(coords),
        "voxel_feats": jnp.asarray(feats),
        "voxel_mask": jnp.asarray(mask),
        "auxiliary_task": jnp.asarray(
            np.concatenate([rng.rand(B, 3) * 4, np.tile([0, 0, 0, 1.0], (B, 1))], 1),
            dtype=jnp.float32),
        "answer_cat_scores": jnp.asarray(cats),
    }, coords, mask


def gather_roofline_sps(cfg) -> float:
    """Upper-bound samples/s from the encoder's conv gathers alone.

    Decoder stages (blocks 5-6) are dead code under jit for the QA forward
    (only feat_bottleneck is consumed) so they are excluded. Per conv the
    gather reads V_out*K rows of C_in channels (bf16)."""
    caps = cfg.sparse.capacities
    planes, init = cfg.sparse.planes, cfg.sparse.init_dim
    convs = [(caps[0], 125, cfg.sparse.in_channels)]       # conv0 k5
    chans = init
    for lvl in range(1, 5):
        convs.append((caps[lvl], 8, chans))                # strided k2
        p = planes[lvl - 1]
        convs.append((caps[lvl], 27, chans))               # block conv1
        convs.append((caps[lvl], 27, p))                   # block conv2
        for _ in range(cfg.sparse.layers[lvl - 1] - 1):
            convs.append((caps[lvl], 27, p))
            convs.append((caps[lvl], 27, p))
        chans = p
    byts = sum(v * k * c * 2 for v, k, c in convs)
    rows = sum(v * k for v, k, _ in convs)
    t = max(byts / GATHER_GBPS, rows / GATHER_ROWS)
    # kernel-map construction (on-device plan): one int32 gather per map
    # entry at the measured single-element rate — k5 map at level 0, k3
    # maps per level, k2 down maps (QA mode; decoder maps are DCE'd)
    map_rows = caps[0] * 125
    for lvl in range(1, 5):
        map_rows += caps[lvl] * 27 + caps[lvl] * 8
    t_plan = map_rows / MAP_ROWS
    return 1.0 / (t + t_plan), byts, rows, map_rows


def time_fn(fn, *args, iters=10):
    """Timed loop; completion forced via one scalar fetch per loop
    (block_until_ready is unreliable through the axon relay; per-call
    fetches would add a tunnel RTT each)."""
    out = fn(*args)  # compile + warm
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_blip2_decode(extra):
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.config import Config
    from situation3d_tpu.models.blip2_t5 import Blip2T5, predict_answers

    cfg = Config().blip2
    B, N, Lt, max_len = 8, cfg.qformer.scene_token_capacity, 64, 10
    rng = np.random.RandomState(0)
    model = Blip2T5(cfg, dtype=jnp.bfloat16)
    batch = {
        "pc_feat": jnp.asarray(rng.randn(B, N, cfg.pc_feat_dim)
                               .astype(np.float32), jnp.bfloat16),
        "pc": jnp.asarray(rng.randint(0, 256, (B, N, 3)).astype(np.int32)),
        "pc_mask": jnp.asarray(np.ones((B, N), np.int32)),
        "input_ids": jnp.asarray(rng.randint(2, 32000, (B, Lt))
                                 .astype(np.int32)),
        "input_mask": jnp.asarray(np.ones((B, Lt), np.int32)),
    }
    init_batch = {**batch, "labels": jnp.zeros((B, 4), jnp.int32),
                  "label_mask": jnp.ones((B, 4), jnp.int32)}
    # flan-t5-xl (~3B params) cannot init in f32 on a 16 GB chip
    # (RESOURCE_EXHAUSTED): materialize the param tree directly in bf16.
    # Values don't affect decode wall-time, and all-zero logits never emit
    # EOS, so the greedy while_loop runs the full max_len — a conservative
    # timing.
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b), init_batch)
    variables = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if s.dtype == jnp.float32 else s.dtype),
        shapes))()
    gen = jax.jit(lambda v, b: predict_answers(model, v, b, max_len))
    dt = time_fn(gen, variables, batch, iters=3)
    toks = B * max_len
    extra["blip2_decode_tokens_per_sec"] = round(toks / dt, 1)
    extra["blip2_decode_answers_per_sec"] = round(B / dt, 2)
    extra["blip2_decode_config"] = f"flan-t5-xl B={B} scene={N} gen={max_len}"


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.models.sig3d import SIG3D

    B = int(os.environ.get("BENCH_B", "8"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    rng = np.random.RandomState(0)
    batch, coords_np, mask_np = make_scene_batch(cfg, B, rng)

    model = SIG3D(cfg, num_answers=706, dtype=jnp.bfloat16)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        b, train=False))(batch)

    fwd = jax.jit(lambda v, b, k: model.apply(
        v, b, train=False, rngs={"sample": k})["answer_scores"])
    key = jax.random.PRNGKey(2)
    dt = time_fn(fwd, variables, batch, key, iters=10)
    scenes_per_sec = B / dt

    extra = {"batch_size": B}
    roofline_sps, byts, rows, map_rows = gather_roofline_sps(cfg)
    extra["gather_bytes_per_sample_mb"] = round(byts / 1e6, 1)
    extra["gather_rows_per_sample_m"] = round(rows / 1e6, 2)
    extra["map_rows_per_sample_m"] = round(map_rows / 1e6, 2)
    extra["gather_roofline_samples_per_sec"] = round(roofline_sps, 2)
    extra["pct_of_gather_roofline"] = round(
        100 * scenes_per_sec / roofline_sps, 1)

    if not fast:
        # ---- multi-question serving (scene-encoding reuse) ---------------
        # SQA3D averages ~6 questions/scene; the reference eval recomputes
        # the scene tower per question (eval.py:287-290, batch=1). With the
        # scene_tokens fast path (models/sig3d.py + eval/serving.py) the
        # gather-bound tower runs once per scene.
        try:
            full_out = jax.jit(lambda v, b, k: model.apply(
                v, b, train=False, rngs={"sample": k}))(variables, batch, key)
            q_batch = {k: v for k, v in batch.items()
                       if not k.startswith("voxel_")}
            q_batch["scene_tokens"] = full_out["att_feat_pre"]
            q_batch["scene_token_positions"] = full_out["scene_positions"]
            fwd_q = jax.jit(lambda v, b, k: model.apply(
                v, b, train=False, rngs={"sample": k})["answer_scores"])
            dt_q = time_fn(fwd_q, variables, q_batch, key, iters=10)
            extra["cached_scene_question_samples_per_sec"] = round(B / dt_q, 1)
            qps = 6  # questions per scene (SQA3D test-set average)
            t_scene = dt + (qps - 1) * dt_q   # 1 full pass + 5 cached
            extra["serving_6q_per_scene_samples_per_sec"] = round(
                qps * B / t_scene, 2)
        except Exception as e:
            extra["serving_error"] = repr(e)[:200]

        # ---- host-plan production path (prefetch overlaps plan build) ----
        try:
            from situation3d_tpu.sparse.host_plan import build_host_plan
            t0 = time.perf_counter()
            plan_np = build_host_plan(coords_np, mask_np,
                                      cfg.sparse.capacities)
            extra["host_plan_build_sec_per_batch"] = round(
                time.perf_counter() - t0, 3)
            # this box has 1 host core; production TPU VMs have ~100+ and
            # the builder threads/OpenMP-parallelizes across scenes
            extra["host_cores"] = os.cpu_count()
            plan = jax.tree_util.tree_map(jnp.asarray, plan_np)
            fwd_hp = jax.jit(lambda v, b, p, k: model.apply(
                v, {**b, "plan": p}, train=False,
                rngs={"sample": k})["answer_scores"])
            dt_hp = time_fn(fwd_hp, variables, batch, plan, key, iters=10)
            extra["hostplan_samples_per_sec"] = round(B / dt_hp, 3)
        except Exception as e:  # never lose the headline
            extra["hostplan_error"] = repr(e)[:200]

        # ---- training step ------------------------------------------------
        try:
            from situation3d_tpu.train.trainer import (create_train_state,
                                                       make_sig3d_optimizer,
                                                       make_train_step)
            state = create_train_state(cfg, model, batch, steps_per_epoch=100)
            tx, _ = make_sig3d_optimizer(cfg, state.params, 100)
            step = make_train_step(cfg, model, tx, donate=False)

            def run_step(s, b):
                ns, metrics = step(s, b)
                return metrics["loss"]

            dt_tr = time_fn(run_step, state, batch, iters=5)
            extra["train_samples_per_sec"] = round(B / dt_tr, 3)
        except Exception as e:
            extra["train_error"] = repr(e)[:200]

        # ---- Pallas FPS kernel: hardware check + speedup ------------------
        # (VERDICT r1 weak#7: interpret-mode tests alone don't prove the
        # Mosaic kernel runs on the chip — this records it every bench run)
        try:
            from situation3d_tpu.ops.pallas.fps import fps_pallas
            from situation3d_tpu.ops.pointnet2 import furthest_point_sample
            xyz = jnp.asarray(rng.randn(4, 4096, 3).astype(np.float32))
            f_pal = jax.jit(lambda x: fps_pallas(x, 512))
            f_xla = jax.jit(lambda x: furthest_point_sample(x, 512))
            got = np.asarray(f_pal(xyz))
            want = np.asarray(f_xla(xyz))
            extra["fps_pallas_matches_xla_on_tpu"] = bool((got == want).all())
            dt_p = time_fn(f_pal, xyz, iters=5)
            dt_x = time_fn(f_xla, xyz, iters=5)
            extra["fps_pallas_speedup"] = round(dt_x / dt_p, 2)
        except Exception as e:
            extra["fps_error"] = repr(e)[:200]

        # ---- Blip2T5 greedy decode ---------------------------------------
        if os.environ.get("BENCH_BLIP2", "1") == "1":
            try:
                bench_blip2_decode(extra)
            except Exception as e:
                extra["blip2_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": "sig3d_sqa3d_inference_throughput",
        "value": round(scenes_per_sec, 3),
        "unit": "scene_qa_samples/sec/chip",
        "vs_baseline": None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
