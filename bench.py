"""Benchmark: SIG3D scene-QA inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is end-to-end scene-QA samples/sec/chip — tokenized question +
voxelized scene in, answer logits out, including on-device kernel-map
construction (the analogue of the reference's eval loop at
``situation3d/eval/eval.py:287-290``, which runs MinkowskiEngine + BERT +
fusion per sample on GPU). The reference publishes no numbers
(BASELINE.json "published": {}), so vs_baseline is null until a measured
PyTorch baseline exists.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.models.sig3d import SIG3D

    B = 2
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    rng = np.random.RandomState(0)
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
    batch = {
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
    }

    model = SIG3D(cfg, num_answers=706, dtype=jnp.bfloat16)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        b, train=False))(batch)

    fwd = jax.jit(lambda v, b, k: model.apply(
        v, b, train=False, rngs={"sample": k})["answer_scores"])

    # warmup / compile
    out = fwd(variables, batch, jax.random.PRNGKey(2))
    _ = float(out[0, 0])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(variables, batch, jax.random.PRNGKey(3 + i))
    _ = float(out[0, 0])
    dt = time.perf_counter() - t0
    scenes_per_sec = B * iters / dt

    print(json.dumps({
        "metric": "sig3d_sqa3d_inference_throughput",
        "value": round(scenes_per_sec, 3),
        "unit": "scene_qa_samples/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
