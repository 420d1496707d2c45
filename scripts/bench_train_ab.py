"""One-process interleaved A/B of the SIG3D TRAIN STEP under a config
override (VERDICT r4 #4: the train number has been 10.14 samples/s,
builder-measured, since round 3 and never had a perf round).

Usage::

    python scripts/bench_train_ab.py "sparse.conv0_int8=true" [more...]

Times make_train_step (forward incl. train-mode BN batch stats + loss +
backward + adamw update) for the default config and the override config,
interleaved (single-shot chip numbers drift; CLAUDE.md). Full-depth
compiles are ~1200 s each through the relay — expect ~40-80 min total.
Set AB_REDUCED=1 for the 8x1-layers reduced-depth variant (~half).
Set AB_BASE="k=v;k=v" to apply overrides to BOTH sides (e.g.
AB_BASE="train.frozen_prefixes=()" to A/B an unfrozen-encoder step).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.models.sig3d import SIG3D
    from situation3d_tpu.train.trainer import (TrainState,
                                               make_sig3d_optimizer,
                                               make_train_step)

    overrides = [o for a in sys.argv[1:] for o in a.split(";") if o]
    assert overrides, "pass at least one dot-key override"
    B = int(os.environ.get("BENCH_B", "8"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    iters = int(os.environ.get("AB_ITERS", "5"))
    reduced = ["sparse.layers=[1,1,1,1,1,1,1,1]"] \
        if os.environ.get("AB_REDUCED") else []
    shared = [o for o in os.environ.get("AB_BASE", "").split(";") if o]

    base = ["data.num_answers=706", *reduced, *shared]
    cfg_a = apply_overrides(Config(), base)
    cfg_b = apply_overrides(Config(), base + overrides)
    batch, _, _ = bench.make_scene_batch(cfg_a, B, np.random.RandomState(0))

    steps = []
    for tag, cfg in (("a", cfg_a), ("b", cfg_b)):
        model = SIG3D(cfg, num_answers=706, dtype=jnp.bfloat16)
        v_shapes = jax.eval_shape(lambda b, m=model: m.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)}, b, train=False), batch)
        lv, td = jax.tree_util.tree_flatten(v_shapes)
        v = jax.jit(lambda td=td, lv=lv: jax.tree_util.tree_unflatten(td, [
            0.02 * jax.random.normal(jax.random.fold_in(
                jax.random.PRNGKey(1), i), s.shape, s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else jnp.zeros(s.shape, s.dtype) for i, s in enumerate(lv)]))()
        tx, _ = make_sig3d_optimizer(cfg, v["params"], 100)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=v["params"],
            batch_stats=v.get("batch_stats", {}),
            opt_state=jax.jit(tx.init)(v["params"]),
            rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, donate=False)

        def run(s, b, step=step):
            ns, metrics = step(s, b)
            return metrics["loss"]

        t0 = time.monotonic()
        _ = float(np.asarray(run(state, batch)).ravel()[0])
        print(f"compile {tag}: {time.monotonic() - t0:.1f}s", flush=True)
        steps.append((tag, run, state))

    times = {"a": [], "b": []}
    for rnd in range(rounds):
        for tag, run, state in steps:
            dt = bench.time_fn(run, state, batch, iters=iters)
            times[tag].append(B / dt)
            print(f"round {rnd} {tag}: {B / dt:.3f} samples/s", flush=True)

    out = {
        "overrides": overrides, "B": B, "reduced": bool(reduced),
        "base": shared,
        "a_train_samples_per_sec_best": round(max(times["a"]), 3),
        "b_train_samples_per_sec_best": round(max(times["b"]), 3),
        "a_median": round(sorted(times["a"])[len(times["a"]) // 2], 3),
        "b_median": round(sorted(times["b"])[len(times["b"]) // 2], 3),
    }
    out["b_over_a_best"] = round(
        out["b_train_samples_per_sec_best"]
        / out["a_train_samples_per_sec_best"], 4)
    print(json.dumps(out), flush=True)
    with open("/tmp/bench_train_ab.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
