"""One-process interleaved A/B of the end-to-end headline under a config
override.

Usage::

    python scripts/bench_ab.py "sparse.pallas_map=true" [more overrides...]

Compiles the default config and the override config in ONE process, then
times them in interleaved rounds (single-shot microbenches on this chip
drift up to 2x run-to-run; interleaved end-to-end repeats are the only
reliable way to call a default — CLAUDE.md measured notes). Prints one
JSON line with both rates and the ratio.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (repo-root bench.py: scene maker + timing)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.models.sig3d import SIG3D

    overrides = [o for a in sys.argv[1:] for o in a.split(";") if o]
    assert overrides, "pass at least one dot-key override"
    B = int(os.environ.get("BENCH_B", "8"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    iters = int(os.environ.get("AB_ITERS", "10"))

    cfg_a = apply_overrides(Config(), ["data.num_answers=706"])
    cfg_b = apply_overrides(Config(), ["data.num_answers=706", *overrides])
    batch, _, _ = bench.make_scene_batch(cfg_a, B, np.random.RandomState(0))
    key = jax.random.PRNGKey(2)

    fwds = []
    for tag, cfg in (("a", cfg_a), ("b", cfg_b)):
        model = SIG3D(cfg, num_answers=706, dtype=jnp.bfloat16)
        variables = jax.jit(lambda b, m=model: m.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            b, train=False))(batch)
        fwd = jax.jit(lambda v, b, k, m=model: m.apply(
            v, b, train=False, rngs={"sample": k})["answer_scores"])
        t0 = time.monotonic()
        _ = float(np.asarray(fwd(variables, batch, key)).ravel()[0])
        print(f"compile {tag}: {time.monotonic() - t0:.1f}s", flush=True)
        fwds.append((tag, fwd, variables))

    times = {"a": [], "b": []}
    for r in range(rounds):
        for tag, fwd, variables in fwds:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(variables, batch, key)
            _ = float(np.asarray(out).ravel()[0])
            times[tag].append((time.perf_counter() - t0) / iters)
            print(f"round {r} {tag}: {B / times[tag][-1]:.3f} samples/s",
                  flush=True)

    best = {t: B / min(v) for t, v in times.items()}
    med = {t: B / sorted(v)[len(v) // 2] for t, v in times.items()}
    print(json.dumps({
        "overrides": overrides, "B": B,
        "a_samples_per_sec_best": round(best["a"], 3),
        "b_samples_per_sec_best": round(best["b"], 3),
        "a_median": round(med["a"], 3), "b_median": round(med["b"], 3),
        "b_over_a_best": round(best["b"] / best["a"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
