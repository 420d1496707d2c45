"""Chip microbench #2: the composed int8 conv0 path —
scatter packed int32 -> bitcast to int8 rows -> window gather -> matmul.
Checks that the bitcast view doesn't force a relayout copy between the
scatter and the gather (the [n_rows, 32] int32 parent lane-pads 4x if
materialized; XLA may or may not see through it).
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

    from bench import time_fn

    key = jax.random.PRNGKey(0)
    n_rows = 450_048           # ~ the real conv0 grid at (320,320,128)
    V = 49152
    rows = jax.jit(lambda k: jax.random.randint(
        k, (V,), 0, n_rows, jnp.int32))(key)
    lanes32 = jax.jit(lambda k: jax.random.randint(
        k, (V,), 0, 32, jnp.int32))(key)
    pvals = jax.jit(lambda k: jax.random.randint(
        k, (V,), 0, 1 << 30, jnp.int32))(key)
    widx = jax.jit(lambda k: jax.random.randint(
        k, (V * 20,), 0, n_rows, jnp.int32))(key)
    W = jax.jit(lambda k: jax.random.normal(
        k, (2560, 1024), jnp.bfloat16))(key)
    fvals = jax.jit(lambda k: jax.random.normal(
        k, (V, 3), jnp.bfloat16))(key)

    def composed_i8(rows, lanes32, pvals, widx, w):
        g32 = jnp.zeros((n_rows, 32), jnp.int32)
        g32 = g32.at[rows, lanes32].set(pvals, mode="drop")
        g8 = jax.lax.bitcast_convert_type(g32, jnp.int8).reshape(n_rows, 128)
        win = g8[widx].astype(jnp.bfloat16).reshape(V, 2560)
        return jnp.einsum("vm,mq->vq", win, w,
                          preferred_element_type=jnp.float32).sum()

    def composed_bf16(rows, lanes32, fvals, widx, w):
        g = jnp.zeros((n_rows, 128), jnp.bfloat16)
        r3 = jnp.broadcast_to(rows[:, None], (V, 3)).reshape(-1)
        l3 = (lanes32[:, None] * 4
              + jnp.arange(3, dtype=jnp.int32)).reshape(-1)
        g = g.at[r3, l3].set(fvals.reshape(-1), mode="drop")
        win = g[widx].reshape(V, 2560)
        return jnp.einsum("vm,mq->vq", win, w,
                          preferred_element_type=jnp.float32).sum()

    cases = {
        "composed_bf16": (jax.jit(composed_bf16), (rows, lanes32, fvals, widx, W)),
        "composed_i8": (jax.jit(composed_i8), (rows, lanes32, pvals, widx, W)),
    }
    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        r = fn(*args)
        _ = float(np.asarray(r).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    out = {}
    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8)
            times[name].append(dt * 1e3)
            print(f"rep{rep} {name}: {dt * 1e3:.3f} ms", flush=True)
    for k, v in times.items():
        out[k + "_ms"] = round(min(v), 3)
    out["composed_speedup"] = round(
        out["composed_bf16_ms"] / out["composed_i8_ms"], 2)
    print(json.dumps(out), flush=True)
    with open("/tmp/mb_int8_compose.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
