"""Chip microbench: is an int8 z-window conv0 viable?

Three questions, each a tiny program (fast relay compiles):
  1. XLA row-gather rate on [*, 128] int8 rows (128 B) vs the production
     [*, 128] bf16 rows (256 B) — the measured-facts table only covers
     >=64 B rows generically; int8 gathers could hit a scalar path.
  2. dot(convert(int8->bf16)) — does XLA fuse the convert into the MXU
     operand or materialize a bf16 copy (which would eat the win)?
  3. packed-int32 single-scalar scatter (1 write/voxel) vs the production
     3-scalar-per-voxel scatter.

Interleaved 3 rounds (single-shot drifts up to 2x on this chip).
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
    n_rows = 1 << 19            # 512k rows: ~64 MB i8 / 128 MB bf16
    n_idx = 1 << 21             # 2M gathered rows (~ conv0's 8x49152x20/8)
    tab_bf = jax.jit(lambda k: jax.random.normal(
        k, (n_rows, 128), jnp.bfloat16))(key)
    tab_i8 = jax.jit(lambda k: jax.random.randint(
        k, (n_rows, 128), -128, 127, jnp.int8))(key)
    idx = jax.jit(lambda k: jax.random.randint(
        k, (n_idx,), 0, n_rows, jnp.int32))(key)

    f_bf = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())
    f_i8 = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())

    # 2) gather -> convert -> matmul, conv0-like contraction shape
    V = 49152
    widx = jax.jit(lambda k: jax.random.randint(
        k, (V * 20,), 0, n_rows, jnp.int32))(key)
    W = jax.jit(lambda k: jax.random.normal(
        k, (2560, 1024), jnp.bfloat16))(key)

    def mm_bf(t, i, w):
        win = t[i].reshape(V, 2560)
        return jnp.einsum("vm,mq->vq", win, w,
                          preferred_element_type=jnp.float32).sum()

    def mm_i8(t, i, w):
        win = t[i].astype(jnp.bfloat16).reshape(V, 2560)
        return jnp.einsum("vm,mq->vq", win, w,
                          preferred_element_type=jnp.float32).sum()

    f_mm_bf = jax.jit(mm_bf)
    f_mm_i8 = jax.jit(mm_i8)

    # 3) scatter: 3 scalar writes/voxel (bf16) vs 1 packed int32/voxel
    Vs = 49152
    rows = jax.jit(lambda k: jax.random.randint(
        k, (Vs,), 0, n_rows, jnp.int32))(key)
    lanes = jax.jit(lambda k: 4 * jax.random.randint(
        k, (Vs,), 0, 32, jnp.int32))(key)
    vals = jax.jit(lambda k: jax.random.normal(
        k, (Vs, 3), jnp.bfloat16))(key)
    pvals = jax.jit(lambda k: jax.random.randint(
        k, (Vs,), 0, 1 << 30, jnp.int32))(key)

    def sc_bf(rows, lanes, vals):
        g = jnp.zeros((n_rows, 128), jnp.bfloat16)
        r3 = jnp.broadcast_to(rows[:, None], (Vs, 3)).reshape(-1)
        l3 = (lanes[:, None] + jnp.arange(3, dtype=jnp.int32)).reshape(-1)
        g = g.at[r3, l3].set(vals.reshape(-1), mode="drop")
        return g.astype(jnp.float32).sum()

    def sc_i32(rows, lanes, pvals):
        g = jnp.zeros((n_rows, 32), jnp.int32)
        g = g.at[rows, lanes // 4].set(pvals, mode="drop")
        return jax.lax.bitcast_convert_type(g, jnp.int8) \
            .astype(jnp.float32).sum()

    f_sc_bf = jax.jit(sc_bf)
    f_sc_i32 = jax.jit(sc_i32)

    cases = {
        "gather_bf16_256B": (f_bf, (tab_bf, idx)),
        "gather_int8_128B": (f_i8, (tab_i8, idx)),
        "gmm_bf16": (f_mm_bf, (tab_bf, widx, W)),
        "gmm_int8": (f_mm_i8, (tab_i8, widx, W)),
        "scatter_bf16_3w": (f_sc_bf, (rows, lanes, vals)),
        "scatter_i32_1w": (f_sc_i32, (rows, lanes, pvals)),
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
    out["gather_int8_gbps"] = round(n_idx * 128 / (out["gather_int8_128B_ms"] / 1e3) / 1e9, 2)
    out["gather_bf16_gbps"] = round(n_idx * 256 / (out["gather_bf16_256B_ms"] / 1e3) / 1e9, 2)
    out["gather_speedup"] = round(out["gather_bf16_256B_ms"] / out["gather_int8_128B_ms"], 2)
    out["gmm_speedup"] = round(out["gmm_bf16_ms"] / out["gmm_int8_ms"], 2)
    out["scatter_speedup"] = round(out["scatter_bf16_3w_ms"] / out["scatter_i32_1w_ms"], 2)
    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_int8.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
