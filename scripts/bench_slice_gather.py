"""Chip microbench: gather GB/s vs request size on [R, 128] bf16 tables.

Decides whether consolidating the z-window conv0's 20 x 256 B window rows
into 4 x (5, 128)-slice reads (x-fastest grid layout) would pay: the
measured engine behavior so far is bytes-bound ~13-18 GB/s for >=64 B
rows, but if larger contiguous requests stream faster, conv0's ~245
MB/sample window traffic drops below its current ~16 ms share.

Caveat from round 2: `lax.gather` with slice_sizes was a TRAP on the
int32 index grids ((5,5,5) blocks 1.9x slower, (1,1,5) z-rows 33x) —
this measures the [R, 128]-lane bf16 table case instead, which is the
one conv0 would use.

Run: `python scripts/bench_slice_gather.py` (~5-10 min cold compile).
Writes /tmp/bench_slice_gather.json.
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
    R = 1 << 21                      # 2M rows x 256 B = 512 MB table
    N_BYTES = 256 << 20              # fetch 256 MB per variant call

    table = jax.jit(lambda k: jax.random.normal(k, (R, 128), jnp.bfloat16))(key)

    variants = {}

    # row gathers at 256 B (take_along_axis style — the current zwin read)
    n1 = N_BYTES // 256
    idx1 = jax.jit(lambda k: jax.random.randint(k, (n1,), 0, R, jnp.int32))(key)
    variants["rows_256B"] = (
        jax.jit(lambda t, i: t[i].astype(jnp.float32).sum(axis=0)),
        (table, idx1), n1)

    # (S, 128) slice gathers: S consecutive rows per request
    for S in (2, 5, 8, 16):
        nS = N_BYTES // (256 * S)
        idxS = jax.jit(lambda k, s=S, n=nS: jax.random.randint(
            k, (n, 1), 0, R - s, jnp.int32))(key)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))

        def f(t, i, s=S, dn=dn):
            g = jax.lax.gather(
                t, i, dn, slice_sizes=(s, 128),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            return g.astype(jnp.float32).sum(axis=(0, 1))

        variants[f"slices_{S}x128"] = (jax.jit(f), (table, idxS), nS)

    out = {}
    times = {k: [] for k in variants}
    for rep in range(3):
        for name, (fn, args, nreq) in variants.items():
            dt = time_fn(fn, *args, iters=4)
            gbps = N_BYTES / dt / 1e9
            times[name].append(gbps)
            print(f"rep{rep} {name}: {gbps:.2f} GB/s "
                  f"({nreq / dt / 1e6:.1f} Mreq/s)", flush=True)
    for name, v in times.items():
        out[name + "_gbps"] = round(max(v), 2)
        out[name + "_all"] = [round(x, 2) for x in v]

    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/bench_slice_gather.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
