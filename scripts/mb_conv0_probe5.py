"""Chip probe #5: the REAL sparse_conv0_zwin under the probe-#4 bf16
variants, in situ (DESIGN.md §14's lesson: standalone wins don't always
survive the function's layout/fusion context — measure the real fn).

Variants (interleaved, 3 reps, min):
  base       production (take_along_axis gather, plain scatter)
  uniq       unique_indices=True on the grid scatter
  flat       flat t[i] window gather from the [bc*n_rows, 128] grid
  flat_uniq  both

Also checks bit-exactness of every variant against base on the chip.
Results: /tmp/mb_conv0_probe5.json; DESIGN.md §15 quotes them.
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
    from situation3d_tpu.sparse.conv import sparse_conv0_zwin

    from bench import make_scene_batch, time_fn

    B = int(os.environ.get("BENCH_B", "8"))
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    sp = cfg.sparse
    extent = tuple(sp.grid_extent)
    batch, _, _ = make_scene_batch(cfg, B, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]
    rng = np.random.RandomState(1)
    f0 = jnp.asarray(rng.randn(B, coords.shape[1], sp.in_channels)
                     .astype(np.float32), jnp.bfloat16)
    f0 = f0 * mask[..., None]
    w0 = jnp.asarray(rng.randn(125, sp.in_channels, sp.init_dim)
                     .astype(np.float32), jnp.bfloat16)

    def mk(flat, uniq):
        return jax.jit(lambda f, c, m, k: sparse_conv0_zwin(
            f, c, m, k, extent, flat_gather=flat, unique_scatter=uniq
        )[0].astype(jnp.float32).sum())

    cases = {
        "base": mk(False, False),
        "uniq": mk(False, True),
        "flat": mk(True, False),
        "flat_uniq": mk(True, True),
    }
    args = (f0, coords, mask, w0)

    vals = {}
    for name, fn in cases.items():
        t0 = time.monotonic()
        vals[name] = float(np.asarray(fn(*args)).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s "
              f"(sum={vals[name]:.6g})", flush=True)
    out = {"B": B,
           "all_variants_sum_equal": all(
               v == vals["base"] for v in vals.values())}

    times = {k: [] for k in cases}
    for rep in range(3):
        for name, fn in cases.items():
            dt = time_fn(fn, *args, iters=8) / B * 1e3
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)

    print(json.dumps(out, indent=2), flush=True)
    with open("/tmp/mb_conv0_probe5.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
