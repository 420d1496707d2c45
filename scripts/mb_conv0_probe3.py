"""Chip probe #3: the REAL conv0 stage (exact production function, real
headline coords, bc=2 direct) across the int8 design matrix — because the
standalone pieces (probe #2: scat 3.7 + gath 4.0 + mm 1.8 ms/sample) and
the end-to-end A/Bs (v1 taa+nonuniq: 12.38 samples/s, v2 flat+uniq: 7.40)
tell contradictory stories. Variants:

  plain       production bf16 z-window conv0
  i8_taa_nu   int8, take_along_axis gather, non-unique scatter   (= v1)
  i8_taa_u    int8, take_along_axis gather, unique scatter
  i8_flat_nu  int8, flat t[i] gather, non-unique scatter
  i8_flat_u   int8, flat t[i] gather, unique scatter             (= v2)
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

    bc = 2
    cfg = apply_overrides(Config(), ["data.num_answers=706"])
    sp = cfg.sparse
    extent = tuple(sp.grid_extent)
    batch, _, _ = make_scene_batch(cfg, bc, np.random.RandomState(0))
    coords, mask = batch["voxel_coords"], batch["voxel_mask"]
    V = coords.shape[1]
    key = jax.random.PRNGKey(1)
    feats = jax.jit(lambda k, m: jax.random.uniform(
        k, (bc, V, 3), jnp.bfloat16) * 255 * m[..., None])(key, mask)
    kernel = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (125, 3, sp.init_dim), jnp.float32))(key)

    def f(int8, flat, uniq):
        return jax.jit(lambda f_, c, m, k: sparse_conv0_zwin(
            f_, c, m, k, extent, batch_chunk=bc, int8_grid=int8,
            _int8_flat_gather=flat, _int8_unique_scatter=uniq)[0].sum())

    cases = {
        "plain": f(False, True, True),
        "i8_taa_nu": f(True, False, False),
        "i8_taa_u": f(True, False, True),
        "i8_flat_nu": f(True, True, False),
        "i8_flat_u": f(True, True, True),
    }
    args = (feats, coords, mask, kernel)
    for name, fn in cases.items():
        t0 = time.monotonic()
        rr = fn(*args)
        _ = float(np.asarray(rr).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    out = {}
    times = {k: [] for k in cases}
    for rep in range(3):
        for name, fn in cases.items():
            dt = time_fn(fn, *args, iters=8)
            per = dt / bc * 1e3
            times[name].append(per)
            print(f"rep{rep} {name}: {per:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    print(json.dumps(out), flush=True)
    with open("/tmp/mb_conv0_probe3.json", "w") as fjson:
        json.dump(out, fjson)


if __name__ == "__main__":
    main()
