"""Chip probe #2: conv0 scatter/gather reformulations.

Probe #1 (mb_conv0_probe.py) decomposed conv0's 36 ms/sample into
scatter 16.5 + gather 17.5 + matmul ~2, and showed the batched
take_along_axis gather gains nothing from int8 (17.5 -> 16.7) even
though FLAT unbatched int8 row gathers measured 3.7x faster
(mb_int8_gather.py). Variants:

  scat_bf16        baseline 3-scalar-per-voxel scatter (production)
  scat_bf16_uniq   + unique_indices=True (they ARE unique)
  scat_i8_uniq     packed int32 1-write scatter + unique_indices=True
  gath_to_bf16     batched take_along_axis, bf16 (baseline)
  gath_flat_bf16   FLAT t[i] gather over [bc*n_rows, 128] bf16
  gath_flat_i8     FLAT t[i] gather over [bc*n_rows, 128] int8
  gath_flat_i8_mm  flat int8 gather + the 2560-deep phase matmul

All inputs are generated ON DEVICE (probe #1 shipped ~20 MB of numpy
through the 0.07 GB/s relay and paid ~15 min for it).
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

    # real conv0 geometry at the default extent (320, 320, 128)
    X, Y, Z = 320, 320, 128
    PAD = 2
    XP = X + 2 * PAD
    NYG = (Y + 1) // 4 + 2
    ZC = (Z - 1) // 8 + 2
    n_rows = XP * ZC * NYG
    bc, V = 2, 49152
    key = jax.random.PRNGKey(0)

    # device-generated synthetic coords with conv0-like locality: sorted
    # unique-ish voxels -> row/lane/window indices computed on device
    def make_idx(key):
        kx, ky, kz = jax.random.split(key, 3)
        c = jnp.stack([
            jax.random.randint(kx, (bc, V), 0, X),
            jax.random.randint(ky, (bc, V), 0, Y),
            jax.random.randint(kz, (bc, V), 0, Z)], axis=-1)
        # sort by flat id to mimic np.unique's lexicographic order
        flat = (c[..., 0] * Y + c[..., 1]) * Z + c[..., 2]
        order = jnp.argsort(flat, axis=1)
        c = jnp.take_along_axis(c, order[..., None], axis=1)
        xp, yp, zp = c[..., 0] + PAD, c[..., 1] + PAD, c[..., 2] + PAD
        row = (xp * ZC + (zp >> 3)) * NYG + (yp >> 2)
        lane32 = (yp & 3) * 8 + (zp & 7)
        dxs = jnp.arange(-PAD, PAD + 1)
        c0 = (zp - PAD) >> 3
        g0 = (yp - PAD) >> 2
        r = ((xp[..., None, None, None] + dxs[None, None, :, None, None])
             * ZC + c0[..., None, None, None]
             + jnp.arange(2)[None, None, None, :, None]) \
            * NYG + g0[..., None, None, None] \
            + jnp.arange(2)[None, None, None, None, :]
        return row.astype(jnp.int32), lane32.astype(jnp.int32), \
            jnp.clip(r, 0, n_rows - 1).reshape(bc, V * 20).astype(jnp.int32)

    row, lane32, r = jax.jit(make_idx)(key)
    word = jax.jit(lambda k: jax.random.randint(
        k, (bc, V), 0, 1 << 30, jnp.int32))(key)
    f3 = jax.jit(lambda k: jax.random.normal(
        k, (bc, V, 3), jnp.bfloat16))(key)
    tab_bf = jax.jit(lambda k: jax.random.normal(
        k, (bc, n_rows, 128), jnp.bfloat16))(key)
    tabf_bf = jax.jit(lambda k: jax.random.normal(
        k, (bc * n_rows, 128), jnp.bfloat16))(key)
    tabf_i8 = jax.jit(lambda k: jax.random.randint(
        k, (bc * n_rows, 128), -128, 127, jnp.int8))(key)
    WP = jax.jit(lambda k: jax.random.normal(
        k, (2560, 1024), jnp.bfloat16))(key)
    rflat = jax.jit(lambda r: (
        r + (jnp.arange(bc, dtype=jnp.int32) * n_rows)[:, None]
    ).reshape(-1))(r)

    def scat_bf16(row, lane32, f3, uniq):
        bidx = jnp.arange(bc)[:, None]
        r3 = jnp.broadcast_to(row[..., None], (bc, V, 3)).reshape(bc, -1)
        l3 = (lane32[..., None] * 4
              + jnp.arange(3, dtype=jnp.int32)).reshape(bc, -1)
        g = jnp.zeros((bc, n_rows, 128), jnp.bfloat16)
        g = g.at[bidx, r3, l3].set(f3.reshape(bc, -1), mode="drop",
                                   unique_indices=uniq)
        return g.astype(jnp.float32).sum()

    def scat_i8_uniq(row, lane32, word):
        bidx = jnp.arange(bc)[:, None]
        g32 = jnp.zeros((bc, n_rows, 32), jnp.int32)
        g32 = g32.at[bidx, row, lane32].set(word, mode="drop",
                                            unique_indices=True)
        g8 = jax.lax.bitcast_convert_type(g32, jnp.int8) \
            .reshape(bc, n_rows, 128)
        return g8.astype(jnp.float32).sum()

    def gath_to(tab, r):
        win = jnp.take_along_axis(tab, r[..., None], axis=1)
        return win.astype(jnp.float32).sum()

    def gath_flat(tab, rf):
        return tab[rf].astype(jnp.float32).sum()

    def gath_flat_mm(tab, rf, wp):
        win = tab[rf].astype(jnp.bfloat16).reshape(bc, V, 2560)
        return jnp.einsum("bvm,mq->bvq", win, wp,
                          preferred_element_type=jnp.float32).sum()

    cases = {
        "scat_bf16": (jax.jit(lambda a, b, c: scat_bf16(a, b, c, False)),
                      (row, lane32, f3)),
        "scat_bf16_uniq": (jax.jit(lambda a, b, c: scat_bf16(a, b, c, True)),
                           (row, lane32, f3)),
        "scat_i8_uniq": (jax.jit(scat_i8_uniq), (row, lane32, word)),
        "gath_to_bf16": (jax.jit(gath_to), (tab_bf, r)),
        "gath_flat_bf16": (jax.jit(gath_flat), (tabf_bf, rflat)),
        "gath_flat_i8": (jax.jit(gath_flat), (tabf_i8, rflat)),
        "gath_flat_i8_mm": (jax.jit(gath_flat_mm), (tabf_i8, rflat, WP)),
    }
    for name, (fn, args) in cases.items():
        t0 = time.monotonic()
        rr = fn(*args)
        _ = float(np.asarray(rr).ravel()[0])
        print(f"compile {name}: {time.monotonic() - t0:.1f}s", flush=True)

    out = {}
    times = {k: [] for k in cases}
    for rep in range(3):
        for name, (fn, args) in cases.items():
            dt = time_fn(fn, *args, iters=8)
            per = dt / bc * 1e3
            times[name].append(per)
            print(f"rep{rep} {name}: {per:.3f} ms/sample", flush=True)
    for k, v in times.items():
        out[k + "_ms_per_sample"] = round(min(v), 3)
    print(json.dumps(out), flush=True)
    with open("/tmp/mb_conv0_probe2.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
