"""Microbenchmark: XLA take_along_axis vs Pallas VMEM gather on the chip.

Run on the real TPU (no args): prints rows/s + GB/s for the sparse-conv
gather shapes of the MinkUNet levels. Informs sparse.pallas_gather.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.ops.pallas.gather import gather_fits_vmem, vmem_gather_rows


def timed(fn, *args, iters=20):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    # (V_table, C, K) per UNet level: R = V*K gathered rows per sample
    shapes = [(12288, 128, 27), (6144, 256, 27), (24576, 64, 27)]
    B = 2
    for V, C, K in shapes:
        R = V * K
        R = (R // 256) * 256
        table = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, V, (B, R)).astype(np.int32))

        xla = jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], 1))
        dt = timed(xla, table, idx)
        rows = B * R / dt
        print(f"V={V} C={C} R={R}  XLA:    {rows/1e6:8.1f} Mrows/s "
              f"{rows*C*4/1e9:6.1f} GB/s  ({dt*1e3:.2f} ms)")

        if gather_fits_vmem(V, C):
            for blk in (128, 256, 512):
                if R % blk:
                    continue
                fn = jax.jit(lambda t, i, b=blk: vmem_gather_rows(t, i, b))
                try:
                    dt = timed(fn, table, idx)
                except Exception as e:
                    print(f"  pallas blk={blk}: FAILED {repr(e)[:120]}")
                    continue
                rows = B * R / dt
                print(f"V={V} C={C} R={R}  pallas{blk:4d}: {rows/1e6:8.1f} "
                      f"Mrows/s {rows*C*4/1e9:6.1f} GB/s  ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
