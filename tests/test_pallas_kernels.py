"""Pallas kernel tests (interpret mode on CPU; the same kernels compile via
Mosaic on TPU — verified on hardware, see ops/pallas/fps.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.ops.pallas.fps import fps_pallas
from situation3d_tpu.ops.pointnet2 import furthest_point_sample


def test_fps_pallas_matches_xla(rng):
    xyz = rng.randn(2, 300, 3).astype(np.float32)
    xyz[0, 50:70] = 0.0  # origin padding
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 64, interpret=True))
    want = np.asarray(furthest_point_sample(jnp.asarray(xyz), 64))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_lane_padding(rng):
    """N not a multiple of 128: padding rows (zeros) must never be picked."""
    xyz = rng.rand(1, 200, 3).astype(np.float32) + 1.0
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 16, interpret=True))
    assert (got < 200).all()
    want = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    np.testing.assert_array_equal(got, want)


def test_vmem_gather_rows_matches_take(rng):
    from jax.experimental.pallas import tpu as pltpu

    from situation3d_tpu.ops.pallas.gather import (gather_fits_vmem,
                                                   vmem_gather_rows)
    B, V, C, R = 2, 96, 128, 512
    table = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, (B, R)).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        out = vmem_gather_rows(table, idx)
    want = np.take_along_axis(np.asarray(table), np.asarray(idx)[..., None],
                              axis=1)
    np.testing.assert_allclose(np.asarray(out), want)
    # VMEM budget: level-3/4 UNet tables fit, level-0 (C=3 -> 128-pad at
    # V=49152) does not
    assert gather_fits_vmem(12288, 128)
    assert gather_fits_vmem(6144, 256)
    assert not gather_fits_vmem(49152, 128)


def test_sparse_conv_pallas_gather_equivalence(rng):
    """sparse_conv_apply(pallas_gather=True) == the XLA gather path,
    including misses (idx == V_in) and a non-block-multiple V_out."""
    from jax.experimental.pallas import tpu as pltpu

    from situation3d_tpu.sparse.conv import sparse_conv_apply
    B, V_in, V_out, C_in, C_out, K = 2, 200, 150, 128, 32, 8
    feats = jnp.asarray(rng.randn(B, V_in, C_in).astype(np.float32))
    idx = rng.randint(0, V_in + 1, (B, V_out, K)).astype(np.int32)  # incl. miss
    kernel = jnp.asarray(rng.randn(K, C_in, C_out).astype(np.float32) * 0.1)
    want = sparse_conv_apply(feats, jnp.asarray(idx), kernel)
    with pltpu.force_tpu_interpret_mode():
        got = sparse_conv_apply(feats, jnp.asarray(idx), kernel,
                                pallas_gather="force")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vmem_gather_grad_matches_xla(rng):
    """custom_vjp backward (deterministic scatter-add) == XLA gather grad."""
    from jax.experimental.pallas import tpu as pltpu

    from situation3d_tpu.ops.pallas.gather import vmem_gather_rows
    B, V, C, R = 2, 64, 128, 256
    table = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, (B, R)).astype(np.int32))
    ct = jnp.asarray(rng.randn(B, R, C).astype(np.float32))

    def loss_p(t):
        return jnp.sum(vmem_gather_rows(t, idx) * ct)

    def loss_x(t):
        return jnp.sum(jnp.take_along_axis(t, idx[..., None], 1) * ct)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(table)
    gx = jax.grad(loss_x)(table)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-5, atol=1e-5)
