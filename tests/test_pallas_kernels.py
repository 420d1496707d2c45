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


def _xla_conv_ref(feats, idx, kernel):
    """Reference: per-offset gather-matmul with miss -> zero (both the
    engine's miss == V_in and -1 conventions)."""
    B, V_in, C_in = feats.shape
    K = kernel.shape[0]
    valid = (idx >= 0) & (idx < V_in)
    safe = np.where(valid, idx, 0)
    out = np.zeros((B, idx.shape[1], kernel.shape[-1]), np.float32)
    for b in range(B):
        for k in range(K):
            g = feats[b, safe[b, :, k]] * valid[b, :, k, None]
            out[b] += g.astype(np.float32) @ kernel[k].astype(np.float32)
    return out


def test_fused_conv_matches_reference(rng):
    """fused_sparse_conv == gather-matmul for every packing factor
    (P=4/2/1 and the 2-lane-tile C=256 row), miss conventions, and
    non-block-multiple V_out / non-P-multiple V_in."""
    from situation3d_tpu.ops.pallas.fused_conv import fused_sparse_conv
    for C_in, C_out in ((32, 48), (64, 32), (128, 64), (256, 16)):
        B, V_in, V_out, K = 2, 197, 300, 8
        feats = rng.randn(B, V_in, C_in).astype(np.float32)
        idx = rng.randint(-1, V_in + 1, (B, V_out, K)).astype(np.int32)
        kernel = (rng.randn(K, C_in, C_out) * 0.1).astype(np.float32)
        got = fused_sparse_conv(jnp.asarray(feats), jnp.asarray(idx),
                                jnp.asarray(kernel), 256, True)
        want = _xla_conv_ref(feats, idx, kernel)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-5)


def test_fused_conv_via_sparse_conv_apply(rng):
    """pallas_gather='fused_force' routes through the fused kernel and
    matches the default XLA path."""
    from situation3d_tpu.sparse.conv import sparse_conv_apply
    B, V_in, V_out, C_in, C_out, K = 2, 160, 90, 32, 24, 27
    feats = jnp.asarray(rng.randn(B, V_in, C_in).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V_in + 1, (B, V_out, K)).astype(np.int32))
    kernel = jnp.asarray((rng.randn(K, C_in, C_out) * 0.1).astype(np.float32))
    want = sparse_conv_apply(feats, idx, kernel)
    got = sparse_conv_apply(feats, idx, kernel, pallas_gather="fused_force")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_grad_matches_xla(rng):
    """custom_vjp backward (per-offset deterministic scatter-add) == XLA
    autodiff of the unfused formulation, for d/dfeats AND d/dkernel."""
    from situation3d_tpu.ops.pallas.fused_conv import fused_sparse_conv
    from situation3d_tpu.sparse.conv import sparse_conv_apply
    B, V_in, V_out, C_in, C_out, K = 2, 96, 64, 64, 16, 8
    feats = jnp.asarray(rng.randn(B, V_in, C_in).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V_in + 1, (B, V_out, K)).astype(np.int32))
    kernel = jnp.asarray((rng.randn(K, C_in, C_out) * 0.1).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, V_out, C_out).astype(np.float32))

    def loss_f(f, w):
        return jnp.sum(fused_sparse_conv(f, idx, w, 256, True) * ct)

    def loss_x(f, w):
        return jnp.sum(sparse_conv_apply(f, idx, w).astype(jnp.float32) * ct)

    gf = jax.grad(loss_f, argnums=(0, 1))(feats, kernel)
    gx = jax.grad(loss_x, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-4)


def test_k3_map_lookup_matches_dense(rng):
    """Pallas VMEM-grid k3 map build == lookup_kernel_map_dense bit-exact
    for every z-packing factor (128/Z = 1/2/4/8), strides, boundary
    voxels, and masked rows."""
    from situation3d_tpu.ops.pallas.map_lookup import k3_map_lookup_pallas
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   kernel_offsets,
                                                   lookup_kernel_map_dense)
    k3 = jnp.asarray(kernel_offsets(3))
    for extent, stride in (((64, 64, 128), 1), ((64, 64, 64), 2),
                           ((32, 48, 32), 1), ((16, 16, 16), 1)):
        cells = tuple(e // stride for e in extent)
        V = 300
        c = np.unique(
            np.stack([np.random.RandomState(7).randint(0, cells[i], 400)
                      for i in range(3)], 1), axis=0)[:260]
        # force boundary coverage: corners of the cell extent
        c[0] = (0, 0, 0)
        c[1] = (cells[0] - 1, cells[1] - 1, cells[2] - 1)
        c = np.unique(c, axis=0)
        coords = np.zeros((V, 3), np.int32)
        mask = np.zeros((V,), bool)
        coords[: len(c)], mask[: len(c)] = c * stride, True
        cj, mj = jnp.asarray(coords), jnp.asarray(mask)
        grid, _ = build_level_grid(cj, mj, stride, extent)
        want = lookup_kernel_map_dense(grid, V, cj, mj, k3, stride, stride,
                                       extent)
        got = k3_map_lookup_pallas(grid[None], (cj // stride)[None],
                                   mj[None], cells, V, interpret=True)[0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"{extent} s{stride}")


def test_fused_conv_fits_budget():
    """The packing brings every UNet level table under budget — including
    the level-1 C=32 one the plain pallas gather can't hold — while the
    12.6 MB unpackable shapes still refuse."""
    from situation3d_tpu.ops.pallas.fused_conv import fused_conv_fits
    assert fused_conv_fits(24576, 32, 32)     # level 1 k3 (plain gather: no)
    assert fused_conv_fits(49152, 32, 32)     # level-0 table, k2 down conv
    assert fused_conv_fits(12288, 64, 64)     # level 2
    assert fused_conv_fits(6144, 128, 128)    # level 3
    assert fused_conv_fits(3072, 256, 256)    # level 4 (2 lane tiles/row)
    assert not fused_conv_fits(49152, 64, 64)   # 12.6 MB table
    assert not fused_conv_fits(24576, 96, 32)   # 96 does not divide 128


def test_k3_map_bits_matches_dense(rng):
    """Bit-packed occupancy k3 map == lookup_kernel_map_dense bit-exact
    for sorted-unique levels (the dense-downsample order guarantee),
    across word packings (Z/32 = 1/4), strides, corners, masked rows."""
    from situation3d_tpu.ops.pallas.map_bits import (build_level_bits,
                                                     k3_map_lookup_bits,
                                                     map_bits_fits)
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   kernel_offsets,
                                                   lookup_kernel_map_dense)
    k3 = jnp.asarray(kernel_offsets(3))
    for extent, stride in (((64, 64, 128), 1), ((64, 64, 64), 2),
                           ((32, 48, 32), 1)):
        cells = tuple(e // stride for e in extent)
        assert map_bits_fits(cells[0] * cells[1] * cells[2], cells[2])
        V = 300
        # np.unique lex (x, y, z) order == ascending flat order
        c = np.unique(
            np.stack([np.random.RandomState(7).randint(0, cells[i], 400)
                      for i in range(3)], 1), axis=0)[:260]
        c[0] = (0, 0, 0)
        c[-1] = (cells[0] - 1, cells[1] - 1, cells[2] - 1)
        c = np.unique(c, axis=0)
        coords = np.zeros((V, 3), np.int32)
        mask = np.zeros((V,), bool)
        coords[: len(c)], mask[: len(c)] = c * stride, True
        cj, mj = jnp.asarray(coords), jnp.asarray(mask)
        grid, _ = build_level_grid(cj, mj, stride, extent)
        want = lookup_kernel_map_dense(grid, V, cj, mj, k3, stride, stride,
                                       extent)
        bits, pfx = build_level_bits(cj, mj, stride, extent)
        got = k3_map_lookup_bits(bits[None], pfx[None], (cj // stride)[None],
                                 mj[None], cells, V, interpret=True)[0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"{extent} s{stride}")


def test_k3_map_bits_on_downsampled_level(rng):
    """End-to-end validity claim: a level PRODUCED by the dense downsample
    (incl. capacity overflow, where the last slot holds the largest key)
    satisfies rank == row id, so the bits map equals the grid map."""
    from situation3d_tpu.ops.pallas.map_bits import (build_level_bits,
                                                     k3_map_lookup_bits)
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   downsample_coords_dense,
                                                   kernel_offsets,
                                                   lookup_kernel_map_dense)
    k3 = jnp.asarray(kernel_offsets(3))
    extent = (64, 64, 64)
    fine = np.random.RandomState(3).randint(0, 64, (600, 3)).astype(np.int32)
    fmask = np.ones((600,), bool)
    fmask[550:] = False
    for capacity in (256, 96):                    # 96 forces overflow
        c, m, dropped = downsample_coords_dense(
            jnp.asarray(fine), jnp.asarray(fmask), 1, 2, capacity, extent)
        if capacity == 96:
            assert int(dropped) > 0
        cells = tuple(e // 2 for e in extent)
        grid, _ = build_level_grid(c, m, 2, extent)
        want = lookup_kernel_map_dense(grid, capacity, c, m, k3, 2, 2,
                                       extent)
        bits, pfx = build_level_bits(c, m, 2, extent)
        got = k3_map_lookup_bits(bits[None], pfx[None], (c // 2)[None],
                                 m[None], cells, capacity,
                                 interpret=True)[0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"cap={capacity}")


def test_map_bits_fits_level1():
    """The whole point: level 1 (8.4 M cells, 33.5 MB int32 grid) fits as
    bits+prefix (2.1 MB); the int32 VMEM-grid kernel never can."""
    from situation3d_tpu.ops.pallas.map_bits import map_bits_fits
    from situation3d_tpu.ops.pallas.map_lookup import map_lookup_fits
    cells = (256, 256, 128)                       # (512,512,256) / stride 2
    n = cells[0] * cells[1] * cells[2]
    assert map_bits_fits(n, cells[2])
    assert not map_lookup_fits(n, cells[2])
    assert not map_bits_fits(n, 48)               # Z % 32 != 0
    assert not map_bits_fits(512 * 512 * 256, 256)  # level 0: 8.4 MB > budget


def test_k3_map_bits_degenerate_inputs():
    """Degenerate inputs: (a) all-invalid mask -> all-miss output; (b) a
    single voxel at the origin and (c) isolated voxels whose 26 k3
    neighbors are all EMPTY cells — (c) is the case where misses must be
    computed from zero occupancy bits at real lookups (in (a) the output
    mask alone forces the sentinel)."""
    from situation3d_tpu.ops.pallas.map_bits import (build_level_bits,
                                                     k3_map_lookup_bits)
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   kernel_offsets,
                                                   lookup_kernel_map_dense)
    k3 = jnp.asarray(kernel_offsets(3))
    extent, cells, V = (64, 64, 64), (32, 32, 32), 64
    c0 = jnp.zeros((V, 3), jnp.int32)
    m0 = jnp.zeros((V,), bool)
    bits, pfx = build_level_bits(c0, m0, 2, extent)
    got = k3_map_lookup_bits(bits[None], pfx[None], (c0 // 2)[None],
                             m0[None], cells, V, interpret=True)[0]
    assert (np.asarray(got) == V).all()

    m1 = m0.at[0].set(True)
    grid, _ = build_level_grid(c0, m1, 2, extent)
    want = lookup_kernel_map_dense(grid, V, c0, m1, k3, 2, 2, extent)
    bits, pfx = build_level_bits(c0, m1, 2, extent)
    got = k3_map_lookup_bits(bits[None], pfx[None], (c0 // 2)[None],
                             m1[None], cells, V, interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # isolated occupied cells: every non-center neighbor is an EMPTY cell,
    # so the 26 misses per voxel come from zero bits at real lookups
    c2 = c0.at[0].set(jnp.asarray([10, 10, 10]))     # raw units, stride 2
    c2 = c2.at[1].set(jnp.asarray([40, 42, 20]))
    m2 = m0.at[0].set(True).at[1].set(True)
    grid, _ = build_level_grid(c2, m2, 2, extent)
    want = lookup_kernel_map_dense(grid, V, c2, m2, k3, 2, 2, extent)
    bits, pfx = build_level_bits(c2, m2, 2, extent)
    got = k3_map_lookup_bits(bits[None], pfx[None], (c2 // 2)[None],
                             m2[None], cells, V, interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # each isolated voxel: exactly one hit (itself), 26 misses
    assert (np.asarray(got)[:2] == V).sum() == 52
