"""Tests for voxelization (reference: lib/openscene/voxelization_utils.py
sparse_quantize + voxelizer_dev.py Voxelizer.voxelize)."""
import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.ops.voxelize import (
    pack_coords,
    sparse_quantize_np,
    unpack_coords,
    voxelize_jax,
    voxelize_np,
)


def test_sparse_quantize_np_first_occurrence(rng):
    coords = rng.randint(0, 8, (200, 3))
    first, inv = sparse_quantize_np(coords)
    uniq = coords[first]
    # every point maps to a unique row with identical coords
    np.testing.assert_array_equal(uniq[inv], coords)
    # first-occurrence property
    for u, fi in enumerate(first):
        earlier = np.flatnonzero((coords[:fi] == coords[fi]).all(-1))
        assert earlier.size == 0
    # unique rows are distinct
    assert len({tuple(c) for c in uniq}) == len(uniq)


def test_voxelize_np(rng):
    pts = rng.rand(500, 3).astype(np.float32) * 2.0
    vc, first, inv = voxelize_np(pts, 0.1)
    assert vc.min() >= 0
    assert (vc == np.floor(pts / 0.1).astype(np.int64)[first]
            - np.floor(pts / 0.1).astype(np.int64).min(0)).all()
    assert inv.max() == len(vc) - 1


def test_pack_unpack_roundtrip(rng):
    c = jnp.asarray(rng.randint(0, 1024, (64, 3)).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(unpack_coords(pack_coords(c))), np.asarray(c))


def test_voxelize_jax_matches_np(rng):
    pts = rng.rand(300, 3) * 2.0
    coords = np.floor(pts / 0.1).astype(np.int64)
    coords -= coords.min(0)
    valid = np.ones(300, bool)
    valid[250:] = False

    first_np, inv_np = sparse_quantize_np(coords[:250])
    uc, um, inv, nu = voxelize_jax(
        jnp.asarray(coords.astype(np.int32)), jnp.asarray(valid), capacity=256
    )
    uc, um, inv, nu = map(np.asarray, (uc, um, inv, nu))
    assert nu == len(first_np)
    assert um.sum() == nu
    # same unique coordinate set
    got = {tuple(c) for c in uc[um]}
    want = {tuple(c) for c in coords[:250][first_np]}
    assert got == want
    # inverse maps each valid point to a row with its own coords
    np.testing.assert_array_equal(uc[inv[:250]], coords[:250])


def test_voxelize_jax_vmap(rng):
    coords = jnp.asarray(rng.randint(0, 50, (4, 100, 3)).astype(np.int32))
    valid = jnp.ones((4, 100), bool)
    uc, um, inv, nu = jax.vmap(lambda c, v: voxelize_jax(c, v, capacity=128))(coords, valid)
    assert uc.shape == (4, 128, 3)
    assert (np.asarray(nu) <= 100).all()
