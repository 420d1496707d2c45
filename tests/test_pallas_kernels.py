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
