"""NumPy-oracle tests for the PointNet++ ops (reference: CUDA kernels in
lib/pointnet2/_ext_src; oracle logic re-derived from their documented
semantics, see SURVEY.md §2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
from situation3d_tpu.ops.pointnet2 import interpolation_weights


def fps_oracle(xyz, npoint):
    """Sequential farthest point sampling, skipping |p|^2 <= 1e-3."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        temp = np.full(N, 1e10)
        mag = (xyz[b] ** 2).sum(-1)
        old = 0
        for j in range(1, npoint):
            d = ((xyz[b] - xyz[b, old]) ** 2).sum(-1)
            temp = np.minimum(temp, d)
            cand = np.where(mag > 1e-3, temp, -1.0)
            old = int(np.argmax(cand))
            out[b, j] = old
    return out


def ball_query_oracle(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = ((new_xyz[b, j] - xyz[b, k]) ** 2).sum()
                if d2 < radius * radius:
                    if cnt == 0:
                        idx[b, j, :] = k
                    idx[b, j, cnt] = k
                    cnt += 1
                    if cnt == nsample:
                        break
    return idx


def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    xyz[0, 10:20] = 0.0  # origin padding should never be selected
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    want = fps_oracle(xyz, 16)
    np.testing.assert_array_equal(got, want)
    assert not np.isin(np.arange(10, 20), got[0]).any()


def test_fps_valid_mask(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32) + 5.0
    valid = np.ones((1, 32), bool)
    valid[0, 16:] = False
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8, jnp.asarray(valid)))
    assert (got < 16).all()


def test_ball_query_matches_oracle(rng):
    xyz = rng.rand(2, 128, 3).astype(np.float32)
    centers = xyz[:, :16]
    got = np.asarray(ball_query(0.2, 8, jnp.asarray(xyz), jnp.asarray(centers)))
    want = ball_query_oracle(0.2, 8, xyz, centers)
    np.testing.assert_array_equal(got, want)


def test_ball_query_no_hit_returns_zero(rng):
    xyz = np.ones((1, 16, 3), np.float32)
    centers = np.full((1, 2, 3), 100.0, np.float32)
    got = np.asarray(ball_query(0.1, 4, jnp.asarray(xyz), jnp.asarray(centers)))
    np.testing.assert_array_equal(got, 0)


def test_gather_and_group(rng):
    pts = rng.randn(2, 32, 5).astype(np.float32)
    idx = rng.randint(0, 32, (2, 7)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)

    gidx = rng.randint(0, 32, (2, 7, 4)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    want = np.stack([pts[b][gidx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_three_nn_matches_oracle(rng):
    unknown = rng.randn(2, 24, 3).astype(np.float32)
    known = rng.randn(2, 12, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for b in range(2):
        d2 = ((unknown[b][:, None] - known[b][None]) ** 2).sum(-1)
        order = np.argsort(d2, axis=-1)[:, :3]
        np.testing.assert_allclose(
            np.sort(dist[b], -1), np.sort(np.sqrt(np.take_along_axis(d2, order, -1)), -1),
            rtol=1e-4, atol=1e-5,
        )
        # same set of neighbors (ties may reorder)
        for n in range(24):
            assert set(idx[b, n]) == set(order[n])


def test_three_interpolate_value_and_grad(rng):
    """The gradcheck analogue of lib/pointnet2/pointnet2_test.py:18-33."""
    with jax.enable_x64(True):
        _three_interpolate_value_and_grad(rng)


def _three_interpolate_value_and_grad(rng):
    feats = rng.randn(1, 8, 6).astype(np.float64)
    unknown = rng.randn(1, 20, 3)
    known = rng.randn(1, 8, 3)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    w = interpolation_weights(dist)

    def f(x):
        return jnp.sum(jnp.sin(three_interpolate(x, idx, w)))

    g = jax.grad(f)(jnp.asarray(feats))
    # finite differences
    eps = 1e-6
    for probe in [(0, 2, 1), (0, 7, 5)]:
        fp = feats.copy(); fp[probe] += eps
        fm = feats.copy(); fm[probe] -= eps
        num = (f(jnp.asarray(fp)) - f(jnp.asarray(fm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[probe], float(num), rtol=1e-4, atol=1e-6)

    # value oracle
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, w))
    idx_n, w_n = np.asarray(idx), np.asarray(w)
    want = np.einsum("nk,nkc->nc", w_n[0], feats[0][idx_n[0]])
    np.testing.assert_allclose(out[0], want, rtol=1e-5)


def test_fps_jit_under_vmap(rng):
    xyz = jnp.asarray(rng.randn(4, 2, 48, 3).astype(np.float32))
    out = jax.vmap(lambda x: furthest_point_sample(x, 8))(xyz)
    assert out.shape == (4, 2, 8)
