"""Native C++ host runtime tests: build the .so with g++, check exact
agreement with the NumPy/JAX implementations (reference: host work of
lib/openscene/voxelization_utils.py + MinkowskiEngine CoordinateManager +
lib/pointnet2 CUDA kernels)."""
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.ops import native
from situation3d_tpu.ops.pointnet2 import ball_query as ball_query_jax
from situation3d_tpu.ops.pointnet2 import furthest_point_sample
from situation3d_tpu.ops.voxelize import sparse_quantize_np
from situation3d_tpu.sparse.kernel_map import (build_kernel_map,
                                               kernel_offsets)


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.ensure_built(), "g++ build of native/voxelhash.cpp failed"
    assert native.available()


def test_native_sparse_quantize_matches_numpy(rng):
    coords = rng.randint(0, 12, (500, 3)).astype(np.int32)
    f_n, i_n = native.sparse_quantize(coords)
    f_np, i_np = sparse_quantize_np(coords)
    # same unique count and first-occurrence sets; inverse maps consistent
    assert len(f_n) == len(f_np)
    assert set(f_n.tolist()) == set(f_np.tolist())
    np.testing.assert_array_equal(coords[f_n][i_n], coords)


def test_native_kernel_map_matches_jax(rng):
    coords = np.unique(rng.randint(0, 10, (80, 3)), axis=0).astype(np.int32)
    n = len(coords)
    offs = kernel_offsets(3)
    got = native.kernel_map(coords, 1, coords, offs, 1)
    mask = np.ones(n, bool)
    want = np.asarray(build_kernel_map(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(coords),
        jnp.asarray(mask), jnp.asarray(offs), 1, 1))
    np.testing.assert_array_equal(got, want)


def test_native_kernel_map_transpose_parity(rng):
    """Transpose-conv queries with odd offsets must miss on parity."""
    coarse = (np.unique(rng.randint(0, 5, (20, 3)), axis=0) * 2).astype(np.int32)
    fine = np.unique(rng.randint(0, 10, (40, 3)), axis=0).astype(np.int32)
    k2 = kernel_offsets(2)
    got = native.kernel_map(coarse, 2, fine, -k2, 1)
    table = {tuple(c // 2): i for i, c in enumerate(coarse)}
    for j, f in enumerate(fine):
        for o in range(8):
            q = f - k2[o]
            want = len(coarse)
            if (q % 2 == 0).all() and (q >= 0).all():
                want = table.get(tuple(q // 2), len(coarse))
            assert got[j, o] == want


def test_native_downsample(rng):
    coords = np.unique(rng.randint(0, 16, (60, 3)), axis=0).astype(np.int32)
    out = native.downsample(coords, 4)
    want = {tuple((c // 4) * 4) for c in coords}
    assert {tuple(c) for c in out} == want
    assert (out % 4 == 0).all()


def test_native_fps_matches_jax(rng):
    xyz = rng.randn(300, 3).astype(np.float32)
    got = native.fps(xyz, 32)
    want = np.asarray(furthest_point_sample(jnp.asarray(xyz)[None], 32))[0]
    np.testing.assert_array_equal(got, want)


def test_native_ball_query_matches_jax(rng):
    xyz = rng.rand(200, 3).astype(np.float32)
    centers = xyz[:20]
    got = native.ball_query(xyz, centers, 0.25, 8)
    want = np.asarray(ball_query_jax(0.25, 8, jnp.asarray(xyz)[None],
                                     jnp.asarray(centers)[None]))[0]
    np.testing.assert_array_equal(got, want)


def test_host_plan_matches_device_plan(rng):
    """The host C++ plan must equal the jitted device plan exactly."""
    import jax
    from situation3d_tpu.sparse.host_plan import build_host_plan
    from situation3d_tpu.sparse.minkunet import build_unet_plan

    # capacities generous enough that no level overflows: on overflow the
    # host (first-occurrence prefix) and device (key-sorted prefix) planners
    # keep different voxel subsets by design
    caps = (256, 256, 256, 128, 64)
    B = 2
    coords = np.zeros((B, caps[0], 3), np.int32)
    mask = np.zeros((B, caps[0]), bool)
    for b in range(B):
        c = np.unique(rng.randint(0, 24, (260, 3)), axis=0)[:200]
        coords[b, :len(c)], mask[b, :len(c)] = c, True
    host = build_host_plan(coords, mask, caps)
    dev = jax.jit(lambda c, m: build_unet_plan(c, m, caps))(
        jnp.asarray(coords), jnp.asarray(mask))
    for i in range(5):
        hl, dl = host["levels"][i], dev["levels"][i]
        np.testing.assert_array_equal(hl["mask"], np.asarray(dl["mask"]))
        # same coordinate SETS per level (order may differ: first-occurrence
        # vs key-sorted); maps must agree after aligning the permutation
        for b in range(B):
            hset = {tuple(c) for c in hl["coords"][b][hl["mask"][b]]}
            dset = {tuple(c) for c in np.asarray(dl["coords"][b])[np.asarray(dl["mask"][b])]}
            assert hset == dset, (i, b)


def test_host_plan_runs_in_model(rng):
    """Feeding a host-built plan through the SIG3D batch works."""
    import jax
    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.models.sig3d import SIG3D
    from situation3d_tpu.sparse.host_plan import build_host_plan

    cfg = apply_overrides(Config(), [
        "lang.num_layers=1", "lang.hidden_size=32", "lang.num_heads=2",
        "lang.intermediate_size=64", "model.hidden_size=32",
        "model.mcan_num_heads=2", "model.mcan_num_layers=1",
        "model.mcan_flat_mlp_size=16", "model.mcan_flat_out_size=24",
        "model.num_scene_tokens=8", "model.scene_feat_dim=24",
        "sparse.planes=4,8,12,24,12,12,8,8", "sparse.layers=1,1,1,1,1,1,1,1",
        "sparse.init_dim=4", "sparse.capacities=256,128,64,32,16",
        "data.num_answers=8", "data.max_text_len=12",
    ])
    B = 2
    coords = np.zeros((B, 256, 3), np.int32)
    mask = np.zeros((B, 256), bool)
    feats = np.zeros((B, 256, 3), np.float32)
    for b in range(B):
        c = np.unique(rng.randint(0, 24, (220, 3)), axis=0)[:180]
        coords[b, :len(c)], mask[b, :len(c)] = c, True
        feats[b, :len(c)] = rng.rand(len(c), 3)
    plan = build_host_plan(coords, mask, cfg.sparse.capacities)
    batch = {
        "s_ids": jnp.asarray(rng.randint(4, 100, (B, 12))),
        "s_mask": jnp.ones((B, 12), jnp.int32),
        "q_ids": jnp.asarray(rng.randint(4, 100, (B, 12))),
        "q_mask": jnp.ones((B, 12), jnp.int32),
        "voxel_coords": jnp.asarray(coords), "voxel_feats": jnp.asarray(feats),
        "voxel_mask": jnp.asarray(mask),
        "auxiliary_task": jnp.asarray(
            np.concatenate([rng.rand(B, 3) * 0.3 + 0.1,
                            np.tile([0, 0, 0, 1.0], (B, 1))], 1), jnp.float32),
        "plan": jax.tree_util.tree_map(jnp.asarray, plan),
    }
    model = SIG3D(cfg, num_answers=8)
    vs = model.init({"params": jax.random.PRNGKey(0),
                     "sample": jax.random.PRNGKey(1)}, batch, train=False)
    out = model.apply(vs, batch, train=False,
                      rngs={"sample": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["answer_scores"])).all()
