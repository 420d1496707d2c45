"""Sparse engine tests: kernel maps vs dict oracles, sparse conv vs dense
conv equivalence, MinkUNet shapes/finiteness (reference semantics:
MinkowskiEngine 0.5.4 generalized sparse conv as used by mink_unet.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.config import SparseConfig
from situation3d_tpu.sparse.conv import sparse_conv_apply
from situation3d_tpu.sparse.kernel_map import (
    build_kernel_map,
    downsample_coords,
    gather_neighbors,
    kernel_offsets,
)
from situation3d_tpu.sparse.minkunet import MinkUNet, build_unet_plan
from situation3d_tpu.sparse.tensor import SparseVoxels


def make_sparse(rng, n_occ, span=20, cap=None, seed_offset=0):
    """Random unique voxel set."""
    cap = cap or n_occ
    seen, coords = set(), []
    while len(coords) < n_occ:
        c = tuple(rng.randint(0, span, 3))
        if c not in seen:
            seen.add(c)
            coords.append(c)
    coords = np.array(coords, np.int32)
    mask = np.zeros(cap, bool)
    mask[:n_occ] = True
    out = np.zeros((cap, 3), np.int32)
    out[:n_occ] = coords
    return out, mask


def test_kernel_offsets_conventions():
    k3 = kernel_offsets(3)
    assert k3.shape == (27, 3)
    assert (k3.min(), k3.max()) == (-1, 1)
    k2 = kernel_offsets(2)
    assert k2.shape == (8, 3)
    assert (k2.min(), k2.max()) == (0, 1)
    assert kernel_offsets(5).shape == (125, 3)


def test_kernel_map_oracle(rng):
    coords, mask = make_sparse(rng, 50, span=10, cap=64)
    offs = kernel_offsets(3)
    nbr = np.asarray(
        build_kernel_map(
            jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(offs), 1, 1,
        )
    )
    table = {tuple(c): i for i, c in enumerate(coords[:50])}
    for j in range(64):
        for k, o in enumerate(offs):
            if not mask[j]:
                assert nbr[j, k] == 64
                continue
            q = tuple(coords[j] + o)
            want = table.get(q, 64) if all(v >= 0 for v in q) else 64
            assert nbr[j, k] == want, (j, k, q)


def test_downsample_coords_oracle(rng):
    coords, mask = make_sparse(rng, 40, span=16, cap=64)
    oc, om, dropped = downsample_coords(jnp.asarray(coords), jnp.asarray(mask), 1, 2, 64)
    assert int(dropped) == 0
    oc, om = np.asarray(oc), np.asarray(om)
    want = {tuple((c // 2) * 2) for c in coords[:40]}
    got = {tuple(c) for c in oc[om]}
    assert got == want
    assert (oc[om] % 2 == 0).all()


def test_downsample_dense_bit_identical(rng):
    """The sort-free grid-cumsum downsample must match the sort path
    EXACTLY (coords, mask, dropped, order) for in-extent scenes — both
    enumerate unique cells in (x, y, z) lexicographic order."""
    from situation3d_tpu.sparse.kernel_map import downsample_coords_dense
    for stride, cap, n in ((1, 64, 40), (2, 32, 80), (4, 16, 50)):
        coords, mask = make_sparse(rng, n, span=30, cap=max(n, cap) + 8)
        coords = (coords // stride) * stride          # multiples of stride
        cj, mj = jnp.asarray(coords), jnp.asarray(mask)
        a = downsample_coords(cj, mj, stride, 2, cap)
        b = downsample_coords_dense(cj, mj, stride, 2, cap, (64, 64, 64))
        for x, y, name in zip(a, b, ("coords", "mask", "dropped")):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{stride=} {name}")
    # out-of-extent voxels: dropped (+counted) by the dense path
    c = jnp.asarray([[2, 2, 2], [70, 0, 0]], jnp.int32)
    m = jnp.ones((2,), bool)
    oc, om, dropped = downsample_coords_dense(c, m, 1, 2, 8, (64, 64, 64))
    assert int(dropped) == 1 and int(om.sum()) == 1
    assert tuple(np.asarray(oc)[0]) == (2, 2, 2)


def test_downsample_dense_degenerate():
    """All-invalid and single-voxel inputs: no NaN/garbage, miss maps."""
    from situation3d_tpu.sparse.kernel_map import downsample_with_down_map
    c = jnp.zeros((8, 3), jnp.int32)
    m = jnp.zeros((8,), bool)
    oc, om, dropped, dmap, umap = downsample_with_down_map(
        c, m, 1, 2, 4, (16, 16, 16))
    assert int(om.sum()) == 0 and int(dropped) == 0
    assert (np.asarray(dmap) == 8).all()      # all-miss (sentinel V_in)
    assert (np.asarray(umap) == 4).all()      # all-miss (sentinel V_out)
    m1 = m.at[3].set(True)
    c1 = c.at[3].set(jnp.asarray([5, 6, 7]))
    oc, om, dropped, dmap, umap = downsample_with_down_map(
        c1, m1, 1, 2, 4, (16, 16, 16))
    assert int(om.sum()) == 1 and tuple(np.asarray(oc)[0]) == (4, 6, 6)
    o = (5 & 1) * 4 + (6 & 1) * 2 + (7 & 1)   # parity offset column
    assert np.asarray(dmap)[0, o] == 3
    assert np.asarray(umap)[3, o] == 0


def test_downsample_down_up_maps_match_lookup(rng):
    """The k2 down AND mirrored up maps scattered out of the dense
    downsample must equal the grid-lookup path entry for entry."""
    from situation3d_tpu.sparse.kernel_map import (
        build_level_grid, downsample_with_down_map, kernel_offsets,
        lookup_kernel_map_dense)
    extent = (64, 64, 64)
    k2 = jnp.asarray(kernel_offsets(2))
    for stride, cap, n in ((1, 64, 40), (2, 48, 90), (4, 16, 50)):
        coords, mask = make_sparse(rng, n, span=30, cap=max(n, cap) + 8)
        coords = (coords // stride) * stride
        cj, mj = jnp.asarray(coords), jnp.asarray(mask)
        oc, om, dropped, dmap, umap = downsample_with_down_map(
            cj, mj, stride, 2, cap, extent)
        a = downsample_coords(cj, mj, stride, 2, cap)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(oc))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(om))
        grid, _ = build_level_grid(cj, mj, stride, extent)
        want = lookup_kernel_map_dense(
            grid, cj.shape[0], oc, om, k2, stride, stride, extent)
        np.testing.assert_array_equal(np.asarray(dmap), np.asarray(want),
                                      err_msg=f"{stride=} down")
        cgrid, _ = build_level_grid(oc, om, stride * 2, extent)
        want_up = lookup_kernel_map_dense(
            cgrid, cap, cj, mj, -k2, stride * 2, stride, extent)
        np.testing.assert_array_equal(np.asarray(umap), np.asarray(want_up),
                                      err_msg=f"{stride=} up")


def dense_conv3d_oracle(grid, kernel, offsets):
    """grid [S,S,S,Cin], kernel [K,Cin,Cout] -> [S,S,S,Cout] with zero pad."""
    S = grid.shape[0]
    out = np.zeros(grid.shape[:3] + (kernel.shape[-1],), np.float32)
    for k, o in enumerate(offsets):
        for x in range(S):
            for y in range(S):
                for z in range(S):
                    q = (x + o[0], y + o[1], z + o[2])
                    if all(0 <= v < S for v in q):
                        out[x, y, z] += grid[q] @ kernel[k]
    return out


def test_sparse_conv_matches_dense(rng):
    """Sparse conv on occupied sites == dense conv with zeros at empty sites."""
    S, Cin, Cout = 6, 4, 5
    occ = rng.rand(S, S, S) < 0.3
    occ[0, 0, 0] = True
    idx = np.argwhere(occ).astype(np.int32)
    n = len(idx)
    cap = n + 7
    coords = np.zeros((cap, 3), np.int32)
    coords[:n] = idx
    mask = np.zeros(cap, bool)
    mask[:n] = True
    feats = np.zeros((cap, Cin), np.float32)
    feats[:n] = rng.randn(n, Cin)
    grid = np.zeros((S, S, S, Cin), np.float32)
    grid[tuple(idx.T)] = feats[:n]

    offs = kernel_offsets(3)
    kernel = rng.randn(27, Cin, Cout).astype(np.float32)
    nbr = build_kernel_map(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(coords),
        jnp.asarray(mask), jnp.asarray(offs), 1, 1,
    )
    got = np.asarray(
        sparse_conv_apply(jnp.asarray(feats)[None], nbr[None], jnp.asarray(kernel),
                          precision=jax.lax.Precision.HIGHEST)
    )[0]
    dense = dense_conv3d_oracle(grid, kernel, offs)
    np.testing.assert_allclose(got[:n], dense[tuple(idx.T)], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[n:], 0, atol=1e-6)


def test_strided_and_transpose_conv_maps(rng):
    """Down map then up map: every fine voxel has exactly one coarse parent."""
    coords, mask = make_sparse(rng, 60, span=12, cap=80)
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    oc, om, _ = downsample_coords(cj, mj, 1, 2, 64)
    k2 = jnp.asarray(kernel_offsets(2))
    down = np.asarray(build_kernel_map(cj, mj, oc, om, k2, 1, 1))
    up = np.asarray(build_kernel_map(oc, om, cj, mj, -k2, 2, 1))
    ocn, omn = np.asarray(oc), np.asarray(om)
    parent = {tuple(c): i for i, c in enumerate(ocn[omn])}
    n_coarse = int(omn.sum())
    for j in range(80):
        if not mask[j]:
            assert (up[j] == 64).all()
            continue
        hits = up[j][up[j] < 64]
        assert len(hits) == 1  # exactly one coarse contributor
        assert tuple(ocn[hits[0]]) == tuple((coords[j] // 2) * 2)
    # down map: coarse voxel j gathers fine voxels in its 2x2x2 cell
    fine_table = {tuple(c): i for i, c in enumerate(coords[:60])}
    for j in range(64):
        if not omn[j]:
            continue
        for k, o in enumerate(np.asarray(k2)):
            want = fine_table.get(tuple(ocn[j] + o), 80)
            assert down[j, k] == want


def test_gather_neighbors_miss_is_zero(rng):
    feats = jnp.asarray(rng.randn(1, 4, 3).astype(np.float32))
    nbr = jnp.asarray(np.array([[[0, 4], [4, 4]]], np.int32))  # 4 == miss
    g = np.asarray(gather_neighbors(feats, nbr))
    np.testing.assert_allclose(g[0, 0, 1], 0)
    np.testing.assert_allclose(g[0, 1], 0)
    np.testing.assert_allclose(g[0, 0, 0], np.asarray(feats)[0, 0])


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = SparseConfig(
        planes=(8, 16, 32, 64, 32, 32, 24, 24),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        init_dim=8,
        in_channels=3,
        out_channels=16,
        capacities=(256, 128, 64, 32, 16),
    )
    return cfg


def _unet_inputs(rng, cfg, B=2):
    caps = cfg.capacities
    coords = np.zeros((B, caps[0], 3), np.int32)
    mask = np.zeros((B, caps[0]), bool)
    feats = np.zeros((B, caps[0], 3), np.float32)
    for b in range(B):
        c, m = make_sparse(rng, 200, span=30, cap=caps[0], seed_offset=b)
        coords[b], mask[b] = c, m
        feats[b][m] = rng.randn(m.sum(), 3)
    return jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(feats)


@pytest.fixture(scope="module")
def unet_setup(tiny_unet):
    """Shared jitted forward for the UNet tests (one compile, not eager)."""
    cfg = tiny_unet
    rng = np.random.RandomState(0)
    coords, mask, feats = _unet_inputs(rng, cfg)
    model = MinkUNet(cfg, final_result=True)

    @jax.jit
    def forward(variables, coords, mask, feats):
        plan = build_unet_plan(coords, mask, cfg.capacities)
        x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
        return model.apply(variables, x, plan, train=False)

    plan = jax.jit(lambda c, m: build_unet_plan(c, m, cfg.capacities))(coords, mask)
    x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, plan, train=False))()
    return dict(cfg=cfg, model=model, forward=forward, variables=variables,
                coords=coords, mask=mask, feats=feats, plan=plan)


def test_minkunet_forward(unet_setup):
    cfg = unet_setup["cfg"]
    out = unet_setup["forward"](
        unet_setup["variables"], unet_setup["coords"], unet_setup["mask"],
        unet_setup["feats"],
    )
    bott = out["feat_bottleneck"]
    assert bott.stride == 16
    assert bott.feats.shape == (2, cfg.capacities[4], 64)
    assert np.isfinite(np.asarray(bott.feats)).all()
    fin = out["openscene_out"]
    assert fin.feats.shape == (2, cfg.capacities[0], 16)
    # masked rows must be zero
    assert np.allclose(np.asarray(bott.feats)[~np.asarray(bott.mask)], 0)


def test_minkunet_batch_invariance(unet_setup):
    """Same sample alone vs inside a batch must give identical outputs
    (checks no cross-sample leakage through the batched plan)."""
    coords, mask, feats = (unet_setup[k] for k in ("coords", "mask", "feats"))
    out2 = unet_setup["forward"](unet_setup["variables"], coords, mask, feats)
    out1 = unet_setup["forward"](
        unet_setup["variables"], coords[:1], mask[:1], feats[:1]
    )
    np.testing.assert_allclose(
        np.asarray(out1["feat_bottleneck"].feats[0]),
        np.asarray(out2["feat_bottleneck"].feats[0]),
        rtol=2e-5, atol=2e-5,
    )


def test_minkunet_train_mode_updates_stats(unet_setup):
    cfg = unet_setup["cfg"]
    model = unet_setup["model"]
    coords, mask, feats = (unet_setup[k][:1] for k in ("coords", "mask", "feats"))
    variables = unet_setup["variables"]

    @jax.jit
    def train_step(variables, coords, mask, feats):
        plan = build_unet_plan(coords, mask, cfg.capacities)
        x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
        return model.apply(variables, x, plan, train=True, mutable=["batch_stats"])

    _, updates = train_step(variables, coords, mask, feats)
    before = variables["batch_stats"]["bn0"]["mean"]
    after = updates["batch_stats"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_dense_lookup_matches_sort_path(rng):
    """Dense-grid plan must produce identical maps to the sort-based plan."""
    caps = (256, 256, 128, 64, 32)
    B = 2
    coords = np.zeros((B, caps[0], 3), np.int32)
    mask = np.zeros((B, caps[0]), bool)
    for b in range(B):
        c = np.unique(rng.randint(0, 28, (260, 3)), axis=0)[:200]
        coords[b, :len(c)], mask[b, :len(c)] = c, True
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    dense = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=(64, 64, 64)))(cj, mj)
    sort = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=False))(cj, mj)
    for i in range(5):
        for key in dense["levels"][i]:
            np.testing.assert_array_equal(
                np.asarray(dense["levels"][i][key]),
                np.asarray(sort["levels"][i][key]), err_msg=f"level{i}/{key}")


def test_unet_plan_pallas_map_bitequal(rng):
    """build_unet_plan with pallas_map='force' produces bit-identical k3
    maps at every level (all level grids fit at the test extent, so every
    level routes through the Pallas kernel)."""
    caps = (256, 256, 128, 64, 32)
    B = 2
    coords = np.zeros((B, caps[0], 3), np.int32)
    mask = np.zeros((B, caps[0]), bool)
    for b in range(B):
        c = np.unique(rng.randint(0, 28, (260, 3)), axis=0)[:200]
        coords[b, :len(c)], mask[b, :len(c)] = c, True
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    base = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=(64, 64, 64), need_k5=False,
        dense_downsample=True))(cj, mj)
    pal = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=(64, 64, 64), need_k5=False,
        dense_downsample=True, pallas_map="force"))(cj, mj)
    for i in range(5):
        np.testing.assert_array_equal(
            np.asarray(pal["levels"][i]["map_k3"]),
            np.asarray(base["levels"][i]["map_k3"]), err_msg=f"level{i}")


def test_dense_conv_matches_gather_conv(rng):
    """sparse_conv_dense_grid == sparse_conv_apply on the same map."""
    from situation3d_tpu.sparse.conv import (sparse_conv_apply,
                                             sparse_conv_dense_grid)
    V, Cin, Cout, stride = 96, 8, 16, 4
    extent = (64, 64, 64)
    coords, mask = make_sparse(rng, 60, span=16, cap=V)
    coords = coords * stride
    feats = np.zeros((V, Cin), np.float32)
    feats[:60] = rng.randn(60, Cin)
    kern = rng.randn(27, Cin, Cout).astype(np.float32)
    k3 = jnp.asarray(kernel_offsets(3))
    nbr = build_kernel_map(jnp.asarray(coords), jnp.asarray(mask),
                           jnp.asarray(coords), jnp.asarray(mask), k3,
                           stride, stride)
    want = np.asarray(sparse_conv_apply(
        jnp.asarray(feats)[None], nbr[None], jnp.asarray(kern),
        precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(sparse_conv_dense_grid(
        jnp.asarray(feats)[None], jnp.asarray(coords)[None],
        jnp.asarray(mask)[None], stride, jnp.asarray(kern), extent))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_minkunet_dense_conv_path(rng, tiny_unet):
    """UNet with dense_conv_min_stride on matches the gather-only UNet."""
    import dataclasses
    cfg = dataclasses.replace(tiny_unet, dense_conv_min_stride=4,
                              grid_extent=(64, 64, 64))
    cfg_off = dataclasses.replace(tiny_unet, dense_conv_min_stride=0,
                                  grid_extent=(64, 64, 64))
    coords, mask, feats = _unet_inputs(rng, cfg)
    plan = jax.jit(lambda c, m: build_unet_plan(
        c, m, cfg.capacities, True, cfg.grid_extent))(coords, mask)
    x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
    m_on = MinkUNet(cfg, final_result=False)
    m_off = MinkUNet(cfg_off, final_result=False)
    vs = jax.jit(lambda p: m_on.init(jax.random.PRNGKey(0), x, p,
                                     train=False))(plan)
    out_on = jax.jit(lambda v, p: m_on.apply(v, x, p, train=False)
                     ["feat_bottleneck"].feats)(vs, plan)
    out_off = jax.jit(lambda v, p: m_off.apply(v, x, p, train=False)
                      ["feat_bottleneck"].feats)(vs, plan)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=5e-3, atol=5e-3)


def test_downsample_overflow_reported(rng):
    """>capacity unique coarse voxels: graceful, *reported* degradation
    (VERDICT weak #4 — no silent merging)."""
    # 64 distinct coords that stay distinct after //2: spacing 2
    coords = np.zeros((64, 3), np.int32)
    coords[:, 0] = np.arange(64) * 2
    mask = np.ones(64, bool)
    oc, om, dropped = downsample_coords(
        jnp.asarray(coords), jnp.asarray(mask), 1, 2, 16)
    assert int(dropped) == 64 - 16
    assert int(np.asarray(om).sum()) == 16  # capacity full, not corrupted
    assert np.asarray(oc).shape == (16, 3)


def test_extent_miss_reported(rng):
    from situation3d_tpu.sparse.kernel_map import build_level_grid
    coords = np.array([[1, 1, 1], [70, 1, 1], [1, 80, 1], [2, 2, 2]], np.int32)
    mask = np.ones(4, bool)
    grid, misses = build_level_grid(
        jnp.asarray(coords), jnp.asarray(mask), 1, (64, 64, 64))
    assert int(misses) == 2
    g = np.asarray(grid)
    assert g[(1 * 64 + 1) * 64 + 1] == 0
    assert g[(2 * 64 + 2) * 64 + 2] == 3


def test_plan_reports_overflow(rng):
    from situation3d_tpu.sparse.minkunet import build_unet_plan
    coords, mask = make_sparse(rng, 50, span=16, cap=64)
    plan = build_unet_plan(jnp.asarray(coords)[None], jnp.asarray(mask)[None],
                           (64, 32, 16, 8, 8), True, (32, 32, 32))
    assert set(plan["overflow"]) == {"voxels_dropped", "extent_misses"}
    assert int(plan["overflow"]["extent_misses"][0]) == 0
    # tiny capacities at coarse levels may or may not drop; counters >= 0
    assert int(plan["overflow"]["voxels_dropped"][0]) >= 0


def test_block_lookup_matches_elementwise(rng):
    """Padded-grid block/elementwise lookups == the unpadded dense path
    (kept opt-in: on v5e the elementwise gather measured fastest)."""
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.sparse.kernel_map import (
        build_level_grid, build_level_grid_padded, kernel_offsets,
        lookup_kernel_map_block, lookup_kernel_map_dense,
        lookup_kernel_map_dense_padded)

    extent = (64, 64, 32)
    coords = np.unique(
        (rng.rand(600, 3) * np.array([60, 60, 28])).astype(np.int32), axis=0)
    V = 512
    pad_c = np.zeros((V, 3), np.int32)
    pad_c[: len(coords)] = coords[:V]
    mask = np.zeros(V, bool)
    mask[: min(len(coords), V)] = True
    c, m = jnp.asarray(pad_c), jnp.asarray(mask)

    grid, miss0 = build_level_grid(c, m, 1, extent)
    gridp, miss1 = build_level_grid_padded(c, m, 1, extent)
    assert int(miss0) == int(miss1) == 0
    for k in (3, 5):
        offs = jnp.asarray(kernel_offsets(k))
        want = lookup_kernel_map_dense(grid, V, c, m, offs, 1, 1, extent)
        got_block = lookup_kernel_map_block(gridp, V, c, m, k,
                                            -(k // 2), 1, extent)
        got_elem = lookup_kernel_map_dense_padded(gridp, V, c, m, offs,
                                                  1, 1, extent)
        np.testing.assert_array_equal(np.asarray(got_block), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(got_elem), np.asarray(want))


def test_conv0_zwin_matches_gather_path(rng):
    """sparse_conv0_zwin (map-free z-window dense-grid k5 conv) must equal
    the kernel-map gather path, including extent misses and boundary
    windows."""
    from situation3d_tpu.sparse.conv import sparse_conv0_zwin
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   lookup_kernel_map_dense)

    extent = (32, 24, 16)
    B, cap, n_occ = 4, 96, 80    # B > batch_chunk exercises the lax.map path
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        c, m = make_sparse(rng, n_occ, span=16, cap=cap, seed_offset=b)
        # push some voxels to the extent boundary and a few OUT of extent
        c[:10, 0] += 16              # x in [16, 32)
        c[5:8, 2] += 8               # z up to 23 (> extent z=16: misses)
        coords[b], mask[b] = c, m
    feats = rng.randn(B, cap, 3).astype(np.float32)
    feats[~mask] = 0
    kernel = rng.randn(125, 3, 8).astype(np.float32) * 0.1

    offs = jnp.asarray(kernel_offsets(5))
    grid, _ = jax.vmap(lambda c, m: build_level_grid(c, m, 1, extent))(
        jnp.asarray(coords), jnp.asarray(mask))
    nbr = jax.vmap(lambda g, oc, om: lookup_kernel_map_dense(
        g, cap, oc, om, offs, 1, 1, extent))(
        grid, jnp.asarray(coords), jnp.asarray(mask))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(sparse_conv_apply(
            jnp.asarray(feats), nbr, jnp.asarray(kernel)))
        got, misses = sparse_conv0_zwin(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(kernel), extent)
    # in-extent voxels: exact agreement. Out-of-extent voxels are the
    # documented semantic difference: the map path gives them partial
    # neighborhoods, zwin zeroes them (both report extent_misses).
    in_ext = mask & (coords[..., 2] < extent[2])
    np.testing.assert_allclose(np.asarray(got)[in_ext], want[in_ext],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got)[~in_ext], 0.0)
    expected_misses = int((mask & (coords[..., 2] >= extent[2])).sum())
    assert int(np.asarray(misses).sum()) == expected_misses > 0


def test_conv0_zwin_bf16_variants_bit_exact(rng):
    """The probe-#4 bf16 variants (flat t[i] window gather; unique_indices
    grid scatter — scripts/mb_conv0_probe4.py, DESIGN.md §15) are pure
    access-path changes: identical gathered rows, identical contraction.
    Bit-exact vs the production path, including boundary windows, padding
    rows, and extent misses."""
    from situation3d_tpu.sparse.conv import sparse_conv0_zwin

    extent = (32, 24, 16)
    B, cap, n_occ = 4, 96, 80
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        c, m = make_sparse(rng, n_occ, span=16, cap=cap, seed_offset=b)
        c[:10, 0] += 16
        c[5:8, 2] += 8               # out of extent
        coords[b], mask[b] = c, m
    feats = jnp.asarray(rng.randn(B, cap, 3).astype(np.float32),
                        jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(125, 3, 8).astype(np.float32) * 0.1,
                         jnp.bfloat16)

    outs = {}
    variants = {"base": {}, "uniq": {"unique_scatter": True},
                "flat": {"flat_gather": True},
                "flat_uniq": {"flat_gather": True, "unique_scatter": True},
                "fscat": {"flat_scatter": True},
                "fscat_fg": {"flat_scatter": True, "flat_gather": True}}
    for name, kw in variants.items():
        o, miss = jax.jit(lambda f, c, m, k, kw=kw: sparse_conv0_zwin(
            f, c, m, k, extent, **kw))(
            feats, jnp.asarray(coords), jnp.asarray(mask), kernel)
        outs[name] = (np.asarray(o), np.asarray(miss))
    for name in variants:
        np.testing.assert_array_equal(outs[name][0], outs["base"][0])
        np.testing.assert_array_equal(outs[name][1], outs["base"][1])


def test_symmetric_bwd_grads_match_autodiff(rng):
    """The gather-only backward (sparse_conv_apply symmetric_bwd,
    DESIGN.md §16) must produce the same dx/dW as XLA autodiff of the
    plain path for a same-coords k3 map — including misses, padding
    rows, and a nonuniform upstream cotangent. f32 + HIGHEST precision:
    the two formulations differ only in summation order."""
    from situation3d_tpu.sparse.conv import sparse_conv_apply
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   lookup_kernel_map_dense)

    extent = (16, 16, 16)
    B, cap, n_occ = 2, 64, 48
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        c, m = make_sparse(rng, n_occ, span=16, cap=cap, seed_offset=b)
        coords[b], mask[b] = c, m
    feats = rng.randn(B, cap, 4).astype(np.float32)
    feats[~mask] = 0
    kernel = rng.randn(27, 4, 8).astype(np.float32) * 0.1
    cot = rng.randn(B, cap, 8).astype(np.float32)
    cot[~mask] = 0  # outputs are masked downstream; cotangent follows

    offs = jnp.asarray(kernel_offsets(3))
    grid, _ = jax.vmap(lambda c, m: build_level_grid(c, m, 1, extent))(
        jnp.asarray(coords), jnp.asarray(mask))
    nbr = jax.vmap(lambda g, oc, om: lookup_kernel_map_dense(
        g, cap, oc, om, offs, 1, 1, extent))(
        grid, jnp.asarray(coords), jnp.asarray(mask))

    def loss(f, k, sym):
        out = sparse_conv_apply(f, nbr, k, precision="highest",
                                symmetric_bwd=sym)
        return jnp.sum(out * jnp.asarray(cot))

    with jax.default_matmul_precision("highest"):
        want_dx, want_dw = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(feats), jnp.asarray(kernel), False)
        got_dx, got_dw = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(feats), jnp.asarray(kernel), True)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw),
                               rtol=1e-5, atol=1e-5)
    assert float(np.abs(np.asarray(want_dx)).sum()) > 0
    assert float(np.abs(np.asarray(want_dw)).sum()) > 0


def test_flat_conv_gather_bit_exact(rng):
    """"+flat" routing (sparse.conv_flat_gather, DESIGN.md §15/§16):
    flat t[i] row gathers in the XLA per-offset forward branch and the
    gather-only backward loops are pure access-path changes — bit-exact
    vs take_along_axis, including miss (== V_in) and -1 entries."""
    from situation3d_tpu.sparse.conv import sparse_conv_apply

    B, V, K, C, D = 2, 40, 27, 16, 24
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32),
                        jnp.bfloat16)
    nbr_np = rng.randint(0, V + 1, (B, V, K)).astype(np.int32)
    nbr_np[0, :5, :3] = -1          # the documented alt miss convention
    nbr = jnp.asarray(nbr_np)
    kern = jnp.asarray(rng.randn(K, C, D).astype(np.float32),
                       jnp.bfloat16)

    a = jax.jit(lambda f, n, k: sparse_conv_apply(f, n, k))(
        feats, nbr, kern)
    b = jax.jit(lambda f, n, k: sparse_conv_apply(
        f, n, k, pallas_gather="+flat"))(feats, nbr, kern)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    nbr_j = jnp.asarray(np.where(nbr_np < 0, V, nbr_np))

    def loss(f, k, pgv):
        return sparse_conv_apply(f, nbr_j, k, pallas_gather=pgv,
                                 symmetric_bwd=True) \
            .astype(jnp.float32).sum()

    ga = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        feats, kern, False)
    gb = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        feats, kern, "+flat")
    for x, y in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_symmetric_bwd_model_grads_match(rng):
    """gather_bwd=True must leave the WHOLE MinkUNet's parameter
    gradients unchanged: every k3 conv flips to the gather-only
    symmetric backward and every k2 down/up conv to the transpose-map
    backward (map_up/map_down pairs). final_result=True so the decoder's
    convtr convs are exercised too. Tiny extent, f32."""
    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.sparse.minkunet import MinkUNet, build_unet_plan
    from situation3d_tpu.sparse.tensor import SparseVoxels

    over = ["sparse.capacities=256,128,64,32,16",
            "sparse.grid_extent=(16,16,16)"]
    cfg_a = apply_overrides(Config(), over).sparse
    cfg_b = apply_overrides(Config(), over + ["sparse.gather_bwd=true"]).sparse

    B, cap = 2, 256
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        c, m = make_sparse(rng, 96, span=16, cap=cap, seed_offset=b)
        coords[b], mask[b] = c, m
    feats = rng.randn(B, cap, 3).astype(np.float32)
    feats[~mask] = 0

    x = SparseVoxels(coords=jnp.asarray(coords),
                     feats=jnp.asarray(feats),
                     mask=jnp.asarray(mask), stride=1)
    plan = build_unet_plan(
        x.coords, x.mask, cfg_a.capacities, dense_lookup=cfg_a.dense_lookup,
        extent=tuple(cfg_a.grid_extent), need_k5=False,
        dense_downsample=cfg_a.dense_downsample)

    grads = {}
    with jax.default_matmul_precision("highest"):
        for tag, scfg in (("a", cfg_a), ("b", cfg_b)):
            model = MinkUNet(scfg, final_result=True, dtype=jnp.float32)
            v = model.init({"params": jax.random.PRNGKey(0)}, x, plan,
                           train=False)

            def loss(p):
                out = model.apply({"params": p,
                                   "batch_stats": v["batch_stats"]},
                                  x, plan, train=False)
                return (jnp.sum(out["feat_bottleneck"].feats ** 2)
                        + jnp.sum(out["openscene_out"].feats ** 2))

            grads[tag] = jax.grad(loss)(v["params"])
    ga = jax.tree_util.tree_leaves(grads["a"])
    gb = jax.tree_util.tree_leaves(grads["b"])
    assert len(ga) == len(gb)
    assert any(float(np.abs(np.asarray(x_)).sum()) > 0 for x_ in ga)
    for wa, wb in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(wb), np.asarray(wa),
                                   rtol=2e-4, atol=2e-5)


def test_conv0_zwin_int8_grid(rng):
    """int8_grid conv0 (round-5 bandwidth lever): per-channel affine
    quantized int8 grid + occupancy lane + affine fold into the phase
    weights. Exact for full-range byte colors (the real conv0 input);
    bounded by step/2 per channel otherwise."""
    from situation3d_tpu.sparse.conv import sparse_conv0_zwin

    extent = (32, 24, 16)
    B, cap, n_occ = 4, 96, 80
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        c, m = make_sparse(rng, n_occ, span=14, cap=cap, seed_offset=17 + b)
        coords[b], mask[b] = c, m
    kernel = rng.randn(125, 3, 8).astype(np.float32) * 0.1

    # case A: byte-valued colors spanning the full [0, 255] range ->
    # step = 1.0 exactly, quantization is lossless
    feats = rng.randint(0, 256, (B, cap, 3)).astype(np.float32)
    feats[0, 0] = [0.0, 0.0, 0.0]
    feats[0, 1] = [255.0, 255.0, 255.0]
    feats[~mask] = 0
    with jax.default_matmul_precision("highest"):
        want, miss_a = sparse_conv0_zwin(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(kernel), extent)
        got, miss_b = sparse_conv0_zwin(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(kernel), extent, int8_grid=True)
    np.testing.assert_array_equal(np.asarray(miss_a), np.asarray(miss_b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)

    # case B: arbitrary floats -> error bounded by the documented
    # per-channel step/2 through the conv's weight mass
    featsf = (rng.randn(B, cap, 3).astype(np.float32) * 3.0 + 1.0)
    featsf[~mask] = 0
    with jax.default_matmul_precision("highest"):
        wantf, _ = sparse_conv0_zwin(
            jnp.asarray(featsf), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(kernel), extent)
        gotf, _ = sparse_conv0_zwin(
            jnp.asarray(featsf), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(kernel), extent, int8_grid=True)
    lo = np.where(mask[..., None], featsf, np.inf).min(axis=(0, 1))
    hi = np.where(mask[..., None], featsf, -np.inf).max(axis=(0, 1))
    step = (hi - lo) / 255.0
    # worst case: every one of the <=125 in-window taps off by step/2
    bound = 125 * np.abs(kernel).sum(axis=(0, 1)).max() * step.max() / 2
    err = np.abs(np.asarray(gotf) - np.asarray(wantf)).max()
    assert err <= bound, (err, bound)
    # and in practice far tighter than the worst case
    denom = np.abs(np.asarray(wantf)).max()
    assert err / denom < 0.02, (err, denom)

    # case D: KERNEL gradients through the int8 path stay exact (k4 is
    # linear in kernel; lo/step are stop_gradient'd data statistics) —
    # byte inputs make the quantized features identical, so kernel grads
    # must match the plain path
    def loss(k, int8):
        out, _ = sparse_conv0_zwin(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
            k, extent, int8_grid=int8)
        return jnp.sum(out * out)

    with jax.default_matmul_precision("highest"):
        gk_plain = jax.grad(lambda k: loss(k, False))(jnp.asarray(kernel))
        gk_int8 = jax.grad(lambda k: loss(k, True))(jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gk_int8), np.asarray(gk_plain),
                               rtol=1e-3, atol=1e-2)

    # case C: empty batch must not NaN (guarded lo/step)
    with jax.default_matmul_precision("highest"):
        gz, _ = sparse_conv0_zwin(
            jnp.zeros((2, cap, 3), jnp.float32),
            jnp.zeros((2, cap, 3), jnp.int32),
            jnp.zeros((2, cap), bool),
            jnp.asarray(kernel), extent, int8_grid=True)
    assert np.isfinite(np.asarray(gz)).all()
    np.testing.assert_array_equal(np.asarray(gz), 0.0)


def test_conv0_zwin_gradients_match(rng):
    """Gradients through the z-window conv (scatter/gather/one-hot einsum)
    must match the kernel-map path for both feats and kernel."""
    from situation3d_tpu.sparse.conv import sparse_conv0_zwin
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   lookup_kernel_map_dense)

    extent = (16, 16, 16)
    B, cap, n_occ = 1, 48, 40
    c, m = make_sparse(rng, n_occ, span=14, cap=cap)
    coords, mask = c[None], m[None]
    feats = rng.randn(B, cap, 3).astype(np.float32)
    feats[~mask] = 0
    kernel = rng.randn(125, 3, 4).astype(np.float32) * 0.1

    offs = jnp.asarray(kernel_offsets(5))
    grid, _ = jax.vmap(lambda c, m: build_level_grid(c, m, 1, extent))(
        jnp.asarray(coords), jnp.asarray(mask))
    nbr = jax.vmap(lambda g, oc, om: lookup_kernel_map_dense(
        g, cap, oc, om, offs, 1, 1, extent))(
        grid, jnp.asarray(coords), jnp.asarray(mask))

    tgt = rng.randn(B, cap, 4).astype(np.float32)

    def loss_ref(f, k):
        out = sparse_conv_apply(f, nbr, k)
        return jnp.sum((out - tgt) ** 2)

    def loss_zwin(f, k):
        out, _ = sparse_conv0_zwin(f, jnp.asarray(coords),
                                   jnp.asarray(mask), k, extent)
        return jnp.sum((out - tgt) ** 2)

    with jax.default_matmul_precision("highest"):
        gf_ref, gk_ref = jax.grad(loss_ref, (0, 1))(
            jnp.asarray(feats), jnp.asarray(kernel))
        gf_z, gk_z = jax.grad(loss_zwin, (0, 1))(
            jnp.asarray(feats), jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gf_z), np.asarray(gf_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_z), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_k3_zwin_matches_gather_path(rng):
    """sparse_conv_k3_zwin (map-free z-window k3 conv at C_in=32, the
    level-1 ResLayer class) must equal the kernel-map gather path,
    including boundary windows, odd cell extents and out-of-extent
    voxels."""
    from situation3d_tpu.sparse.conv import sparse_conv_k3_zwin
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   lookup_kernel_map_dense)

    extent, stride = (48, 28, 20), 2     # cells (24, 14, 10); odd NYG/ZC math
    B, cap, n_occ = 4, 96, 80            # B > batch_chunk -> lax.map path
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    for b in range(B):
        c, m = make_sparse(rng, n_occ, span=12, cap=cap, seed_offset=b)
        c = c * stride                   # multiples of the level stride
        # full-span cell shifts keep voxels unique (no scatter collisions)
        c[:10, 0] += 24                  # x cells in [12, 24): boundary
        c[5:8, 2] += 24                  # z cells [12, 24): all misses
        coords[b], mask[b] = c, m
    feats = rng.randn(B, cap, 32).astype(np.float32)
    feats[~mask] = 0
    kernel = rng.randn(27, 32, 16).astype(np.float32) * 0.1

    offs = jnp.asarray(kernel_offsets(3))
    grid, _ = jax.vmap(lambda c, m: build_level_grid(c, m, stride, extent))(
        jnp.asarray(coords), jnp.asarray(mask))
    nbr = jax.vmap(lambda g, oc, om: lookup_kernel_map_dense(
        g, cap, oc, om, offs, stride, stride, extent))(
        grid, jnp.asarray(coords), jnp.asarray(mask))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(sparse_conv_apply(
            jnp.asarray(feats), nbr, jnp.asarray(kernel)))
        got = np.asarray(jax.jit(sparse_conv_k3_zwin, static_argnums=(4, 5))(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(kernel), extent, stride))
    # in-extent voxels: exact agreement; out-of-extent voxels are the
    # documented semantic difference (map path: partial neighborhoods,
    # zwin: zero) — with dense_downsample they never reach level 1
    in_ext = mask & (coords < np.asarray(extent)).all(-1)
    assert (~in_ext & mask).sum() > 0
    np.testing.assert_allclose(got[in_ext], want[in_ext],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got[~in_ext], 0.0)


def test_conv_k3_zwin_gradients_match(rng):
    """Gradients through the k3 z-window conv (row scatter-add / window
    gather / phase matmul) must match the kernel-map path."""
    from situation3d_tpu.sparse.conv import sparse_conv_k3_zwin
    from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                   lookup_kernel_map_dense)

    extent, stride = (16, 16, 16), 2
    B, cap, n_occ = 1, 48, 40
    c, m = make_sparse(rng, n_occ, span=8, cap=cap)
    coords, mask = (c * stride)[None], m[None]
    feats = rng.randn(B, cap, 32).astype(np.float32)
    feats[~mask] = 0
    kernel = rng.randn(27, 32, 8).astype(np.float32) * 0.1

    offs = jnp.asarray(kernel_offsets(3))
    grid, _ = jax.vmap(lambda c, m: build_level_grid(c, m, stride, extent))(
        jnp.asarray(coords), jnp.asarray(mask))
    nbr = jax.vmap(lambda g, oc, om: lookup_kernel_map_dense(
        g, cap, oc, om, offs, stride, stride, extent))(
        grid, jnp.asarray(coords), jnp.asarray(mask))

    tgt = rng.randn(B, cap, 8).astype(np.float32)

    def loss_ref(f, k):
        out = sparse_conv_apply(f, nbr, k)
        return jnp.sum((out - tgt) ** 2)

    def loss_zwin(f, k):
        out = sparse_conv_k3_zwin(f, jnp.asarray(coords), jnp.asarray(mask),
                                  k, extent, stride)
        return jnp.sum((out - tgt) ** 2)

    with jax.default_matmul_precision("highest"):
        gf_ref, gk_ref = jax.grad(loss_ref, (0, 1))(
            jnp.asarray(feats), jnp.asarray(kernel))
        gf_z, gk_z = jax.grad(loss_zwin, (0, 1))(
            jnp.asarray(feats), jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gf_z), np.asarray(gf_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_z), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-4)


def test_minkunet_zwin_level1_path(rng):
    """UNet with zwin_level1 (C32 level-1 ResLayer on the z-window path)
    matches the kernel-map UNet end-to-end; the level-1 k3 map is never
    consumed by the zwin forward."""
    import dataclasses
    base = SparseConfig(
        planes=(32, 16, 32, 64, 32, 32, 24, 24),  # planes[0]=32: zwin class
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        init_dim=32,
        in_channels=3,
        out_channels=16,
        capacities=(256, 128, 64, 32, 16),
        grid_extent=(64, 64, 64),
    )
    cfg_on = dataclasses.replace(base, zwin_level1=True)
    coords, mask, feats = _unet_inputs(rng, base)
    plan = jax.jit(lambda c, m: build_unet_plan(
        c, m, base.capacities, True, base.grid_extent))(coords, mask)
    x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
    m_on = MinkUNet(cfg_on, final_result=True)
    m_off = MinkUNet(base, final_result=True)
    with jax.default_matmul_precision("highest"):
        vs = jax.jit(lambda p: m_on.init(jax.random.PRNGKey(0), x, p,
                                         train=False))(plan)
        out_on = jax.jit(lambda v, p: m_on.apply(v, x, p, train=False))(vs, plan)
        out_off = jax.jit(lambda v, p: m_off.apply(v, x, p, train=False))(vs, plan)
    for key in ("feat_bottleneck", "openscene_out"):
        np.testing.assert_allclose(
            np.asarray(out_on[key].feats), np.asarray(out_off[key].feats),
            rtol=2e-4, atol=2e-4)


def test_minkunet_zwin_level1_shared(rng):
    """zwin_level1="shared" (whole level-1 ResLayer on ONE shared grid,
    conv.py zwin_res_layer_shared): bit-exact vs the per-conv z-window
    path (clear+add over identical rows == fresh zeros+add), allclose vs
    the kernel-map path, identical param/batch_stats tree, and the
    training forward (which falls back to the kernel-map path for
    whole-batch BN) runs against the same variables."""
    import dataclasses
    base = SparseConfig(
        planes=(32, 16, 32, 64, 32, 32, 24, 24),
        layers=(2, 1, 1, 1, 1, 1, 1, 1),   # layers[0]=2: 4 level-1 convs
        init_dim=32,
        in_channels=3,
        out_channels=16,
        capacities=(256, 128, 64, 32, 16),
        grid_extent=(64, 64, 64),
    )
    cfg_sh = dataclasses.replace(base, zwin_level1="shared")
    cfg_pc = dataclasses.replace(base, zwin_level1=True)
    coords, mask, feats = _unet_inputs(rng, base)
    plan = jax.jit(lambda c, m: build_unet_plan(
        c, m, base.capacities, True, base.grid_extent))(coords, mask)
    x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
    m_sh = MinkUNet(cfg_sh, final_result=True)
    m_pc = MinkUNet(cfg_pc, final_result=True)
    m_off = MinkUNet(base, final_result=True)
    with jax.default_matmul_precision("highest"):
        vs = jax.jit(lambda p: m_sh.init(jax.random.PRNGKey(0), x, p,
                                         train=False))(plan)
        vs_off = jax.jit(lambda p: m_off.init(jax.random.PRNGKey(0), x, p,
                                              train=False))(plan)
        # identical param + batch_stats trees (checkpoint-interchangeable)
        assert (jax.tree_util.tree_structure(vs)
                == jax.tree_util.tree_structure(vs_off))
        out_sh = jax.jit(lambda v, p: m_sh.apply(v, x, p, train=False))(vs, plan)
        out_pc = jax.jit(lambda v, p: m_pc.apply(v, x, p, train=False))(vs, plan)
        out_off = jax.jit(lambda v, p: m_off.apply(v, x, p, train=False))(vs, plan)
        # training forward with the same variables (kernel-map fallback)
        _ = jax.jit(lambda v, p: m_sh.apply(
            v, x, p, train=True, mutable=["batch_stats"]))(vs, plan)
    for key in ("feat_bottleneck", "openscene_out"):
        np.testing.assert_array_equal(
            np.asarray(out_sh[key].feats), np.asarray(out_pc[key].feats))
        np.testing.assert_allclose(
            np.asarray(out_sh[key].feats), np.asarray(out_off[key].feats),
            rtol=2e-4, atol=2e-4)


def test_minkunet_fused_conv_path(rng, tiny_unet):
    """UNet with the fused Pallas conv (interpret) matches the XLA-path
    UNet end-to-end, decoder included (exercises every K/C combination the
    real network feeds the kernel)."""
    import dataclasses
    cfg_on = dataclasses.replace(tiny_unet, fused_conv="force",
                                 grid_extent=(64, 64, 64))
    cfg_off = dataclasses.replace(tiny_unet, fused_conv=False,
                                  grid_extent=(64, 64, 64))
    coords, mask, feats = _unet_inputs(rng, cfg_on)
    plan = jax.jit(lambda c, m: build_unet_plan(
        c, m, cfg_on.capacities, True, cfg_on.grid_extent))(coords, mask)
    x = SparseVoxels(coords=coords, feats=feats, mask=mask, stride=1)
    m_on = MinkUNet(cfg_on, final_result=True)
    m_off = MinkUNet(cfg_off, final_result=True)
    vs = jax.jit(lambda p: m_on.init(jax.random.PRNGKey(0), x, p,
                                     train=False))(plan)
    out_on = m_on.apply(vs, x, plan, train=False)
    out_off = jax.jit(lambda v, p: m_off.apply(v, x, p, train=False))(vs, plan)
    for key in ("feat_bottleneck", "openscene_out"):
        np.testing.assert_allclose(
            np.asarray(out_on[key].feats), np.asarray(out_off[key].feats),
            rtol=2e-4, atol=2e-4)


def test_unet_plan_pallas_map_bits_bitequal(rng):
    """pallas_map_bits='force' + dense_downsample produces a bit-identical
    level-1 k3 map at an extent where the int32 VMEM grid CANNOT fit
    (16.8 MB) but the bit-packed occupancy tables (1 MB) can."""
    from situation3d_tpu.ops.pallas.map_bits import map_bits_fits
    from situation3d_tpu.ops.pallas.map_lookup import map_lookup_fits
    extent = (512, 512, 128)
    assert not map_lookup_fits(256 * 256 * 64, 64)
    assert map_bits_fits(256 * 256 * 64, 64)
    caps = (256, 128, 64, 32, 16)
    B = 2
    coords = np.zeros((B, caps[0], 3), np.int32)
    mask = np.zeros((B, caps[0]), bool)
    for b in range(B):
        c = np.unique(rng.randint(0, 200, (260, 3)), axis=0)[:200]
        c[0] = (0, 0, 0)
        c[1] = (511, 511, 127)           # far corner: rows > 0, z edge
        coords[b, :len(c)], mask[b, :len(c)] = np.unique(c, axis=0), True
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    base = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=extent, need_k5=False,
        dense_downsample=True)["levels"][1]["map_k3"])(cj, mj)
    bits = jax.jit(lambda c, m: build_unet_plan(
        c, m, caps, dense_lookup=True, extent=extent, need_k5=False,
        dense_downsample=True, pallas_map_bits="force")
        ["levels"][1]["map_k3"])(cj, mj)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(base))
