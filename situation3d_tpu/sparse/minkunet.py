"""MinkUNet18A — sparse-voxel UNet, TPU-native.

Re-implementation of the OpenScene encoder used by SIG3D
(``situation3d/models/mink_unet.py`` MinkUNetBase/MinkUNet18A +
``resnet_base.py`` ResNetBase) on the gather-scatter sparse engine.

Structure (MinkUNet18A: BasicBlock, LAYERS=(2,)*8,
PLANES=(32,64,128,256,128,128,96,96), INIT_DIM=32):

  conv0 (k5, s1) -> [conv k2/s2 -> 2x BasicBlock(k3)] x4 down to stride 16
  (bottleneck, 256 ch, ``feat_bottleneck``), then 4x [convtr k2/s2 -> cat
  skip -> 2x BasicBlock] back to stride 1 and a 1x1 ``final`` conv to the
  768-d CLIP space (``openscene_out``) — decoder tail only when
  ``final_result`` (CONF.OPENSCENE.final_result, eval-time segmentation).

Coordinate management is precomputed by :func:`build_unet_plan` (jittable;
see kernel_map.py) so the network body is pure MXU work.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.config import SparseConfig
from situation3d_tpu.sparse.conv import (
    SparseBatchNorm,
    SparseConv,
    SparseConv1x1,
    sparse_relu,
)
from situation3d_tpu.sparse.kernel_map import (
    build_kernel_map,
    downsample_coords,
    kernel_offsets,
)
from situation3d_tpu.sparse.tensor import SparseVoxels

STRIDES = (1, 2, 4, 8, 16)


def build_unet_plan(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    capacities: Sequence[int],
    dense_lookup: bool = True,
    extent: Sequence[int] = (512, 512, 256),
    need_k5: bool = True,
    dense_downsample: bool = False,
    pallas_map: Any = False,
    pallas_map_bits: Any = False,
) -> Dict[str, Any]:
    """Build all coordinate sets and kernel maps for the UNet, batched.

    The TPU analogue of MinkowskiEngine's CoordinateManager: every conv in
    the network reads a precomputed neighbor map; all k3 convs at one stride
    share a single map.

    Args:
      coords: int32 [B, V0, 3] stride-1 voxel coords (padded).
      mask:   bool [B, V0].
      capacities: per-stride voxel budgets for strides (1, 2, 4, 8, 16).

    Returns a dict:
      levels: list over strides of {coords, mask, map_k3}; level 0 also has
        map_k5. Levels 1.. have map_down (from finer level) and level i has
        map_up used by the transpose conv from level i+1 into level i.
      overflow: {"voxels_dropped": [B], "extent_misses": [B]} int32 counters
        (capacity/grid overflow is reported, never silent).
    """
    assert len(capacities) == len(STRIDES)
    B = coords.shape[0]
    # numpy (static) offsets: the dense path picks block vs elementwise
    # lookups from their values at trace time
    k2 = kernel_offsets(2)
    k3 = kernel_offsets(3)
    k5 = kernel_offsets(5)
    overflow = {"voxels_dropped": jnp.zeros((B,), jnp.int32),
                "extent_misses": jnp.zeros((B,), jnp.int32)}

    levels = [{"coords": coords, "mask": mask}]
    for i in range(1, len(STRIDES)):
        prev = levels[i - 1]
        if dense_downsample and dense_lookup:
            # sort-free: grid occupancy + cumsum compaction, bit-identical
            # order for in-extent scenes; the k2 down map falls out of the
            # same pass as a collision-free scatter (V_in writes instead of
            # 8*V_out grid gathers), kernel_map.downsample_with_down_map
            from situation3d_tpu.sparse.kernel_map import \
                downsample_with_down_map
            c, m, dropped, dmap, umap = jax.vmap(
                lambda pc, pm: downsample_with_down_map(
                    pc, pm, STRIDES[i - 1], 2, capacities[i], tuple(extent))
            )(prev["coords"], prev["mask"])
            levels.append({"coords": c, "mask": m, "map_down": dmap})
            prev["map_up"] = umap
            overflow["voxels_dropped"] = overflow["voxels_dropped"] + dropped
            continue
        else:
            c, m, dropped = jax.vmap(
                lambda pc, pm: downsample_coords(
                    pc, pm, STRIDES[i - 1], 2, capacities[i]
                )
            )(prev["coords"], prev["mask"])
        overflow["voxels_dropped"] = overflow["voxels_dropped"] + dropped
        levels.append({"coords": c, "mask": m})

    # level 0 builds the k5 map once and slices the k3 map out of it (the 27
    # offsets of kernel 3 are a subset of kernel 5's 125), saving a pass.
    # With the z-window conv0 (sparse_conv0_zwin) the k5 map is not needed
    # at all (need_k5=False): level 0 gets a direct k3 map, which QA-mode
    # forwards never read — XLA dead-code-eliminates its construction.
    k5_np = kernel_offsets(5)
    k3_in_k5 = jnp.asarray(
        [int(np.flatnonzero((k5_np == o).all(1))[0]) for o in kernel_offsets(3)])
    extent = tuple(extent)

    if dense_lookup:
        # O(1)-probe path: one dense index grid per level (scatter), every
        # map entry one elementwise gather. Measured v5e note: XLA's
        # elementwise gather (~60-70 M int32 rows/s) BEATS sliced/block
        # gathers here — lax.gather with slice_sizes (k,k,k) ran 1.9x
        # slower and (1,1,k) z-slices 33x slower, so the padded-grid block
        # variants in kernel_map.py stay opt-in for other hardware.
        from situation3d_tpu.sparse.kernel_map import (build_level_grid,
                                                       lookup_kernel_map_dense)
        grids = []
        for i, lvl in enumerate(levels):
            grid, misses = jax.vmap(
                lambda c, m, s=STRIDES[i]: build_level_grid(c, m, s, extent)
            )(lvl["coords"], lvl["mask"])
            overflow["extent_misses"] = overflow["extent_misses"] + misses
            grids.append(grid)

        def lookup(level_i, out_coords, out_mask, offsets, offset_stride):
            s = STRIDES[level_i]
            v_in = levels[level_i]["coords"].shape[1]
            offs = jnp.asarray(offsets)
            return jax.vmap(
                lambda g, oc, om: lookup_kernel_map_dense(
                    g, v_in, oc, om, offs, s, offset_stride, extent)
            )(grids[level_i], out_coords, out_mask)

        # same-stride k3 maps optionally route through the Pallas
        # VMEM-grid kernel (ops/pallas/map_lookup.py) per level when the
        # z-packed grid fits the VMEM budget; bit-equal to the XLA lookup
        on_cpu = jax.devices()[0].platform == "cpu"
        pm_on = bool(pallas_map) and (pallas_map == "force" or not on_cpu)
        pb_on = bool(pallas_map_bits) and (pallas_map_bits == "force"
                                           or not on_cpu)

        def lookup_k3(level_i, out_coords, out_mask):
            s = STRIDES[level_i]
            cells = tuple(e // s for e in extent)
            n_cells = cells[0] * cells[1] * cells[2]
            v_in = levels[level_i]["coords"].shape[1]
            if pm_on:
                from situation3d_tpu.ops.pallas.map_lookup import (
                    k3_map_lookup_pallas, map_lookup_fits)
                if map_lookup_fits(n_cells, cells[2]):
                    return k3_map_lookup_pallas(
                        grids[level_i], out_coords // s, out_mask, cells,
                        v_in, interpret=on_cpu)
            # where the int32 grid can't fit (level 1: 33.5 MB), the
            # bit-packed occupancy tables (2.1 MB) can — valid only for
            # dense-downsampled levels (rank == row id needs ascending
            # flat order, downsample_coords_dense's guarantee)
            if pb_on and dense_downsample and level_i >= 1:
                from situation3d_tpu.ops.pallas.map_bits import (
                    build_level_bits, k3_map_lookup_bits, map_bits_fits)
                if map_bits_fits(n_cells, cells[2]):
                    lvl = levels[level_i]
                    bits, pfx = jax.vmap(
                        lambda c, m: build_level_bits(c, m, s, extent)
                    )(lvl["coords"], lvl["mask"])
                    return k3_map_lookup_bits(
                        bits, pfx, out_coords // s, out_mask, cells,
                        v_in, interpret=on_cpu)
            return lookup(level_i, out_coords, out_mask, k3, s)
    else:
        def lookup(level_i, out_coords, out_mask, offsets, offset_stride):
            s = STRIDES[level_i]
            lvl = levels[level_i]
            offs = jnp.asarray(offsets)
            return jax.vmap(
                lambda ic, im, oc, om: build_kernel_map(
                    ic, im, oc, om, offs, s, offset_stride)
            )(lvl["coords"], lvl["mask"], out_coords, out_mask)

        def lookup_k3(level_i, out_coords, out_mask):
            return lookup(level_i, out_coords, out_mask, k3,
                          STRIDES[level_i])

    for i, lvl in enumerate(levels):
        s = STRIDES[i]
        if i == 0:
            if need_k5:
                lvl["map_k5"] = lookup(0, lvl["coords"], lvl["mask"], k5, s)
                lvl["map_k3"] = lvl["map_k5"][:, :, k3_in_k5]
            else:
                lvl["map_k3"] = lookup_k3(0, lvl["coords"], lvl["mask"])
        else:
            lvl["map_k3"] = lookup_k3(i, lvl["coords"], lvl["mask"])
        if i > 0:
            fine = levels[i - 1]
            sf = STRIDES[i - 1]
            # strided conv: query the fine level from coarse coords, offsets
            # in units of the (fine) input stride (precomputed by the
            # dense-downsample scatter when that path is on)
            if "map_down" not in lvl:
                lvl["map_down"] = lookup(i - 1, lvl["coords"], lvl["mask"],
                                         k2, sf)
            # transpose conv back up: query the coarse level from fine coords
            # with mirrored offsets; divisibility handles parity (also
            # precomputed by the dense-downsample scatter)
            if "map_up" not in fine:
                fine["map_up"] = lookup(i, fine["coords"], fine["mask"],
                                        -k2, sf)
    return {"levels": levels, "overflow": overflow}


class BasicBlock(nn.Module):
    """ME ResNet BasicBlock (expansion=1): conv3-bn-relu-conv3-bn + skip."""
    planes: int
    kernel_volume: int = 27
    dtype: jnp.dtype = jnp.float32
    dense_grid_extent: tuple = None
    pallas_gather: Any = False
    zwin_extent: tuple = None
    symmetric_bwd: bool = False

    @nn.compact
    def __call__(self, x: SparseVoxels, nbr_idx, train: bool, momentum=None) -> SparseVoxels:
        residual = x
        out = SparseConv(self.planes, self.kernel_volume, dtype=self.dtype,
                         dense_grid_extent=self.dense_grid_extent,
                         pallas_gather=self.pallas_gather,
                         zwin_extent=self.zwin_extent,
                         symmetric_bwd=self.symmetric_bwd, name="conv1")(
            x, nbr_idx, x.coords, x.mask, x.stride
        )
        out = SparseBatchNorm(dtype=self.dtype, name="norm1")(
            out, use_running_average=not train, momentum=momentum
        )
        out = sparse_relu(out)
        out = SparseConv(self.planes, self.kernel_volume, dtype=self.dtype,
                         dense_grid_extent=self.dense_grid_extent,
                         pallas_gather=self.pallas_gather,
                         zwin_extent=self.zwin_extent,
                         symmetric_bwd=self.symmetric_bwd, name="conv2")(
            out, nbr_idx, out.coords, out.mask, out.stride
        )
        out = SparseBatchNorm(dtype=self.dtype, name="norm2")(
            out, use_running_average=not train, momentum=momentum
        )
        if residual.num_channels != self.planes:
            residual = SparseConv1x1(self.planes, dtype=self.dtype, name="downsample_conv")(residual)
            residual = SparseBatchNorm(dtype=self.dtype, name="downsample_norm")(
                residual, use_running_average=not train, momentum=momentum
            )
        return sparse_relu(out.replace(feats=out.feats + residual.feats))


class _ZwinConvParams(nn.Module):
    """Declares a SparseConv-identical kernel param (same name, shape,
    initializer) without running the gather-map conv — the z-window shared
    layer consumes the raw kernels (:func:`zwin_res_layer_shared`)."""
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, c_in: int):
        return self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, c_in, self.out_channels), jnp.float32)


class _ZwinBNParams(nn.Module):
    """Declares SparseBatchNorm's params + batch_stats (same names and
    collections) and returns the eval-form constants."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


class _ZwinBlockParams(nn.Module):
    """BasicBlock-identical param tree (conv1/norm1/conv2/norm2) for the
    shared-grid z-window path. Only valid when in_channels == planes (no
    downsample projection — true for the level-1 C32 class)."""
    planes: int

    @nn.compact
    def __call__(self, c_in: int):
        assert c_in == self.planes, "zwin shared layer has no downsample path"
        k1 = _ZwinConvParams(self.planes, name="conv1")(c_in)
        bn1 = _ZwinBNParams(name="norm1")(self.planes)
        k2 = _ZwinConvParams(self.planes, name="conv2")(self.planes)
        bn2 = _ZwinBNParams(name="norm2")(self.planes)
        return k1, bn1, k2, bn2


class ResLayer(nn.Module):
    planes: int
    num_blocks: int
    dtype: jnp.dtype = jnp.float32
    dense_grid_extent: tuple = None
    pallas_gather: Any = False
    zwin_extent: tuple = None
    symmetric_bwd: bool = False
    # whole-layer z-window with ONE shared dense grid across all convs
    # (zwin_res_layer_shared; eval only — BN batch statistics need the
    # whole batch, the shared grid chunks it). Param/batch_stats tree is
    # identical to the BasicBlock path (checkpoint-interchangeable).
    zwin_shared: bool = False

    @nn.compact
    def __call__(self, x, nbr_idx, train, momentum=None):
        if self.zwin_shared:
            from situation3d_tpu.sparse.conv import zwin_res_layer_shared
            assert self.zwin_extent is not None and not train
            blocks = [
                _ZwinBlockParams(self.planes, name=f"block{i}")(x.num_channels)
                for i in range(self.num_blocks)
            ]
            out = zwin_res_layer_shared(
                x.feats.astype(self.dtype), x.coords, x.mask, blocks,
                tuple(self.zwin_extent), x.stride)
            return x.replace(feats=out)
        for i in range(self.num_blocks):
            x = BasicBlock(self.planes, dtype=self.dtype,
                           dense_grid_extent=self.dense_grid_extent,
                           pallas_gather=self.pallas_gather,
                           zwin_extent=self.zwin_extent,
                           symmetric_bwd=self.symmetric_bwd,
                           name=f"block{i}")(x, nbr_idx, train, momentum)
        return x


class MinkUNet(nn.Module):
    """MinkUNet18A ('DisNet' in the reference, mink_unet.py:293)."""
    cfg: SparseConfig
    final_result: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: SparseVoxels,
        plan: Dict[str, Any],
        train: bool = False,
        momentum: Optional[float] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        L = plan["levels"]
        dt = self.dtype
        # fused_conv supersedes the plain pallas gather where it applies
        # (sparse_conv_apply falls back per-conv when the table won't fit)
        pg = cfg.pallas_gather
        if cfg.fused_conv:
            pg = "fused_force" if cfg.fused_conv == "force" else "fused"
        if getattr(cfg, "conv_flat_gather", False):
            # "+flat": XLA per-offset branches gather rows flat (§15's
            # access-path switch applied to the map-driven convs). NOTE:
            # a bare bool pallas_gather=True is dropped here — the flat
            # path REPLACES the plain vmem-gather routing (chip e2e A/B:
            # all-flat 18.75 vs kernel-mixed 17.65 samples/s, §17).
            pg = (pg if isinstance(pg, str) and pg else "") + "+flat"

        # gather-only backward for the same-coords odd-cube convs (all
        # k3 ResLayer convs + the k5 conv0 fallback); k2 down/up maps are
        # not symmetric and keep the autodiff backward
        sym_bwd = bool(getattr(cfg, "gather_bwd", False))

        def conv(name, out_ch, kvol, src, nbr, lvl, stride, sym=False,
                 tmap=None):
            return SparseConv(out_ch, kvol, dtype=dt, name=name,
                              pallas_gather=pg,
                              symmetric_bwd=sym and sym_bwd)(
                src, nbr, lvl["coords"], lvl["mask"], stride,
                transpose_map=tmap if sym_bwd else None
            )

        def bn(name, t):
            return SparseBatchNorm(dtype=dt, name=name)(
                t, use_running_average=not train, momentum=momentum
            )

        def dense_ext(stride):
            # dense conv3d path for same-stride blocks at coarse strides
            m = getattr(cfg, "dense_conv_min_stride", 0)
            return tuple(cfg.grid_extent) if (m and stride >= m
                                              and cfg.dense_lookup) else None

        out: Dict[str, Any] = {}
        x = x.replace(feats=x.feats.astype(dt))

        if cfg.conv0_zwin and cfg.dense_lookup:
            # map-free z-window formulation: removes conv0's 6.1 M map rows
            # + 6.1 M feature rows per sample (sparse/conv.py)
            from situation3d_tpu.sparse.conv import SparseConvZWin
            h = SparseConvZWin(cfg.init_dim, tuple(cfg.grid_extent),
                               dtype=dt,
                               int8_grid=getattr(cfg, "conv0_int8", False),
                               flat_gather=getattr(
                                   cfg, "conv0_flat_gather", False),
                               unique_scatter=getattr(
                                   cfg, "conv0_unique_scatter", False),
                               flat_scatter=getattr(
                                   cfg, "conv0_flat_scatter", False),
                               name="conv0p1s1")(x)
        else:
            h = conv("conv0p1s1", cfg.init_dim, 125, x, L[0]["map_k5"],
                     L[0], 1, sym=True)
        h = sparse_relu(bn("bn0", h))
        out_p1 = h

        h = conv("conv1p1s2", cfg.init_dim, 8, h, L[1]["map_down"],
                 L[1], 2, tmap=L[0]["map_up"])
        h = sparse_relu(bn("bn1", h))
        # level-1 z-window path (C32): the ResLayer never touches
        # L[1]["map_k3"], whose construction (the largest remaining k3 map,
        # 27 x 24576 grid gathers) and the level-1 grid build XLA then DCEs.
        # zwin_level1 values: False (kernel-map path) | True (per-conv
        # z-window — chip-measured loss, DESIGN.md §10) | "shared" (whole
        # layer on ONE shared grid, eval forwards only — training forwards
        # fall back to the kernel-map path for whole-batch BN statistics).
        zl1 = getattr(cfg, "zwin_level1", False)
        zl1 = zl1 if (zl1 and cfg.dense_lookup) else False
        zwin1 = tuple(cfg.grid_extent) if zl1 else None
        zshared = zl1 == "shared" and not train
        h = ResLayer(cfg.planes[0], cfg.layers[0], dt, dense_ext(2), pg,
                     symmetric_bwd=sym_bwd,
                     zwin_extent=None if (zl1 == "shared" and not zshared)
                     else zwin1,
                     zwin_shared=zshared, name="block1")(
            h, L[1]["map_k3"], train, momentum)
        out_b1p2 = h

        h = conv("conv2p2s2", h.num_channels, 8, h, L[2]["map_down"],
                 L[2], 4, tmap=L[1]["map_up"])
        h = sparse_relu(bn("bn2", h))
        h = ResLayer(cfg.planes[1], cfg.layers[1], dt, dense_ext(4), pg,
                     symmetric_bwd=sym_bwd, name="block2")(h, L[2]["map_k3"], train, momentum)
        out_b2p4 = h

        h = conv("conv3p4s2", h.num_channels, 8, h, L[3]["map_down"],
                 L[3], 8, tmap=L[2]["map_up"])
        h = sparse_relu(bn("bn3", h))
        h = ResLayer(cfg.planes[2], cfg.layers[2], dt, dense_ext(8), pg,
                     symmetric_bwd=sym_bwd, name="block3")(h, L[3]["map_k3"], train, momentum)
        out_b3p8 = h

        h = conv("conv4p8s2", h.num_channels, 8, h, L[4]["map_down"],
                 L[4], 16, tmap=L[3]["map_up"])
        h = sparse_relu(bn("bn4", h))
        h = ResLayer(cfg.planes[3], cfg.layers[3], dt, dense_ext(16), pg,
                     symmetric_bwd=sym_bwd, name="block4")(h, L[4]["map_k3"], train, momentum)
        out["feat_bottleneck"] = h  # stride 16, 256 ch (sqa_module.py:292 input)

        h = conv("convtr4p16s2", cfg.planes[4], 8, h, L[3]["map_up"],
                 L[3], 8, tmap=L[4]["map_down"])
        h = sparse_relu(bn("bntr4", h))
        h = h.cat(out_b3p8)
        h = ResLayer(cfg.planes[4], cfg.layers[4], dt, dense_ext(8), pg,
                     symmetric_bwd=sym_bwd, name="block5")(h, L[3]["map_k3"], train, momentum)
        out["feat_layer5"] = h

        h = conv("convtr5p8s2", cfg.planes[5], 8, h, L[2]["map_up"],
                 L[2], 4, tmap=L[3]["map_down"])
        h = sparse_relu(bn("bntr5", h))
        h = h.cat(out_b2p4)
        h = ResLayer(cfg.planes[5], cfg.layers[5], dt, dense_ext(4), pg,
                     symmetric_bwd=sym_bwd, name="block6")(h, L[2]["map_k3"], train, momentum)
        out["feat_layer6"] = h

        if self.final_result:
            h = conv("convtr6p4s2", cfg.planes[6], 8, h, L[1]["map_up"],
                     L[1], 2, tmap=L[2]["map_down"])
            h = sparse_relu(bn("bntr6", h))
            h = h.cat(out_b1p2)
            h = ResLayer(cfg.planes[6], cfg.layers[6], dt, dense_ext(2), pg,
                     symmetric_bwd=sym_bwd, name="block7")(h, L[1]["map_k3"], train, momentum)

            h = conv("convtr7p2s2", cfg.planes[7], 8, h, L[0]["map_up"],
                     L[0], 1, tmap=L[1]["map_down"])
            h = sparse_relu(bn("bntr7", h))
            h = h.cat(out_p1)
            h = ResLayer(cfg.planes[7], cfg.layers[7], dt, dense_ext(1), pg,
                     symmetric_bwd=sym_bwd, name="block8")(h, L[0]["map_k3"], train, momentum)
            out["openscene_out"] = SparseConv1x1(
                cfg.out_channels, use_bias=True, dtype=dt, name="final"
            )(h)
        return out
