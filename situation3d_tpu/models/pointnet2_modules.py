"""PointNet++ set-abstraction / feature-propagation modules (flax.linen).

Re-implements ``lib/pointnet2/pointnet2_modules.py:26-523`` (PointnetSAModule,
PointnetSAModuleMSG, PointnetSAModuleVotes, PointnetFPModule) and the
``SharedMLP`` of ``pytorch_utils.py`` over the channel-last XLA ops in
ops/pointnet2.py. The [B, C, npoint, nsample] conv2d-1x1 stacks become
pointwise Dense layers over [B, npoint, nsample, C] (identical math, MXU
layout), BN statistics over (B, npoint, nsample).

BASELINE config 1 ("PointNet++ SSG encoder forward on one ScanNet scene")
is two stacked PointnetSAModule + one PointnetFPModule, see
tests/test_pointnet2_modules.py.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from situation3d_tpu.ops.pointnet2 import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    interpolation_weights,
    three_interpolate,
    three_nn,
)


class SharedMLP(nn.Module):
    """Pointwise MLP with BN+ReLU per layer (pytorch_utils.SharedMLP)."""
    channels: Sequence[int]
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype,
                         name=f"conv{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, axis=-1,
                                 dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class QueryAndGroup(nn.Module):
    """Ball query + grouping with optional xyz concat
    (pointnet2_utils.QueryAndGroup; ``normalize_xyz`` divides local coords
    by the radius as in the VoteNet variant)."""
    radius: float
    nsample: int
    use_xyz: bool = True
    normalize_xyz: bool = False

    @nn.compact
    def __call__(self, xyz, new_xyz, features=None, valid=None):
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz, valid)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped = group_points(features, idx)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        else:
            grouped = grouped_xyz
        return grouped, idx, grouped_xyz


class PointnetSAModule(nn.Module):
    """Single-scale set abstraction (pointnet2_modules.PointnetSAModule)."""
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    pooling: str = "max"  # "max" | "avg" (PointnetSAModuleVotes options)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, train=False):
        inds = furthest_point_sample(xyz, self.npoint, valid)
        new_xyz = gather_points(xyz, inds)
        grouped, _, _ = QueryAndGroup(self.radius, self.nsample, self.use_xyz,
                                      name="grouper")(xyz, new_xyz, features, valid)
        h = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(grouped, train)
        if self.pooling == "max":
            pooled = jnp.max(h, axis=2)
        else:
            pooled = jnp.mean(h, axis=2)
        return new_xyz, pooled, inds


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale grouping variant (PointnetSAModuleMSG)."""
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, train=False):
        inds = furthest_point_sample(xyz, self.npoint, valid)
        new_xyz = gather_points(xyz, inds)
        outs = []
        for i, (r, k, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            grouped, _, _ = QueryAndGroup(r, k, self.use_xyz,
                                          name=f"grouper{i}")(xyz, new_xyz,
                                                              features, valid)
            h = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{i}")(grouped, train)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class PointnetSAModuleVotes(nn.Module):
    """Set abstraction with seed-index passthrough and max/avg/rbf pooling
    (``pointnet2_modules.py`` PointnetSAModuleVotes:163-276) — the module
    VoteNet-style detection uses to aggregate votes into proposals while
    remembering which seeds produced them (for GT vote lookup)."""
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    pooling: str = "max"          # "max" | "avg" | "rbf"
    sigma: Optional[float] = None  # rbf bandwidth; default radius/2
    normalize_xyz: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, valid=None,
                 train=False):
        """Returns (new_xyz [B,np,3], new_features [B,np,C], inds [B,np])."""
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint, valid)
        else:
            assert inds.shape[1] == self.npoint
        new_xyz = gather_points(xyz, inds)
        grouped, _, grouped_xyz = QueryAndGroup(
            self.radius, self.nsample, self.use_xyz, self.normalize_xyz,
            name="grouper")(xyz, new_xyz, features, valid)
        h = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(grouped, train)
        if self.pooling == "max":
            pooled = jnp.max(h, axis=2)
        elif self.pooling == "avg":
            pooled = jnp.mean(h, axis=2)
        elif self.pooling == "rbf":
            sigma = self.sigma if self.sigma is not None else self.radius / 2
            rbf = jnp.exp(-jnp.sum(jnp.square(grouped_xyz), -1)
                          / (sigma ** 2) / 2)           # [B, np, ns]
            pooled = jnp.sum(h * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        return new_xyz, pooled, inds


class PointnetSAModuleMSGVotes(nn.Module):
    """MSG set abstraction with seed-index passthrough
    (PointnetSAModuleMSGVotes, pointnet2_modules.py:278-360)."""
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, valid=None,
                 train=False):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint, valid)
        new_xyz = gather_points(xyz, inds)
        outs = []
        for i, (r, k, mlp) in enumerate(zip(self.radii, self.nsamples,
                                            self.mlps)):
            grouped, _, _ = QueryAndGroup(r, k, self.use_xyz,
                                          name=f"grouper{i}")(
                xyz, new_xyz, features, valid)
            h = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{i}")(grouped,
                                                                 train)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class PointnetLFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation from set 1 onto set 2
    (PointnetLFPModuleMSG, pointnet2_modules.py:412-523): for each scale,
    group set-1 features around set-2 positions, MLP+max-pool, concat set-2
    features, post-MLP; scales concatenate on channels."""
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    post_mlp: Sequence[int]
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz2, xyz1, features2=None, features1=None,
                 valid1=None, train=False):
        """Propagate features from (xyz1, features1) to xyz2 positions.
        Returns [B, N2, len(radii) * post_mlp[-1]]."""
        outs = []
        post = SharedMLP(self.post_mlp, dtype=self.dtype, name="post_mlp")
        for i, (r, k, mlp) in enumerate(zip(self.radii, self.nsamples,
                                            self.mlps)):
            grouped, _, _ = QueryAndGroup(r, k, self.use_xyz,
                                          name=f"grouper{i}")(
                xyz1, xyz2, features1, valid1)
            h = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{i}")(grouped,
                                                                 train)
            h = jnp.max(h, axis=2)                       # [B, N2, mlp[-1]]
            if features2 is not None:
                h = jnp.concatenate([h, features2], axis=-1)
            outs.append(post(h, train))
        return jnp.concatenate(outs, axis=-1)


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN interpolate + unit MLP (PointnetFPModule)."""
    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 known_valid=None, train=False):
        if known is not None:
            dist, idx = three_nn(unknown, known, known_valid)
            w = interpolation_weights(dist)
            interp = three_interpolate(known_feats, idx, w)
        else:
            interp = jnp.broadcast_to(
                known_feats, unknown.shape[:2] + (known_feats.shape[-1],))
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(interp, train)


class PointNet2SSG(nn.Module):
    """The SSG encoder used by BASELINE config 1: SA(2048) -> SA(1024) ->
    SA(512) -> SA(256) + two FP layers (VoteNet backbone shape);
    ``npoints`` shrinks the pyramid for tests."""
    dtype: jnp.dtype = jnp.float32
    npoints: Sequence[int] = (2048, 1024, 512, 256)

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, train=False):
        n1, n2, n3, n4 = self.npoints
        sa1 = PointnetSAModule(n1, 0.2, 64, (64, 64, 128), dtype=self.dtype,
                               name="sa1")
        sa2 = PointnetSAModule(n2, 0.4, 32, (128, 128, 256), dtype=self.dtype,
                               name="sa2")
        sa3 = PointnetSAModule(n3, 0.8, 16, (128, 128, 256), dtype=self.dtype,
                               name="sa3")
        sa4 = PointnetSAModule(n4, 1.2, 16, (128, 128, 256), dtype=self.dtype,
                               name="sa4")
        xyz1, f1, i1 = sa1(xyz, features, valid, train)
        xyz2, f2, i2 = sa2(xyz1, f1, None, train)
        xyz3, f3, _ = sa3(xyz2, f2, None, train)
        xyz4, f4, _ = sa4(xyz3, f3, None, train)
        fp1 = PointnetFPModule((256, 256), dtype=self.dtype, name="fp1")
        fp2 = PointnetFPModule((256, 256), dtype=self.dtype, name="fp2")
        f3u = fp1(xyz3, xyz4, f3, f4, train=train)
        f2u = fp2(xyz2, xyz3, f2, f3u, train=train)
        # seed indices into the ORIGINAL cloud (VoteNet fp2_inds: compose
        # sa2's selection of sa1's selection) for GT vote lookup
        fp2_inds = jnp.take_along_axis(i1, i2, axis=1)
        return {"fp2_xyz": xyz2, "fp2_features": f2u, "fp2_inds": fp2_inds,
                "sa4_xyz": xyz4, "sa4_features": f4}
