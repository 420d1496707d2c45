"""VoteNet-style detection head (flax.linen).

Makes the detection mode reachable end to end: the reference ships the
VoteNet *losses* (``lib/loss_helper.py:25-193``), the AP evaluator
(``lib/ap_helper.py``) and the vendored VoteNet point modules
(``lib/pointnet2/pointnet2_modules.py`` PointnetSAModuleVotes) but no
in-tree detector; this module is the minimal proposal generator those
consume — PointNet++ backbone -> per-seed voting -> vote aggregation
(PointnetSAModuleVotes, normalize_xyz + seed-index passthrough) -> proposal
decode with the exact output keys ``train/detection_losses.py`` and
``eval/detection.py`` expect (seed_xyz/seed_inds/vote_xyz/
aggregated_vote_xyz/objectness_scores/center/heading_*/size_*/
sem_cls_scores).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.models.pointnet2_modules import (PointNet2SSG,
                                                      PointnetSAModuleVotes,
                                                      SharedMLP)


class VotingModule(nn.Module):
    """Per-seed vote regression: offsets for xyz and feature residuals.

    VoteNet's voting_module semantics: seed feature -> MLP ->
    (vote_factor x (3 + C)); votes = seed_xyz + offset.
    """
    vote_factor: int = 1
    seed_feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_xyz, seed_features, train: bool = False):
        B, num_seed, C = seed_features.shape
        assert C == self.seed_feature_dim
        h = SharedMLP((C, C), dtype=self.dtype, name="mlp")(
            seed_features, train)
        out = nn.Dense(self.vote_factor * (3 + C), dtype=self.dtype,
                       name="out")(h)
        out = out.reshape(B, num_seed, self.vote_factor, 3 + C)
        offset = out[..., :3]
        vote_xyz = seed_xyz[:, :, None, :] + offset
        vote_features = seed_features[:, :, None, :] + out[..., 3:]
        return (vote_xyz.reshape(B, num_seed * self.vote_factor, 3),
                vote_features.reshape(B, num_seed * self.vote_factor, C))


class ProposalModule(nn.Module):
    """Vote aggregation + box/class decode (VoteNet proposal_module):
    PointnetSAModuleVotes over votes, then a head emitting
    2 (objectness) + 3 (center offset) + 2*NH (heading) + 4*NS (size)
    + NC (semantic class) channels per proposal."""
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: np.ndarray
    num_proposal: int = 128
    sampling_radius: float = 0.3
    nsample: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vote_xyz, vote_features, train: bool = False):
        nh, ns, nc = self.num_heading_bin, self.num_size_cluster, self.num_class
        C = vote_features.shape[-1]
        agg_xyz, agg_feats, _ = PointnetSAModuleVotes(
            npoint=self.num_proposal, radius=self.sampling_radius,
            nsample=self.nsample, mlp=(128, 128, 128),
            normalize_xyz=True, dtype=self.dtype, name="vote_aggregation")(
            vote_xyz, vote_features, train=train)
        h = SharedMLP((128, 128), dtype=self.dtype, name="proposal_mlp")(
            agg_feats, train)
        net = nn.Dense(2 + 3 + nh * 2 + ns * 4 + nc, dtype=self.dtype,
                       name="proposal_out")(h).astype(jnp.float32)

        out = {"aggregated_vote_xyz": agg_xyz}
        out["objectness_scores"] = net[..., 0:2]
        out["center"] = agg_xyz + net[..., 2:5]
        o = 5
        out["heading_scores"] = net[..., o:o + nh]
        hrn = net[..., o + nh:o + 2 * nh]
        out["heading_residuals_normalized"] = hrn
        out["heading_residuals"] = hrn * (np.pi / nh)
        o += 2 * nh
        out["size_scores"] = net[..., o:o + ns]
        srn = net[..., o + ns:o + 4 * ns].reshape(net.shape[:2] + (ns, 3))
        out["size_residuals_normalized"] = srn
        out["size_residuals"] = srn * jnp.asarray(
            self.mean_size_arr, jnp.float32)[None, None]
        o += 4 * ns
        out["sem_cls_scores"] = net[..., o:o + nc]
        return out


class VoteNet(nn.Module):
    """Backbone + voting + proposals; output dict keys match
    detection_losses.get_detection_loss and eval/detection parsing."""
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: np.ndarray
    num_proposal: int = 128
    vote_factor: int = 1
    backbone_npoints: Sequence[int] = (2048, 1024, 512, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, train: bool = False):
        end = PointNet2SSG(dtype=self.dtype, npoints=self.backbone_npoints,
                           name="backbone")(xyz, features, valid, train)
        seed_xyz = end["fp2_xyz"]
        seed_features = end["fp2_features"]
        out = {"seed_xyz": seed_xyz, "seed_inds": end["fp2_inds"],
               "seed_features": seed_features}
        vote_xyz, vote_features = VotingModule(
            self.vote_factor, seed_features.shape[-1], dtype=self.dtype,
            name="vgen")(seed_xyz, seed_features, train)
        out["vote_xyz"] = vote_xyz
        out.update(ProposalModule(
            self.num_class, self.num_heading_bin, self.num_size_cluster,
            self.mean_size_arr, self.num_proposal, dtype=self.dtype,
            name="pnet")(vote_xyz, vote_features, train))
        return out
