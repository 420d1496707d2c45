"""SIG3D — situated 3D question answering model (flax.linen).

TPU-native re-implementation of ``situation3d/models/sqa_module.py`` (SIG3D):
language encoder -> sparse 3D encoder (MinkUNet18A bottleneck) -> situated
token pooling -> MCAN SA/SGA fusion -> situation heads + AttFlat -> answer
classifier.

Key TPU redesign — situated token pooling (``sqa_module.py:292-321`` is a
per-sample Python loop over ``decomposed_coordinates_and_features`` with
``torch.unique`` + ``scatter_reduce_``): here it is a fully jittable
fixed-shape pipeline — 2D key dedup (sort-based), masked segment-mean
z-collapse, and random sample/pad to ``num_scene_tokens`` tokens, vmapped
over the batch. Meter-scale positions ``(xy + stride/2) * voxel_size`` and
the Gaussian location-gt weights (sigma=0.16, ``sqa_module.py:328-338``)
match the reference.

Situation heads (``sqa_module.py:192-270``): regression tags
(``__l2__quat__`` default, train.py:34) use ``aux_reg(cat(s_flat,
scene_flat))`` -> 3+rot dims; ``__class__`` tags use a per-token ``aux_cls``
-> [B, N, 1+rot] whose channel 0 is a position logit over tokens (CE against
the Gaussian weights, ``loss_helper.py:195-201``). (The reference forward
applies aux_cls to the flattened vector, which mismatches its own loss
indexing ``aux_scores[:, :, 0]``; we implement the per-token form the loss
expects.) Per-token ``position_head``/``rotation_head`` are kept
(computed-but-unused by the loss, as in ``sqa_module.py:358-361``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from situation3d_tpu.config import Config
from situation3d_tpu.models.lang import LangModule
from situation3d_tpu.models.mcan import SA, SGA, AttFlat
from situation3d_tpu.ops.voxelize import voxelize_jax
from situation3d_tpu.sparse.minkunet import MinkUNet, build_unet_plan
from situation3d_tpu.sparse.tensor import SparseVoxels
from situation3d_tpu.utils.registry import registry

ROT_DIMS = {"__quat__": 4, "__angle__": 2, "__6d__": 6}


def rotation_dim(tag: str) -> int:
    for k, v in ROT_DIMS.items():
        if k in tag:
            return v
    raise ValueError(f"situation_loss_tag {tag!r} has no rotation representation")


def situated_token_pool(
    coords: jnp.ndarray,
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    num_tokens: int,
    voxel_size: float,
    rng: jnp.ndarray,
):
    """Collapse z, segment-mean features per unique (x, y), sample N tokens.

    Per-sample (vmap over batch). Args: coords int32 [V,3] raw units,
    feats [V,C], mask [V]. Returns (tok_feats [N,C], positions [N,2] meters).
    """
    V, C = feats.shape
    xy = coords // stride
    xy3 = xy.at[:, 2].set(0)  # collapse z before dedup
    uc, um, inv, nu = voxelize_jax(xy3, mask, capacity=V)
    mf = mask.astype(feats.dtype)
    sums = jnp.zeros((V, C), jnp.float32).at[inv].add(
        feats.astype(jnp.float32) * mf[:, None])
    counts = jnp.zeros((V,), jnp.float32).at[inv].add(mf)
    mean = sums / jnp.maximum(counts, 1.0)[:, None]

    # random sample without replacement among the nu valid uniques, pad with
    # random duplicates when nu < num_tokens (sqa_module.py:303-308)
    r1, r2 = jax.random.split(rng)
    sort_key = jnp.where(um, jax.random.uniform(r1, (V,)), 2.0)
    perm = jnp.argsort(sort_key)
    safe_nu = jnp.maximum(nu, 1)
    dup = jax.random.randint(r2, (num_tokens,), 0, jnp.iinfo(jnp.int32).max) % safe_nu
    slot = jnp.arange(num_tokens)
    token_idx = jnp.where(slot < safe_nu, perm[slot % V], perm[dup])
    tok_feats = mean[token_idx].astype(feats.dtype)
    tok_xy = uc[token_idx, :2] * stride
    positions = (tok_xy.astype(jnp.float32) + stride / 2.0) * voxel_size
    return tok_feats, positions


@registry.register_model("sig3d")
class SIG3D(nn.Module):
    """Full SIG3D model. ``__call__`` takes a fixed-shape batch dict:

      s_ids, s_mask, q_ids, q_mask: int32 [B, L] tokenized situation/question
      voxel_coords int32 [B, V, 3], voxel_feats [B, V, 3], voxel_mask [B, V]
      auxiliary_task float32 [B, 3+rot]: GT situation vector

    plus a ``sample`` PRNG (token sampling) and ``dropout`` PRNG in training.
    Returns the prediction dict (answer_scores, aux_scores, ...).
    """
    cfg: Config
    num_answers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 bn_momentum: Optional[float] = None) -> Dict[str, Any]:
        cfg = self.cfg
        mc = cfg.model
        det = not train
        H = mc.hidden_size
        tag = mc.situation_loss_tag
        rot = rotation_dim(tag)
        out: Dict[str, Any] = {}

        # ---- language branch --------------------------------------------
        s_out, q_out, s_pad, q_pad = LangModule(
            cfg.lang, self.dtype, model=mc.lang_model, name="lang_net")(
            batch["s_ids"], batch["s_mask"], batch["q_ids"], batch["q_mask"], det)

        # ---- vision branch ----------------------------------------------
        have_tokens = False
        if "scene_tokens" in batch:
            # multi-question serving: the scene tower (plan + MinkUNet +
            # situated pooling — the expensive, gather-bound half) ran once
            # per scene; this pass reuses its pooled tokens. The reference
            # eval loop recomputes the full tower per question
            # (eval.py:287-290, batch=1) — scene reuse is a framework-level
            # serving capability. See eval/serving.py.
            tok_feats = batch["scene_tokens"].astype(self.dtype)
            positions = batch["scene_token_positions"]
            out["scene_positions"] = positions
            out["att_feat_pre"] = tok_feats
            have_tokens = True
        elif not mc.no_3d:
            x = SparseVoxels(coords=batch["voxel_coords"],
                             feats=batch["voxel_feats"].astype(self.dtype),
                             mask=batch["voxel_mask"], stride=1)
            # precomputed host plan (sparse/host_plan.py) if the pipeline
            # provides one; otherwise build on device
            plan = batch.get("plan") or build_unet_plan(
                x.coords, x.mask, cfg.sparse.capacities,
                cfg.sparse.dense_lookup, cfg.sparse.grid_extent,
                need_k5=not (cfg.sparse.conv0_zwin and cfg.sparse.dense_lookup),
                dense_downsample=cfg.sparse.dense_downsample,
                pallas_map=cfg.sparse.pallas_map,
                pallas_map_bits=cfg.sparse.pallas_map_bits)
            if "overflow" in plan:
                # capacity/extent overflow counters (visible in train logs;
                # graceful, *reported* degradation)
                for k, v in plan["overflow"].items():
                    out[f"overflow/{k}"] = jnp.sum(v)
            enc_out = MinkUNet(cfg.sparse, final_result=cfg.sparse.final_result,
                               dtype=self.dtype,
                               name="scene_encoder")(x, plan, train=False,
                                                     momentum=bn_momentum)
            if "openscene_out" in enc_out:
                # per-voxel CLIP-space features for segmentation eval
                # (eval.py:293-297: openscene_out @ text_features.T)
                out["openscene_out"] = enc_out["openscene_out"].feats
            bott = enc_out["feat_bottleneck"]
            rng = self.make_rng("sample")
            keys = jax.random.split(rng, bott.batch_size)
            tok_feats, positions = jax.vmap(
                lambda c, f, m, k: situated_token_pool(
                    c, f, m, bott.stride, mc.num_scene_tokens,
                    cfg.data.voxel_size, k)
            )(bott.coords, bott.feats, bott.mask, keys)
            out["scene_positions"] = positions
            out["att_feat_pre"] = tok_feats
            have_tokens = True

        if have_tokens:
            pe_positions = positions
            if mc.situated_reencode:
                # situated re-encoding: express token positions in the
                # agent's frame (translate to the GT situation position and
                # rotate by the inverse z-heading) before the positional
                # embedding, so fusion sees an egocentric layout. GT pose is
                # used at train time like the Gaussian loc targets; at
                # inference callers may substitute a predicted pose.
                gt = batch["auxiliary_task"]
                rel = positions - gt[:, None, :2]
                if "__quat__" in tag:
                    qz, qw = gt[:, 5], gt[:, 6]
                    yaw = 2.0 * jnp.arctan2(qz, jnp.maximum(jnp.abs(qw), 1e-8)) \
                        * jnp.sign(qw + (qw == 0))
                elif "__angle__" in tag:
                    yaw = jnp.arctan2(gt[:, 3], gt[:, 4])
                else:  # __6d__: first rotation-matrix row is [cos, -sin, *]
                    yaw = jnp.arctan2(-gt[:, 4], gt[:, 3])
                c, s = jnp.cos(-yaw)[:, None], jnp.sin(-yaw)[:, None]
                pe_positions = jnp.stack(
                    [rel[..., 0] * c - rel[..., 1] * s,
                     rel[..., 0] * s + rel[..., 1] * c], axis=-1)

            # situational position embedding of the 2D coords
            pe = nn.Dense(128, dtype=self.dtype, name="pos_embed_fc1")(
                pe_positions.astype(self.dtype))
            pe = nn.gelu(pe, approximate=False)
            pe = nn.Dense(mc.scene_feat_dim, dtype=self.dtype, name="pos_embed_fc2")(pe)
            scene_feat = tok_feats + pe

            # Gaussian location-gt weights (sigma from config)
            gt_xy = batch["auxiliary_task"][:, None, :2]
            dist = jnp.linalg.norm(positions - gt_xy, axis=-1)
            w = jnp.exp(-dist ** 2 / (2 * mc.pos_sigma ** 2))
            out["auxiliary_task_loc_gt"] = w / jnp.maximum(
                jnp.sum(w, axis=1, keepdims=True), 1e-12)

        # ---- projections ------------------------------------------------
        lang_feat_linear = nn.Dense(H, dtype=self.dtype, name="lang_feat_linear")
        s_feat = nn.gelu(lang_feat_linear(s_out), approximate=False)
        q_feat = nn.gelu(lang_feat_linear(q_out), approximate=False)
        if have_tokens:
            scene_feat = nn.Dense(H, dtype=self.dtype, name="scene_feat_linear")(scene_feat)
            scene_feat = nn.gelu(scene_feat, approximate=False)

        # ---- MCAN fusion ------------------------------------------------
        for i in range(mc.mcan_num_layers):
            s_feat = SA(H, mc.mcan_num_heads, mc.mcan_dropout, self.dtype,
                        name=f"enc_s{i}")(s_feat, s_pad, det)
        for i in range(mc.mcan_num_layers):
            q_feat = SA(H, mc.mcan_num_heads, mc.mcan_dropout, self.dtype,
                        name=f"enc_q{i}")(q_feat, q_pad, det)
        if have_tokens:
            for i in range(mc.mcan_num_layers):
                scene_feat = SGA(H, mc.mcan_num_heads, mc.mcan_dropout, self.dtype,
                                 name=f"dec_s{i}")(scene_feat, s_feat, None, s_pad, det)
            for i in range(mc.mcan_num_layers):
                scene_feat = SGA(H, mc.mcan_num_heads, mc.mcan_dropout, self.dtype,
                                 name=f"dec_q{i}")(scene_feat, q_feat, None, q_pad, det)
            out["att_feat_ori"] = scene_feat

            if mc.predict_situation:
                # per-token situation heads (computed but unused by the loss,
                # kept for parity: sqa_module.py:358-361); predict_situation
                # (CONF.TRAIN.PREDICT_SITUATION, lib/config.py:56) gates them
                ph = nn.Dense(256, dtype=self.dtype, name="position_head_fc1")(scene_feat)
                ph = nn.gelu(ph, approximate=False)
                ph = nn.Dropout(0.1)(ph, deterministic=det)
                out["pred_pos_likelihood"] = nn.sigmoid(
                    nn.Dense(1, dtype=self.dtype, name="position_head_fc2")(ph)).squeeze(-1)
                rh = nn.Dense(256, dtype=self.dtype, name="rotation_head_fc1")(scene_feat)
                rh = nn.gelu(rh, approximate=False)
                rh = nn.Dropout(0.1)(rh, deterministic=det)
                out["pred_rotation"] = nn.Dense(
                    6, dtype=self.dtype, name="rotation_head_fc2")(rh)

        # ---- flatten + heads --------------------------------------------
        flat = dict(flat_mlp_size=mc.mcan_flat_mlp_size,
                    flat_glimpses=mc.mcan_flat_glimpses,
                    flat_out_size=mc.mcan_flat_out_size, dtype=self.dtype)
        s_flat, out["satt"] = AttFlat(**flat, name="attflat_s")(s_feat, s_pad, det)
        q_flat, out["qatt"] = AttFlat(**flat, name="attflat_q")(q_feat, q_pad, det)
        if have_tokens:
            v_flat, out["oatt"] = AttFlat(**flat, name="attflat_visual")(
                scene_feat, None, det)
            fuse = jnp.concatenate([s_flat, q_flat, v_flat], axis=1)
        else:
            fuse = jnp.concatenate([s_flat, q_flat], axis=1)

        def head(x, mid, outd, pdrop, name):
            x = nn.Dense(mid, dtype=self.dtype, name=f"{name}_fc1")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dropout(pdrop)(x, deterministic=det)
            return nn.Dense(outd, dtype=self.dtype, name=f"{name}_fc2")(x)

        if mc.use_situation and have_tokens:
            if "__class__" in tag:
                out["aux_scores"] = head(scene_feat, H, 1 + rot, 0.1, "aux_cls")
            else:
                out["aux_scores"] = head(
                    jnp.concatenate([s_flat, v_flat], axis=1), H, 3 + rot, 0.1,
                    "aux_reg")

        out["answer_scores"] = head(fuse, H, self.num_answers,
                                    mc.answer_pdrop, "answer_cls").astype(jnp.float32)
        return out
