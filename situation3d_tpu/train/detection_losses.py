"""VoteNet detection losses (detection=True mode).

jnp re-implementation of ``lib/loss_helper.py:25-193``
(``compute_vote_loss``, ``compute_objectness_loss``,
``compute_box_and_sem_cls_loss``) with identical masking/normalization
conventions. These are zeros in the default SQA3D configuration
(``loss_helper.py:265-274``) but are first-class for detection configs.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from situation3d_tpu.ops.nn_distance import huber_loss, nn_distance

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def _take(x, idx):
    return jnp.take_along_axis(x, idx, axis=1)


def compute_vote_loss(dd: Dict[str, Any]) -> jnp.ndarray:
    B, num_seed, _ = dd["seed_xyz"].shape
    vote_xyz = dd["vote_xyz"]
    seed_inds = dd["seed_inds"].astype(jnp.int32)

    gt_mask = _take(dd["vote_label_mask"], seed_inds).astype(jnp.float32)
    inds9 = jnp.repeat(seed_inds[..., None], 3 * GT_VOTE_FACTOR, axis=-1)
    gt_votes = _take(dd["vote_label"], inds9)
    gt_votes = gt_votes + jnp.tile(dd["seed_xyz"], (1, 1, GT_VOTE_FACTOR))

    vr = vote_xyz.reshape(B * num_seed, -1, 3)
    gr = gt_votes.reshape(B * num_seed, GT_VOTE_FACTOR, 3)
    _, _, dist2, _ = nn_distance(vr, gr, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(B, num_seed)
    return jnp.sum(votes_dist * gt_mask) / (jnp.sum(gt_mask) + 1e-6)


def compute_objectness_loss(dd: Dict[str, Any]):
    agg = dd["aggregated_vote_xyz"]
    gt_center = dd["center_label"][:, :, :3]
    dist1, ind1, _, _ = nn_distance(agg, gt_center)
    e1 = jnp.sqrt(dist1 + 1e-6)
    label = (e1 < NEAR_THRESHOLD).astype(jnp.int32)
    mask = ((e1 < NEAR_THRESHOLD) | (e1 > FAR_THRESHOLD)).astype(jnp.float32)

    scores = dd["objectness_scores"]  # [B, K, 2]
    w = jnp.asarray(OBJECTNESS_CLS_WEIGHTS)
    per = optax.softmax_cross_entropy_with_integer_labels(
        scores.astype(jnp.float32), label) * w[label]
    loss = jnp.sum(per * mask) / (jnp.sum(mask) + 1e-6)
    return loss, label, mask, ind1


def compute_box_and_sem_cls_loss(dd: Dict[str, Any], config) -> Tuple:
    assign = dd["object_assignment"].astype(jnp.int32)
    obj = dd["objectness_label"].astype(jnp.float32)
    n_obj = jnp.sum(obj) + 1e-6

    pred_center = dd["center"]
    gt_center = dd["center_label"][:, :, :3]
    dist1, _, dist2, _ = nn_distance(pred_center, gt_center)
    box_mask = dd["box_label_mask"].astype(jnp.float32)
    center_loss = (jnp.sum(dist1 * obj) / n_obj
                   + jnp.sum(dist2 * box_mask) / (jnp.sum(box_mask) + 1e-6))

    def masked_ce(scores, labels):
        per = optax.softmax_cross_entropy_with_integer_labels(
            scores.astype(jnp.float32), labels)
        return jnp.sum(per * obj) / n_obj

    h_lbl = _take(dd["heading_class_label"].astype(jnp.int32), assign)
    heading_cls_loss = masked_ce(dd["heading_scores"], h_lbl)
    h_res_lbl = _take(dd["heading_residual_label"], assign) / (
        np.pi / config.num_heading_bin)
    h_onehot = jax.nn.one_hot(h_lbl, config.num_heading_bin)
    h_res = jnp.sum(dd["heading_residuals_normalized"] * h_onehot, -1)
    heading_reg_loss = jnp.sum(huber_loss(h_res - h_res_lbl) * obj) / n_obj

    s_lbl = _take(dd["size_class_label"].astype(jnp.int32), assign)
    size_cls_loss = masked_ce(dd["size_scores"], s_lbl)
    s_res_lbl = _take(dd["size_residual_label"],
                      jnp.repeat(assign[..., None], 3, -1))
    s_onehot = jax.nn.one_hot(s_lbl, config.num_size_cluster)[..., None]
    pred_res = jnp.sum(dd["size_residuals_normalized"] * s_onehot, 2)
    mean_size = jnp.sum(
        s_onehot * jnp.asarray(config.mean_size_arr, jnp.float32)[None, None], 2)
    s_res_norm = s_res_lbl / mean_size
    size_reg_loss = jnp.sum(
        jnp.mean(huber_loss(pred_res - s_res_norm), -1) * obj) / n_obj

    sem_lbl = _take(dd["sem_cls_label"].astype(jnp.int32), assign)
    sem_cls_loss = masked_ce(dd["sem_cls_scores"], sem_lbl)
    return (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
            size_reg_loss, sem_cls_loss)


def get_detection_loss(dd: Dict[str, Any], config
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Composite detection loss (loss_helper.py get_loss detection branch):
    vote + 0.5*objectness + box(center + 0.1*hcls + hreg + 0.1*scls + sreg)
    + 0.1*sem_cls."""
    vote_loss = compute_vote_loss(dd)
    obj_loss, obj_label, obj_mask, assign = compute_objectness_loss(dd)
    dd = dict(dd, objectness_label=obj_label, objectness_mask=obj_mask,
              object_assignment=assign)
    c, hc, hr, sc, sr, sem = compute_box_and_sem_cls_loss(dd, config)
    box_loss = c + 0.1 * hc + hr + 0.1 * sc + sr
    total = vote_loss + 0.5 * obj_loss + box_loss + 0.1 * sem
    return total, {
        "vote_loss": vote_loss, "objectness_loss": obj_loss,
        "center_loss": c, "heading_cls_loss": hc, "heading_reg_loss": hr,
        "size_cls_loss": sc, "size_reg_loss": sr, "sem_cls_loss": sem,
        "box_loss": box_loss,
    }
