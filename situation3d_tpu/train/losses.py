"""SIG3D loss composition.

Pure-function re-implementation of ``lib/loss_helper.py`` (``get_loss:230``,
``compute_aux_situation_loss:195``, ``compute_answer_classification_loss:213``)
over jnp arrays. The VoteNet detection losses are zeros unless detection mode
is on, matching the reference default (``loss_helper.py:265-274``, detection
defaults to False). The final weighted sum keeps the reference's x10
amplification (``loss_helper.py:300``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import optax

from situation3d_tpu.config import LossConfig


def answer_classification_loss(
    answer_scores: jnp.ndarray,
    answer_cat_scores: jnp.ndarray = None,
    answer_cat: jnp.ndarray = None,
    kind: str = "bce",
) -> jnp.ndarray:
    """BCE-with-logits summed over classes / batch (multi-answer) or CE on
    the argmax answer — the reference picks by which target is in
    ``data_dict`` (loss_helper.py:213-227); here ``cfg.loss.answer_loss``
    selects explicitly."""
    if kind == "bce" and answer_cat_scores is not None:
        per = optax.sigmoid_binary_cross_entropy(
            answer_scores, answer_cat_scores)
        return jnp.sum(per) / answer_scores.shape[0]
    if answer_cat is None:
        raise ValueError(
            f"answer_loss={kind!r} needs 'answer_cat' in the batch "
            "(keep it in clean_batch) or answer_cat_scores for 'bce'")
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(answer_scores, answer_cat))


def aux_situation_loss(
    out: Dict[str, Any],
    batch: Dict[str, Any],
    tag: str,
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Position + rotation situation loss (loss_helper.py:195-210)."""
    aux = out["aux_scores"].astype(jnp.float32)
    gt = batch["auxiliary_task"].astype(jnp.float32)
    if "__class__" in tag:
        # per-token: channel 0 = position logits over tokens (CE against the
        # Gaussian weights), channels 1: = per-token rotation regression
        logits = aux[:, :, 0]
        soft = out["auxiliary_task_loc_gt"]
        loss_pos = jnp.mean(optax.softmax_cross_entropy(logits, soft))
        rot_gt = gt[:, None, 3:]
        diff_fn = jnp.square if "__l2__" in tag else jnp.abs
        loss_rot = jnp.mean(diff_fn(aux[:, :, 1:] - rot_gt))
    else:
        diff_fn = jnp.square if "__l2__" in tag else jnp.abs
        loss_pos = jnp.mean(diff_fn(aux[:, :3] - gt[:, :3]))
        loss_rot = jnp.mean(diff_fn(aux[:, 3:] - gt[:, 3:]))
    loss_aux = cfg.pos_weight * loss_pos + cfg.rot_weight * loss_rot
    return loss_aux, loss_pos, loss_rot


def get_loss(
    out: Dict[str, Any],
    batch: Dict[str, Any],
    cfg: LossConfig,
    tag: str,
    use_aux_situation: bool = True,
    use_answer: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted total loss + per-term dict (keys match the reference's
    wandb metric names, lib/solver.py:141-146)."""
    zero = jnp.zeros(())
    terms = {
        "vote_loss": zero, "objectness_loss": zero,
        "box_loss": zero, "sem_cls_loss": zero,
    }
    if use_aux_situation and "aux_scores" in out:
        loss_aux, loss_pos, loss_rot = aux_situation_loss(out, batch, tag, cfg)
    else:
        loss_aux = loss_pos = loss_rot = zero
    terms.update(aux_loss=loss_aux, pos_loss=loss_pos, rot_loss=loss_rot)

    if use_answer:
        terms["answer_loss"] = answer_classification_loss(
            out["answer_scores"],
            batch.get("answer_cat_scores"),
            batch.get("answer_cat"),
            cfg.answer_loss,
        )
    else:
        terms["answer_loss"] = zero

    total = (
        cfg.vote_weight * terms["vote_loss"]
        + cfg.objectness_weight * terms["objectness_loss"]
        + cfg.box_weight * terms["box_loss"]
        + cfg.sem_cls_weight * terms["sem_cls_loss"]
        + cfg.aux_situation_weight * terms["aux_loss"]
        + cfg.answer_weight * terms["answer_loss"]
    ) * cfg.amplifier
    terms["loss"] = total
    return total, terms
