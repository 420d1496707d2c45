"""BLIP-2 stage-1 pretraining losses (ITC / ITM / LM).

Re-implements the loss structure of ``lavis/models/blip2_models/
blip2_qformer.py:30-461`` (Blip2Qformer) in mesh terms: the image-text
contrastive loss uses in-batch plus CROSS-DEVICE negatives — the reference's
``concat_all_gather`` over NCCL becomes ``jax.lax.all_gather`` over the
``data`` axis inside ``shard_map``/pjit. Pure functions so any encoder pair
(e.g. Q-Former query features vs text features) can feed them.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def itc_loss(
    image_feats: jnp.ndarray,
    text_feats: jnp.ndarray,
    temperature: jnp.ndarray,
    axis: Optional[str] = None,
) -> jnp.ndarray:
    """Image-text contrastive loss with cross-device negatives.

    image_feats [B, Q, D] (per-query features, max-sim over queries like
    blip2_qformer.py:120-135) or [B, D]; text_feats [B, D].
    ``axis``: mesh axis name to gather negatives over (None = in-batch only).
    """
    if image_feats.ndim == 2:
        image_feats = image_feats[:, None, :]
    image_feats = _normalize(image_feats)
    text_feats = _normalize(text_feats)
    B = text_feats.shape[0]

    if axis is not None:
        all_image = jax.lax.all_gather(image_feats, axis, tiled=True)
        all_text = jax.lax.all_gather(text_feats, axis, tiled=True)
        rank = jax.lax.axis_index(axis)
        offset = rank * B
    else:
        all_image, all_text, offset = image_feats, text_feats, 0

    # sim_i2t[b, j] = max_q <image_b_q, text_j>
    sim_i2t = jnp.max(jnp.einsum("bqd,jd->bqj", image_feats, all_text), axis=1)
    # sim_t2i[b, j] = max_q <text_b, image_j_q>
    sim_t2i = jnp.max(jnp.einsum("bd,jqd->bjq", text_feats, all_image), axis=2)
    sim_i2t = sim_i2t / temperature
    sim_t2i = sim_t2i / temperature

    targets = jnp.arange(B) + offset
    loss = (optax.softmax_cross_entropy_with_integer_labels(sim_i2t, targets)
            + optax.softmax_cross_entropy_with_integer_labels(sim_t2i, targets))
    return jnp.mean(loss) / 2


def itm_loss(match_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Image-text matching head CE (blip2_qformer.py:230-288)."""
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            match_logits.astype(jnp.float32), labels))


def lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
            mask: jnp.ndarray) -> jnp.ndarray:
    """Caption LM loss (blip2_qformer.py:290-320): token-mean CE."""
    per = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), jnp.maximum(labels, 0))
    m = mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
