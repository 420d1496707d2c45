"""Blip2T5 — the 3D-LLM generative QA model (flax.linen).

Re-implementation of ``3DLLM_BLIP2-base/lavis/models/blip2_models/blip2_t5.py``
(Blip2T5): precomputed 3D scene features (N, 1408) + 0.01x sinusoidal voxel
positional encoding -> Q-Former (32 query tokens, cross-attention into the
scene) -> linear ``t5_proj`` to 2048 -> FlanT5-XL encoder with
``inputs_embeds = [query ; prompt tokens]`` -> CE on answer tokens
(training) or greedy decode (``predict_answers``; the reference forces
``num_beams=1`` at ``blip2_t5.py:320``).

TPU redesign of the training path: the reference replicates each sample by
``n_answers`` with a host-side Python loop (``blip2_t5.py:156-165``) — here
replication happens in the data pipeline at fixed batch size, so the model
sees static shapes. The per-sample positional-embedding loop
(``blip2_t5.py:106-118``) becomes one batched table lookup.

Freezing (T5 frozen except input/output embeddings, ``blip2_t5.py:84-89``)
is expressed through optimizer masks (train/optim.py frozen_prefixes), not
parameter flags.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.config import Blip2Config
from situation3d_tpu.utils.registry import registry
from situation3d_tpu.models.positional import (
    voxel_position_embedding,
    voxel_position_table,
)
from situation3d_tpu.models.qformer import QFormer
from situation3d_tpu.models.t5 import (
    T5ForConditionalGeneration,
    greedy_decode,
    shift_right,
    t5_cross_entropy,
)


@registry.register_model("blip2_t5")
class Blip2T5(nn.Module):
    cfg: Blip2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.qformer = QFormer(cfg.qformer, self.dtype, name="qformer")
        self.t5 = T5ForConditionalGeneration(cfg.t5, self.dtype, name="t5")
        self.t5_proj = nn.Dense(cfg.t5.d_model, dtype=self.dtype, name="t5_proj")
        self._pos_table = jnp.asarray(
            voxel_position_table(cfg.pc_feat_dim // 3))

    def encode_scene(self, pc_feat, pc, pc_mask):
        """Scene features + positional encoding -> 32 query embeddings in
        T5 space ([B, 32, d_model])."""
        cfg = self.cfg
        pos = voxel_position_embedding(pc, cfg.pc_feat_dim, self._pos_table)
        pc_embeds = pc_feat.astype(self.dtype) + cfg.pos_scale * pos.astype(self.dtype)
        query_out = self.qformer(pc_embeds, pc_mask)
        return self.t5_proj(query_out)

    def _encoder_inputs(self, query_t5, input_ids, input_mask):
        tok = self.t5.embed(input_ids)
        inputs_embeds = jnp.concatenate([query_t5, tok], axis=1)
        q_atts = jnp.ones(query_t5.shape[:2], input_mask.dtype)
        enc_mask = jnp.concatenate([q_atts, input_mask], axis=1)
        return inputs_embeds, enc_mask

    def __call__(self, batch: Dict[str, Any], train: bool = False):
        """Training forward -> {"loss", "logits"}.

        batch: pc_feat [B,N,1408], pc int [B,N,3], pc_mask [B,N],
        input_ids/input_mask [B,Lt] prompt tokens,
        labels [B,La] answer tokens (pad = -100), label_mask [B,La].
        """
        cfg = self.cfg
        query_t5 = self.encode_scene(batch["pc_feat"], batch["pc"],
                                     batch["pc_mask"])
        inputs_embeds, enc_mask = self._encoder_inputs(
            query_t5, batch["input_ids"], batch["input_mask"])
        labels = batch["labels"]
        dec_in = shift_right(labels, cfg.t5.decoder_start_token_id,
                             cfg.t5.pad_token_id)
        logits = self.t5(inputs_embeds, enc_mask, dec_in, batch["label_mask"])
        loss = t5_cross_entropy(logits, labels, batch["label_mask"])
        return {"loss": loss, "logits": logits}


def predict_answers(model: Blip2T5, variables, batch,
                    max_len: Optional[int] = None) -> jnp.ndarray:
    """Greedy generation (predict_answers parity, beam=1). Returns int32
    [B, max_len] token ids."""
    cfg = model.cfg

    def _prep(batch):
        query_t5 = model.apply(
            variables, batch["pc_feat"], batch["pc"], batch["pc_mask"],
            method=Blip2T5.encode_scene)
        return model.apply(
            variables, query_t5, batch["input_ids"], batch["input_mask"],
            method=Blip2T5._encoder_inputs)

    inputs_embeds, enc_mask = _prep(batch)
    t5_vars = {"params": variables["params"]["t5"]}
    t5 = T5ForConditionalGeneration(cfg.t5, model.dtype)
    return greedy_decode(
        t5, t5_vars, inputs_embeds, enc_mask,
        max_len or cfg.t5.max_answer_len,
        cfg.t5.decoder_start_token_id, cfg.t5.eos_token_id, cfg.t5.pad_token_id)


def generate(model: Blip2T5, variables, batch,
             use_nucleus_sampling: bool = False, num_beams: int = 5,
             max_length: int = 30, min_length: int = 1, top_p: float = 0.9,
             repetition_penalty: float = 1.0, length_penalty: float = 1.0,
             temperature: float = 1.0, rng=None) -> jnp.ndarray:
    """``Blip2T5.generate`` parity (``blip2_t5.py:186-263``): beam search
    (num_beams=5, length_penalty=1.0 defaults) or nucleus sampling
    (``use_nucleus_sampling`` -> top_p/temperature/repetition_penalty).
    ``num_beams=1`` without sampling falls back to the greedy decoder.
    Returns int32 [B, max_length] token ids."""
    from situation3d_tpu.models.t5 import beam_search_decode, sample_decode
    cfg = model.cfg
    if not use_nucleus_sampling and num_beams == 1:
        return predict_answers(model, variables, batch, max_length)

    query_t5 = model.apply(
        variables, batch["pc_feat"], batch["pc"], batch["pc_mask"],
        method=Blip2T5.encode_scene)
    inputs_embeds, enc_mask = model.apply(
        variables, query_t5, batch["input_ids"], batch["input_mask"],
        method=Blip2T5._encoder_inputs)
    t5_vars = {"params": variables["params"]["t5"]}
    t5 = T5ForConditionalGeneration(cfg.t5, model.dtype)
    if use_nucleus_sampling:
        return sample_decode(
            t5, t5_vars, inputs_embeds, enc_mask, max_length,
            cfg.t5.decoder_start_token_id, cfg.t5.eos_token_id,
            cfg.t5.pad_token_id,
            rng if rng is not None else jax.random.PRNGKey(0),
            top_p=top_p, temperature=temperature, min_length=min_length,
            repetition_penalty=repetition_penalty)
    return beam_search_decode(
        t5, t5_vars, inputs_embeds, enc_mask, max_length,
        cfg.t5.decoder_start_token_id, cfg.t5.eos_token_id,
        cfg.t5.pad_token_id, num_beams=num_beams,
        length_penalty=length_penalty, min_length=min_length)
