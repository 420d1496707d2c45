"""Language encoders for SIG3D.

TPU-native re-implementation of ``situation3d/models/sep_lang_module_bert.py``
(LangModule): either an MPNet-style transformer (the reference loads HF
``sentence-transformers/all-mpnet-base-v2`` via AutoModel and finetunes only
the last layer, ``sep_lang_module_bert.py:25-45``) or a GloVe+LSTM encoder
(``:48-56``). Situation ``s`` and question ``q`` are encoded separately with
shared weights; outputs are ``[B, L, H]`` plus pad masks (True == padding,
``sep_lang_module_bert.py:84-85``).

Freezing ("last_layer" mode) is handled by the optimizer partition in
``train/optim.py`` rather than requires_grad flags.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from situation3d_tpu.config import LangConfig
from situation3d_tpu.models.relpos import (
    relative_position_bucket,
    relative_position_matrix,
)


class MPNetSelfAttention(nn.Module):
    cfg: LangConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_mask, position_bias, deterministic=True):
        cfg = self.cfg
        B, L, H = hidden.shape
        h = cfg.num_heads
        d = cfg.hidden_size // h

        def proj(name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(
                hidden).reshape(B, L, h, d).transpose(0, 2, 1, 3)

        q, k, v = proj("q"), proj("k"), proj("v")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d, q.dtype))
        scores = scores + position_bias.astype(scores.dtype)
        scores = jnp.where(attn_mask[:, None, None, :], -1e9, scores)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="o")(out)


class MPNetLayer(nn.Module):
    cfg: LangConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_mask, position_bias, deterministic=True):
        cfg = self.cfg
        a = MPNetSelfAttention(cfg, self.dtype, name="attention")(
            hidden, attn_mask, position_bias, deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="attention_norm")(hidden + a)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(hidden + out)


class MPNetEncoder(nn.Module):
    """MPNet: BERT body + shared T5-style relative position bias.

    Mirrors HF MPNetModel (the weights ``ckpt_compat/lang.py`` imports):
    padding-aware position ids (RoBERTa convention, pad_token_id=1),
    per-encoder relative_attention_bias shared across the 12 layers.
    """
    cfg: LangConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        cfg = self.cfg
        B, L = input_ids.shape
        am = attention_mask.astype(jnp.int32)
        # position ids: cumsum over non-pad, offset by padding_idx
        position_ids = jnp.cumsum(am, axis=1) * am + cfg.pad_token_id

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(position_ids)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="emb_norm")(word + pos)

        # shared relative position bias [1, heads, L, L]
        rp = relative_position_matrix(L, L)
        buckets = relative_position_bucket(
            rp, True, cfg.relative_attention_num_buckets, 128)
        bias = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                        dtype=jnp.float32, name="relative_attention_bias")(buckets)
        position_bias = bias.transpose(2, 0, 1)[None]

        pad_mask = attention_mask == 0
        for i in range(cfg.num_layers):
            hidden = MPNetLayer(cfg, self.dtype, name=f"layer{i}")(
                hidden, pad_mask, position_bias, deterministic)
        return hidden


class LSTMLangEncoder(nn.Module):
    """GloVe+LSTM variant (sep_lang_module_bert.py:48-56, use_bert=False)."""
    hidden_size: int = 768
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embs, lengths, deterministic=True):
        embs = nn.Dropout(self.pdrop)(embs, deterministic=deterministic)
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name="lstm")
        return lstm(embs, seq_lengths=lengths)


class GloveLSTMEncoder(nn.Module):
    """Token ids -> per-position LSTM states (``use_bert=False`` path).

    The reference looks tokens up in a pretrained GloVe table
    (``sepdataset.py`` glove embedding branch); offline we fall back to a
    trainable embedding table of the same width, which ``ckpt_compat`` can
    overwrite with real GloVe rows when the vectors file is available.
    """
    cfg: LangConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids, attention_mask, deterministic=True):
        emb = nn.Embed(self.cfg.vocab_size, self.cfg.glove_dim,
                       dtype=self.dtype, name="word_embeddings")(ids)
        lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
        out = LSTMLangEncoder(self.cfg.hidden_size, dtype=self.dtype,
                              name="lstm_encoder")(
            emb, lengths, deterministic=deterministic)
        return out * attention_mask[..., None].astype(out.dtype)


class LangModule(nn.Module):
    """Encodes situation and question separately with shared weights.

    ``model`` selects the encoder: "mpnet" (the HF BERT path,
    sep_lang_module_bert.py use_bert=True) or "lstm" (GloVe+LSTM,
    ``:48-56``). Returns (s_out, q_out, s_pad_mask, q_pad_mask); pad masks
    True at pad positions (matching ``~attention_mask`` at
    sep_lang_module_bert.py:84-85).
    """
    cfg: LangConfig
    dtype: jnp.dtype = jnp.float32
    model: str = "mpnet"

    @nn.compact
    def __call__(self, s_ids, s_mask, q_ids, q_mask, deterministic=True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if self.model == "lstm":
            enc = GloveLSTMEncoder(self.cfg, self.dtype, name="encoder")
        elif self.model == "mpnet":
            enc = MPNetEncoder(self.cfg, self.dtype, name="encoder")
        else:
            raise ValueError(f"unknown lang_model {self.model!r}")
        s_out = enc(s_ids, s_mask, deterministic)
        q_out = enc(q_ids, q_mask, deterministic)
        return s_out, q_out, s_mask == 0, q_mask == 0
