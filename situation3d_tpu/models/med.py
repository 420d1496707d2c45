"""MED — the BLIP-1 multimodal encoder-decoder BERT (flax.linen).

Re-implementation of ``3DLLM_BLIP2-base/lavis/models/med.py`` (the vendored
BLIP/ALBEF ``BertModel``/``BertLMHeadModel`` pair): a post-LN BERT whose
layers optionally cross-attend into a vision-encoder width, switched at
call time by ``mode``:

- ``mode="text"``: self-attention only (med.py:397-399 skips the
  cross-attention branch) — the text encoder of BLIP-1 ITC.
- ``mode="multimodal"``: cross-attention into ``encoder_hidden_states``
  in every layer that has one (med.py:398-422) — the ITM / captioning
  fusion pass.

``is_decoder=True`` adds the causal self-attention mask
(med.py:714-743 get_extended_attention_mask) for ``MedBertLMHeadModel``,
whose LM loss shifts by one and label-smooths 0.1 (med.py:1106-1116).

TPU notes: no KV cache — BLIP-1 decoding lengths are tiny, so generation
re-runs the masked full pass (same choice as the stage-1 Q-Former LM path,
``blip2_qformer.py``); everything is fixed-shape under ``jit``.
Checkpoint import from HF/BLIP torch state dicts lives in
``ckpt_compat.convert_med``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class MedConfig:
    """BertConfig subset used by med.py (configs/med_config.json in BLIP:
    bert-base + cross-attention into the ViT width)."""
    vocab_size: int = 30524            # bert-base + [DEC]/[ENC] tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    add_type_embeddings: bool = True   # med.py:64-65
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    encoder_width: int = 768           # vision width for cross-attention
    add_cross_attention: bool = True
    is_decoder: bool = False           # causal self-attention + LM head use


class MedAttention(nn.Module):
    """Self- or cross-attention + output dense + residual LayerNorm
    (med.py BertSelfAttention/BertSelfOutput; post-LN BERT)."""
    cfg: MedConfig
    is_cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv=None, kv_mask=None, causal=False):
        cfg = self.cfg
        B, L, _ = hidden.shape
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        kv_src = hidden if kv is None else kv

        def proj(x, name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x) \
                .reshape(B, -1, h, d).transpose(0, 2, 1, 3)

        q = proj(hidden, "query")
        k = proj(kv_src, "key")
        v = proj(kv_src, "value")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d, q.dtype))
        if kv_mask is not None:
            scores = jnp.where(kv_mask[:, None, None, :].astype(bool),
                               scores, NEG_INF)
        if causal:
            K = scores.shape[-1]
            cm = jnp.tril(jnp.ones((L, K), bool))
            scores = jnp.where(cm[None, None], scores, NEG_INF)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_dense")(out)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="out_norm")(hidden + out)


class MedLayer(nn.Module):
    """BertLayer (med.py:343-440): self-attn -> [cross-attn] -> FFN, each
    with residual + post-LN."""
    cfg: MedConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_mask, enc_states, enc_mask,
                 mode: str, causal: bool):
        cfg = self.cfg
        hidden = MedAttention(cfg, dtype=self.dtype, name="attention")(
            hidden, kv_mask=attn_mask, causal=causal)
        if mode in ("multimodal", "fusion") and cfg.add_cross_attention:
            hidden = MedAttention(cfg, is_cross=True, dtype=self.dtype,
                                  name="crossattention")(
                hidden, kv=enc_states, kv_mask=enc_mask)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(hidden + out)


class MedBertModel(nn.Module):
    """BertModel (med.py:649-900): embeddings -> layers -> (pooler).

    ``__call__(input_ids, attention_mask, ...)`` returns
    ``(sequence_output, pooled_output)``; ``pooled_output`` is the tanh
    pooler over the CLS state (med.py:564-576), or None when
    ``add_pooling_layer=False``.
    """
    cfg: MedConfig
    add_pooling_layer: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 mode: str = "multimodal", inputs_embeds=None):
        cfg = self.cfg
        if inputs_embeds is None:
            emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                           embedding_init=nn.initializers.normal(0.02),
                           dtype=self.dtype, name="word_embeddings")
            inputs_embeds = emb(input_ids)
        B, L = inputs_embeds.shape[:2]
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = inputs_embeds + pos[None, :L].astype(self.dtype)
        if cfg.add_type_embeddings and token_type_ids is not None:
            tt = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                          embedding_init=nn.initializers.normal(0.02),
                          dtype=self.dtype, name="token_type_embeddings")
            x = x + tt(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_norm")(x)
        for i in range(cfg.num_layers):
            x = MedLayer(cfg, dtype=self.dtype, name=f"layer{i}")(
                x, attention_mask, encoder_hidden_states,
                encoder_attention_mask, mode, cfg.is_decoder)
        pooled = None
        if self.add_pooling_layer:
            pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                      name="pooler")(x[:, 0]))
        return x, pooled


class MedLMHead(nn.Module):
    """BertOnlyMLMHead (med.py:579-623): transform (dense+gelu+LN) then the
    untied vocab decoder (BLIP checkpoints carry separate decoder weights)."""
    cfg: MedConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="transform_norm")(x)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(x)


class MedBertLMHeadModel(nn.Module):
    """BertLMHeadModel (med.py:1016-1169): causal MED decoder + LM head.

    ``__call__`` returns logits [B, L, vocab]; :meth:`lm_loss` applies the
    reference's shifted, 0.1-label-smoothed mean CE (med.py:1106-1116,
    ``labels == -100`` ignored).
    """
    cfg: MedConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bert = MedBertModel(
            dataclasses.replace(self.cfg, is_decoder=True),
            add_pooling_layer=False, dtype=self.dtype)
        self.cls = MedLMHead(self.cfg, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 mode: str = "multimodal"):
        seq, _ = self.bert(input_ids, attention_mask,
                           token_type_ids=token_type_ids,
                           encoder_hidden_states=encoder_hidden_states,
                           encoder_attention_mask=encoder_attention_mask,
                           mode=mode)
        return self.cls(seq)

    @staticmethod
    def lm_loss(logits, labels, smoothing: float = 0.1):
        """Shift-by-one label-smoothed CE over ``labels != -100``."""
        lp = nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = labels[:, 1:]
        valid = tgt != -100
        tgt_safe = jnp.where(valid, tgt, 0)
        V = logits.shape[-1]
        nll = -jnp.take_along_axis(lp, tgt_safe[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(lp, axis=-1)
        loss = (1.0 - smoothing) * nll + smoothing * smooth
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(jnp.where(valid, loss, 0.0)) / n
